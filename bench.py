"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: batched spin-0 SHT roundtrip throughput (alm2map + map2alm,
SHTs/sec/chip) at nside 256 / lmax 512 — the reference's #1 hot kernel
(libsharp inside cr_matmulA; SURVEY.md §6 'SHTs/sec/chip').

vs_baseline is MEASURED, not assumed: the same transform is timed on this
host's CPU backend (float64, the reference's precision) and the ratio
device/CPU is reported. The reference itself cannot run here (Fortran+MPI
superbuild needing network fetches; BASELINE.md), and healpy/libsharp are
not installed, so the host-CPU run of this framework's own SHT — which
matches libsharp-class throughput order at small nside (BASELINE.md
round-1 table) — is the honest measurable denominator. If the CPU
measurement fails, the last cached value (or the historical 10 SHT/s
libsharp-class anchor) is used and labeled.

Secondary metrics ride in the same JSON line under "secondary":
  * spin-2 (E,B <-> Q,U) roundtrip SHT/s — regression guard for the
    polarization path (VERDICT round-1 weak #8).

Infrastructure notes (this container's axon TPU runtime):
  * block_until_ready can be a no-op -> timing uses CHAINED iterations
    (lax.fori_loop feeding each roundtrip into the next) ended by a scalar
    device->host readback, and reports the n-scaling difference so constant
    overheads cancel.
  * transfers are flaky per-session -> the outer driver retries the inner
    bench in fresh subprocesses until one returns valid JSON.
"""
import json
import os
import subprocess
import sys
import time

FALLBACK_CPU_SHT_PER_S = 10.0          # libsharp-class order; used only if
ANCHOR_CACHE = ".bench_cpu_anchor.json"  # the CPU measurement fails


def _measure(jax, device, dtype, nside, lmax, batch, spin2=False,
             n_hi=None, plan_kwargs=None):
    """One SHT-roundtrip measurement on `device`. Returns
    (shts_per_sec, sync_mode) or raises on an unusable session.

    All host->device traffic goes through utils/transfer.py's float-only
    encoding (complex plan tables -> re/im pairs, int index arrays ->
    float64) because this container's axon runtime only implements
    f32/f64 transfers; dtypes are reconstructed inside jit. The chain
    returns a float32 scalar so the sync readback is also f32."""
    import numpy as np
    import jax.numpy as jnp
    from functools import partial
    from commander_tpu.sphere import sht
    from commander_tpu.utils import transfer

    cplx = np.complex64 if dtype == "float32" else np.complex128
    with jax.default_device(jax.devices("cpu")[0]):
        plan = sht.get_plan(nside, lmax, dtype=dtype, spin2=spin2,
                            **(plan_kwargs or {}))
        nl = lmax + 1
        rng = np.random.default_rng(0)
        def ralm():
            return jnp.asarray((rng.standard_normal((batch, nl, nl))
                                + 1j * rng.standard_normal((batch, nl, nl))
                                ).astype(cplx))
        payload = (plan, ralm(), ralm()) if spin2 else (plan, ralm())
    spec, enc = transfer.encode(payload)
    enc = jax.device_put(enc, device)

    @partial(jax.jit, static_argnums=1)
    def chain(e, n):
        if spin2:
            p, aE, aB = transfer.decode(spec, e)

            def body(i, ab):
                aE, aB = ab
                Q, U = sht.alm2map_spin2(p, aE, aB)
                oE, oB = sht.map2alm_spin2(p, Q, U)
                return oE.astype(aE.dtype), oB.astype(aB.dtype)
            oE, oB = jax.lax.fori_loop(0, n, body, (aE, aB))
            return jnp.sum(jnp.abs(oE.real)).astype(jnp.float32)
        p, a = transfer.decode(spec, e)

        def body(i, a):
            return sht.map2alm(p, sht.alm2map(p, a)).astype(a.dtype)
        out = jax.lax.fori_loop(0, n, body, a)
        return jnp.sum(jnp.abs(out.real)).astype(jnp.float32)

    def timed_block(n):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(enc, n))
        return time.perf_counter() - t0

    def timed_readback(n):
        t0 = time.perf_counter()
        val = float(np.asarray(chain(enc, n)))
        assert val > 0
        return time.perf_counter() - t0

    if n_hi is None:
        n_hi = 20 if nside >= 256 else 100
    n_lo = max(1, n_hi // 10)
    timed_readback(n_lo)      # compile both graph sizes
    timed_readback(n_hi)
    # Scalar-readback timing (forces completion even where
    # block_until_ready is a no-op, as on this axon tunnel); min-of-3
    # n-scaling difference cancels the RPC/dispatch latency constant.
    t_lo = min(timed_readback(n_lo) for _ in range(3))
    t_hi = min(timed_readback(n_hi) for _ in range(3))
    sync = "readback"
    if not (t_hi > t_lo > 1e-5):
        # fall back to block-based timing validated by n-scaling
        t_lo = min(timed_block(n_lo) for _ in range(3))
        t_hi = min(timed_block(n_hi) for _ in range(3))
        if not (t_lo > 1e-5 and 2.0 < (t_hi / t_lo)):
            raise RuntimeError(f"no usable sync: {t_lo} {t_hi}")
        sync = "block"
    per_round = max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)
    if per_round < 1e-7:
        raise RuntimeError(f"implausible timing: {per_round}")
    # one roundtrip = 2 transforms per batch element (spin-2 counts the
    # (Q,U) pair as one polarized transform, matching round-1 reporting)
    return 2.0 * batch / per_round, sync


def _measure_fullgibbs(jax, dev, nside=256, nband=6, n_hi=8):
    """Seconds per full jitted Gibbs iteration at nside 256 (n-scaling).

    Production-conditioned system (round-4 VERDICT weak #1: the old
    3-band uniform-noise beam-free system let CG converge in 4
    iterations, ~10-30x easier than production): 6 bands with a
    0.1-0.5 degree Gaussian beam hierarchy, inhomogeneous noise
    (rms 0.5-3.0), 5 components — the BASELINE config-3 shape at
    nside 256 (_exp_prec1024.py). Returns (sec/iter, mean CG iters)."""
    import numpy as np
    import jax.numpy as jnp
    from functools import partial
    from commander_tpu.instrument.bandpass import delta_bandpass
    from commander_tpu.instrument.beam import gaussian_bl
    from commander_tpu.model.cl import ClModelConfig
    from commander_tpu.model.mixing import DiffuseComponent, mixing_matrix
    from commander_tpu.sampling import amplitude as amp
    from commander_tpu.sampling import gibbs as gibbs_mod
    from commander_tpu.sampling import tpu_gibbs
    from commander_tpu.sphere import sht
    from commander_tpu.sphere.alm import random_alm_white, triangle_mask
    from commander_tpu.utils import transfer

    lmax = 2 * nside
    with jax.default_device(jax.devices("cpu")[0]):
        nl = lmax + 1
        npix = 12 * nside * nside
        comps = (
            DiffuseComponent(name="cmb", sed="cmb", nu_ref=100e9,
                             unit="uK_cmb"),
            DiffuseComponent(name="synch", sed="power_law", nu_ref=30e9,
                             theta0=(-3.1,)),
            DiffuseComponent(name="dust", sed="MBB", nu_ref=353e9,
                             theta0=(1.6, 19.6)),
            DiffuseComponent(name="ff", sed="freefree", nu_ref=40e9,
                             theta0=(7000.0,)),
            DiffuseComponent(name="ame", sed="spindust", nu_ref=22e9,
                             theta0=(21e9,)),
        )
        ncomp = len(comps)
        bps = tuple(delta_bandpass(f * 1e9)
                    for f in (30.0, 44.0, 70.0, 100.0, 217.0, 353.0))
        # beam hierarchy 0.1-0.5 deg + inhomogeneous noise 0.5-3.0
        fwhms = np.linspace(30.0, 6.0, nband)            # arcmin
        bl = np.stack([gaussian_bl(f, lmax)[None, :].astype(np.float32)
                       for f in fwhms])                  # (B, 1, nl)
        F = np.asarray(mixing_matrix(comps, bps), np.float32)
        rng = np.random.default_rng(0)
        ell = np.arange(nl)
        cl = np.zeros((ncomp, 1, nl), np.float32)
        cl[:, :, 2:] = 300.0 / (ell[2:] * (ell[2:] + 1.0))
        a_true = np.asarray(
            random_alm_white(jax.random.PRNGKey(5), (ncomp, 1, nl, nl))
            * jnp.asarray(triangle_mask(nl, nl))) * np.sqrt(cl)[..., None]
        plan = sht.get_plan(nside, lmax, dtype="float32")
        sky = np.asarray(sht.alm2map(plan, jnp.einsum(
            "bc,cslm->bslm", jnp.asarray(F),
            jnp.asarray(a_true)) * jnp.asarray(bl)[..., None]))
        rms = (0.5 + 2.5 * rng.random((nband, 1, npix))).astype(np.float32)
        data = (sky + rms * rng.standard_normal(sky.shape)
                ).astype(np.float32)
        sysm = amp.build_system(
            jnp.asarray(F), jnp.asarray(bl),
            jnp.asarray(rms),
            jnp.asarray(cl), jnp.asarray(data))
        slots = tpu_gibbs.make_index_slots(comps)
        bins = tuple(int(x) for x in np.unique(np.concatenate(
            [[0, 2], np.geomspace(4, lmax, 12).astype(int)])))
        gcfg = gibbs_mod.GibbsConfig(
            cl_cfg=ClModelConfig(kind="binned", lmax=lmax, nmaps=1,
                                 bin_starts=bins),
            cg_tol=1e-7, cg_maxiter=60)
        state0 = gibbs_mod.init_state(jax.random.PRNGKey(0), ncomp, 1,
                                      lmax,
                                      len(bins))
        spec, enc = transfer.encode((plan, sysm))
        spec_st, enc_st = transfer.encode((state0,))
    enc_d = jax.device_put(enc, dev)
    enc_st_d = jax.device_put(enc_st, dev)

    # ONE jitted Gibbs iteration per call with the state carried between
    # calls as float-encoded device arrays (transfer.encode_like). A
    # single lax.fori_loop over iterations miscompiles on this TPU
    # runtime (round-3 root cause: long fori_loop x multi-GiB operand —
    # the monolithic version of this bench returned NaNs in BENCH_r03);
    # chunk-per-jit carry is the production pattern
    # (amplitude.sample_amplitudes_chunked).
    @jax.jit
    def step(e, est, th, key):
        plan, sysm = transfer.decode(spec, e)
        (state,) = transfer.decode(spec_st, est)
        key, k = jax.random.split(key)
        state, th, _s = tpu_gibbs.full_gibbs_step(
            gcfg, comps, bps, slots, sysm, plan, state, th, k,
            beam_consistent=True)
        return (transfer.encode_like(spec_st, (state,)),
                th.astype(jnp.float32), key,
                state.cg_iters.astype(jnp.float32))

    th0 = jnp.asarray([-3.1, 1.6, 19.6, 7000.0, 21e9], jnp.float32)

    cg_seen = []

    def run_n(n):
        est, th, key = enc_st_d, th0, jax.random.PRNGKey(11)
        cg = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            est, th, key, cg = step(enc_d, est, th, key)
        v = np.asarray(th)      # readback forces completion of the chain
        assert np.isfinite(v).all()
        dt = time.perf_counter() - t0
        cg_seen.append(float(np.asarray(cg)))
        return dt

    run_n(1)                    # compile
    t_lo = min(run_n(1) for _ in range(2))
    t_hi = min(run_n(1 + n_hi) for _ in range(2))
    per = max(t_hi - t_lo, 1e-9) / n_hi
    if per < 1e-4:
        raise RuntimeError(f"implausible gibbs timing {per}")
    cg_iters = cg_seen[-1]
    if not (cg_iters >= 5):
        # a representative system must actually work the CG; a
        # too-easy system (the round-4 flaw) fails the bench loudly
        raise RuntimeError(
            f"fullgibbs bench system unrepresentative: CG converged in "
            f"{cg_iters} iterations (expected production-like >= 5)")
    return per, cg_iters


def inner():
    import jax
    # persistent compile cache: once ANY session compiles the bench graph,
    # later sessions (incl. slow-compiler ones) load it from disk.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    mode = os.environ.get("COMMANDER_TPU_BENCH_MODE", "spin0")
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    nside = int(os.environ.get("COMMANDER_TPU_BENCH_NSIDE",
                               "256" if on_tpu else "64"))
    lmax, batch = 2 * nside, 8 if on_tpu else 4
    dtype = "float32" if on_tpu else "float64"
    where = dev.platform
    n_hi = None
    if mode == "cpu0":
        # measured baseline: same transform, host CPU, reference f64
        jax.config.update("jax_enable_x64", True)
        dev, where, dtype, batch = jax.devices("cpu")[0], "cpu", \
            "float64", 8
        n_hi = 3
    elif os.environ.get("COMMANDER_TPU_BENCH_CPU"):
        # final fallback pass (see main): this axon session cannot
        # transfer/sync; measure the host CPU backend, labeled honestly.
        dev, where, dtype, batch = jax.devices("cpu")[0], "cpu-fallback", \
            "float64", 4
        nside, lmax = 64, 128
    spin2 = mode == "spin2"
    plan_kwargs = None
    if mode == "otf1024":
        # tableless large-lmax path: fused Pallas OTF Legendre kernel
        # (the 34 GB nside-1024 table exceeds HBM; VERDICT round-1 next #1)
        nside, lmax, batch, n_hi = 1024, 2048, 8, 3
        plan_kwargs = {"tables": False, "legendre_backend": "pallas"}
        if not on_tpu:
            raise RuntimeError("otf1024 is a TPU-only secondary")
    if mode == "fullgibbs":
        # whole Gibbs iteration (CG amplitudes + binned Cl + spectral
        # indices + in-jit mixing rebuild) as ONE jit — the
        # tutorial-shaped 3-band model at nside 256 (VERDICT round-2
        # missing #5)
        if not on_tpu:
            raise RuntimeError("fullgibbs is a TPU-only secondary")
        per_iter, cg_iters = _measure_fullgibbs(jax, dev)
        print(json.dumps({
            "metric": "full Gibbs iteration (CG amplitudes + binned Cl + "
                      "5 spectral-index draws + mixing rebuild), "
                      "nside=256, lmax=512, 6 bands with 0.1-0.5 deg "
                      "beam hierarchy, inhomogeneous noise rms 0.5-3.0, "
                      f"5 comps, CG {cg_iters:.0f} iters/draw to 1e-7, "
                      "float32, device=tpu",
            "value": round(3600.0 / per_iter, 1),
            "unit": "iterations/hour/chip",
        }))
        return
    shts, sync = _measure(jax, dev, dtype, nside, lmax, batch,
                          spin2=spin2, n_hi=n_hi, plan_kwargs=plan_kwargs)
    kind = "pol-SHT (E,B<->Q,U)" if spin2 else \
        ("OTF-Pallas SHT" if mode == "otf1024" else "SHT")
    # opcnt-style accounting (libsharp reports time+opcnt per execute,
    # sharp.f90:91-92; SURVEY §5.1 asks to keep this as a design
    # feature). Model FLOP counts per SINGLE transform:
    #   table path: dense Legendre contraction, complex alm x real
    #     Lambda over (nh rings, nl, nm) = 8*nh*nl*nm real FLOP;
    #   OTF Pallas: VPU recurrence ~6 FLOP per (ring, l>=m, m) triple +
    #     parity-split accumulation 4*batch FLOP per triple, amortized
    #     over the batch (ROADMAP roofline analysis).
    nh = 2 * nside
    nl = lmax + 1
    tri = nl * (nl + 2) // 2
    extra_opcnt = {}
    if mode == "otf1024":
        # round-5 MXU kernel: recurrence stays on the VPU (~6 FLOP per
        # l>=m triple, amortized over the batch); the accumulation is a
        # batched MXU contraction (4*batch FLOP per triple, bf16x3 = 3
        # hardware passes)
        flop_per_t = nh * tri * (6.0 / batch + 4.0)
        roof = ("MXU-accumulation kernel (h-on-lanes batched dots, "
                "bf16x3); recurrence VPU-bound remainder")
    else:
        flop_per_t = 8.0 * nh * nl * nl
        # MEASURED table-bandwidth roofline (round-4 VERDICT next #8):
        # the f32 Legendre table is streamed once per Legendre stage
        # (synthesis + adjoint per roundtrip); implied HBM read
        # bandwidth vs the ~819 GB/s v5e peak says whether
        # "table-bandwidth-bound" is real or headroom remains.
        table_bytes = nh * nl * nl * 4.0     # rectangular f32 Lambda
        # one table stream per Legendre stage (synth + adjoint per
        # roundtrip), amortized over the batch
        bw = 2.0 * table_bytes * shts / (2.0 * batch) / 1e9
        headroom = max(0.0, 1.0 - bw / 819.0)
        roof = (f"measured table-stream bandwidth {bw:.0f} GB/s of "
                f"~819 GB/s v5e HBM peak ({100*headroom:.0f}% headroom "
                f"-> Legendre stage is NOT the binding stage at this "
                f"size; the ring/FFT stage is, per _profile_sht.py)")
        extra_opcnt = {"table_stream_gb_per_s": round(bw, 1),
                       "hbm_headroom_frac": round(headroom, 2)}
    print(json.dumps({
        "metric": f"{kind} transforms/sec/chip (roundtrip, "
                  f"nside={nside}, lmax={lmax}, batch={batch}, {dtype}, "
                  f"sync={sync}, device={where})",
        "value": round(shts, 2),
        "unit": "transforms/s",
        "opcnt": {"model_flop_per_transform": flop_per_t,
                  "achieved_flop_per_s": round(shts * flop_per_t, 1),
                  "regime": roof, **extra_opcnt},
    }))


def _run_inner(extra, tmo):
    """Run inner() in a fresh subprocess; return the parsed JSON or None."""
    env = dict(os.environ, COMMANDER_TPU_BENCH_INNER="1", **extra)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=tmo,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                return json.loads(line)
        return {"_err": (out.stderr or "")[-400:]}
    except subprocess.TimeoutExpired:
        return {"_err": "timeout"}


def main():
    if os.environ.get("COMMANDER_TPU_BENCH_INNER"):
        inner()
        return
    here = os.path.dirname(os.path.abspath(__file__))
    cache_path = os.path.join(here, ANCHOR_CACHE)

    # 1. primary: spin-0 on device (retry ladder as in round 1)
    primary, last_err = None, ""
    for extra, tmo in [({}, 560),
                       ({"COMMANDER_TPU_BENCH_NSIDE": "64"}, 240),
                       ({"COMMANDER_TPU_BENCH_CPU": "1"}, 180)]:
        r = _run_inner(extra, tmo)
        if r and "_err" not in r:
            primary = r
            break
        last_err = (r or {}).get("_err", "")
    if primary is None:
        print(json.dumps({"metric": "SHT transforms/sec/chip",
                          "value": 0.0, "unit": "transforms/s",
                          "vs_baseline": 0.0,
                          "error": f"bench failed: {last_err[-200:]}"}))
        return

    secondary = []
    # 2. measured CPU anchor at the same transform size. Measured once on
    # this host (4.61 SHT/s f64, 2026-08-19) and cached in-repo; re-measured
    # only if the cache is missing, to keep driver bench time bounded.
    anchor, anchor_src = None, ""
    if os.path.exists(cache_path):
        try:
            with open(cache_path) as f:
                anchor = float(json.load(f)["cpu_sht_per_s"])
            anchor_src = "measured-host-cpu-f64-cached"
        except (OSError, ValueError, KeyError):
            anchor = None
    if anchor is None and "device=cpu" not in primary["metric"]:
        r = _run_inner({"COMMANDER_TPU_BENCH_MODE": "cpu0",
                        "JAX_PLATFORMS": "cpu"}, 420)
        if r and "_err" not in r:
            anchor, anchor_src = float(r["value"]), "measured-host-cpu-f64"
            try:
                with open(cache_path, "w") as f:
                    json.dump({"cpu_sht_per_s": anchor}, f)
            except OSError:
                pass
            secondary.append(r)
    if anchor is None:
        anchor, anchor_src = FALLBACK_CPU_SHT_PER_S, "assumed-libsharp-class"

    def add_secondary(mode, tmo, extra=None):
        """Run one secondary; record its result OR its error — a failed
        secondary must be distinguishable from a never-run one
        (VERDICT round-3 weak #1: silent drops lost the pol-SHT guard
        and the fullgibbs headline from BENCH_r03)."""
        r = _run_inner({"COMMANDER_TPU_BENCH_MODE": mode, **(extra or {})},
                       tmo)
        if r and "_err" not in r:
            secondary.append(r)
            return r
        secondary.append({"metric": mode,
                          "error": (r or {}).get("_err", "no output")[-400:]})
        return None

    # 3. spin-2 secondary (regression guard for the polarization path)
    add_secondary("spin2", 560)

    if "device=cpu" not in primary["metric"]:
        # 4. large-lmax tableless secondary: nside-1024 / lmax-2048
        # roundtrip on the fused Pallas OTF kernel (regression guard for
        # the BASELINE-config-3 regime where no Legendre table fits in
        # HBM). First-ever run pays ~10 min of axon remote compiles; the
        # persistent jax_compilation_cache makes subsequent runs ~20 s.
        add_secondary("otf1024", 900)

        # 5. full-Gibbs-iteration secondary: the whole sampler step (CG +
        # Cl + spectral indices + mixing rebuild) as one jit at nside 256
        add_secondary("fullgibbs", 1500)

    out = dict(primary)
    out["vs_baseline"] = round(float(primary["value"]) / anchor, 2)
    out["baseline_anchor"] = {"value": round(anchor, 3),
                              "source": anchor_src}
    if secondary:
        out["secondary"] = secondary
    print(json.dumps(out))


if __name__ == "__main__":
    main()
