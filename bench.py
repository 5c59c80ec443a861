"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: batched spin-0 SHT roundtrip throughput (alm2map + map2alm,
SHTs/sec/chip) at nside 256 / lmax 512 — the reference's #1 hot kernel
(libsharp inside cr_matmulA; SURVEY.md §6 'SHTs/sec/chip').

Infrastructure notes (this container's axon TPU runtime):
  * block_until_ready can be a no-op -> timing uses CHAINED iterations
    (lax.fori_loop feeding each roundtrip into the next) ended by a scalar
    device->host readback, and reports the n-scaling difference so constant
    overheads cancel.
  * transfers are flaky per-session -> the outer driver retries the inner
    bench in fresh subprocesses until one returns valid JSON.

vs_baseline anchors to 10 SHT/s — libsharp-class full-node CPU throughput
for this transform size (BASELINE.md: the reference publishes no numbers,
so the anchor is the measured-order of its SHT backend; revisit when the
reference is timed on this host).
"""
import json
import os
import subprocess
import sys
import time

BASELINE_SHT_PER_S = 10.0


def _measure(jax, device, dtype, nside, lmax, batch):
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

    with jax.default_device(jax.devices("cpu")[0]):
        plan = sht.get_plan(nside, lmax, dtype=dtype)
        nl = lmax + 1
        rng = np.random.default_rng(0)
        a0 = rng.standard_normal((batch, nl, nl)) \
            + 1j * rng.standard_normal((batch, nl, nl))
        a = jnp.asarray(a0.astype(np.complex64 if dtype == "float32"
                                  else np.complex128))
    spec_p, enc_p = transfer.encode(plan)
    spec_a, enc_a = transfer.encode(a)
    enc_p, enc_a = jax.device_put((enc_p, enc_a), device)

    @partial(jax.jit, static_argnums=2)
    def chain(ep, ea, n):
        p = transfer.decode(spec_p, ep)
        a = transfer.decode(spec_a, ea)

        def body(i, a):
            return sht.map2alm(p, sht.alm2map(p, a)).astype(a.dtype)
        out = jax.lax.fori_loop(0, n, body, a)
        return jnp.sum(jnp.abs(out.real)).astype(jnp.float32)

    def timed_block(n):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(enc_p, enc_a, n))
        return time.perf_counter() - t0

    def timed_readback(n):
        t0 = time.perf_counter()
        val = float(np.asarray(chain(enc_p, enc_a, n)))
        assert val > 0
        return time.perf_counter() - t0

    n_lo, n_hi = 2, (20 if nside >= 256 else 100)
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
    return 2.0 * batch / per_round, sync   # roundtrip = 2 transforms x batch


def inner():
    import jax
    # persistent compile cache: once ANY session compiles the bench graph,
    # later sessions (incl. slow-compiler ones) load it from disk.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    nside = int(os.environ.get("COMMANDER_TPU_BENCH_NSIDE",
                               "256" if on_tpu else "64"))
    lmax, batch = 2 * nside, 8 if on_tpu else 4
    dtype = "float32" if on_tpu else "float64"
    where = dev.platform
    if os.environ.get("COMMANDER_TPU_BENCH_CPU"):
        # final fallback pass (see main): this axon session cannot
        # transfer/sync; measure the host CPU backend, labeled honestly.
        dev, where, dtype, batch = jax.devices("cpu")[0], "cpu-fallback", \
            "float64", 4
        nside, lmax = 64, 128
    shts, sync = _measure(jax, dev, dtype, nside, lmax, batch)
    print(json.dumps({
        "metric": f"SHT transforms/sec/chip (alm2map+map2alm roundtrip, "
                  f"nside={nside}, lmax={lmax}, batch={batch}, {dtype}, "
                  f"sync={sync}, device={where})",
        "value": round(shts, 2),
        "unit": "transforms/s",
        "vs_baseline": round(shts / BASELINE_SHT_PER_S, 2),
    }))


def main():
    if os.environ.get("COMMANDER_TPU_BENCH_INNER"):
        inner()
        return
    env = dict(os.environ, COMMANDER_TPU_BENCH_INNER="1")
    last_err = ""
    # attempt 0: device @ headline size (nside 256); 1: device @ nside 64
    # (fast compile); 2: CPU-backend fallback so an unmeasurable axon
    # session still yields an honest labeled number.
    plans = [({}, 560), ({"COMMANDER_TPU_BENCH_NSIDE": "64"}, 240),
             ({"COMMANDER_TPU_BENCH_CPU": "1"}, 180)]
    for extra, tmo in plans:
        e = dict(env, **extra)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=e,
                capture_output=True, text=True, timeout=tmo,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in out.stdout.splitlines():
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    print(line)
                    return
            last_err = (out.stderr or "")[-400:]
        except subprocess.TimeoutExpired:
            last_err = "timeout"
    print(json.dumps({"metric": "SHT transforms/sec/chip",
                      "value": 0.0, "unit": "transforms/s",
                      "vs_baseline": 0.0,
                      "error": f"bench failed after retries: {last_err[-200:]}"}))


if __name__ == "__main__":
    main()
