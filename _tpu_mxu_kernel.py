"""Round-5 MXU OTF kernel: compiled-TPU accuracy + throughput probe.

Compares synth/adjoint of the MXU kernels against the shipping VPU
Pallas kernels at a mid scale, then times the nside-1024 / lmax-2048
batch-8 roundtrip for both (the BENCH secondary point)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from commander_tpu.sphere import sht_otf, pallas_sht

SIZES = sys.argv[1] if len(sys.argv) > 1 else "both"


def readback(x):
    # axon: complex device->host unsupported; float32 works
    return np.asarray(x[0]), np.asarray(x[1])


def check(nside, lmax, block_h=512, block_l=256):
    otf = sht_otf.legendre_otf(nside, lmax, 0, dtype="float32")
    nl = nm = lmax + 1
    nh = 2 * nside
    rng = np.random.default_rng(0)
    tri = np.tril(np.ones((nl, nm), np.float32))
    a_re = jnp.asarray((rng.standard_normal((8, nl, nm)) * tri
                        ).astype(np.float32))
    a_im = jnp.asarray((rng.standard_normal((8, nl, nm)) * tri
                        ).astype(np.float32))
    # complex host->device transfer is UNIMPLEMENTED on axon: combine in-jit
    alm_j = (a_re, a_im)

    @jax.jit
    def old(a):
        Fn, Fs = pallas_sht.synth_legendre_pallas(otf, a, nh)
        ad = pallas_sht.adjoint_legendre_pallas(otf, Fn, Fs)
        return (Fn.real, Fn.imag), (Fs.real, Fs.imag), (ad.real, ad.imag)

    @jax.jit
    def new(a):
        Fn, Fs = pallas_sht.synth_legendre_pallas_mxu(
            otf, a, nh, block_h=block_h, block_l=block_l)
        ad = pallas_sht.adjoint_legendre_pallas_mxu(
            otf, Fn, Fs, block_h=block_h, block_l=block_l)
        return (Fn.real, Fn.imag), (Fs.real, Fs.imag), (ad.real, ad.imag)

    @jax.jit
    def errs(ari):
        a = ari[0] + 1j * ari[1]
        ro = old(a)
        rn = new(a)
        out = []
        for o, n in zip(ro, rn):
            sc = jnp.maximum(jnp.abs(o[0]).max(), jnp.abs(o[1]).max())
            e = jnp.maximum(jnp.abs(n[0] - o[0]).max(),
                            jnp.abs(n[1] - o[1]).max())
            out.append((e / sc).astype(jnp.float32))
        return tuple(out)

    t0 = time.time()
    e_fn, e_fs, e_adj = errs(alm_j)
    jax.block_until_ready(e_adj)
    t1 = time.time()
    print(f"nside {nside}: compile+run {t1-t0:.1f}s", flush=True)
    for name, e in (("Fn", e_fn), ("Fs", e_fs), ("adj", e_adj)):
        print(f"  {name}: rel err {float(np.asarray(e)):.2e}", flush=True)

    # throughput: chained roundtrips, scalar readback sync
    def time_fn(fn, label, iters=4):
        @jax.jit
        def loop(ari):
            def body(i, a):
                (fn_, fs_, ad) = fn(a)
                return (ad[0] + 1j * ad[1]).astype(jnp.complex64)
            out = jax.lax.fori_loop(0, iters, body, ari[0] + 1j * ari[1])
            return jnp.sum(jnp.abs(out))

        s = loop(alm_j)
        jax.block_until_ready(s)
        t0 = time.time()
        s = loop(alm_j)
        jax.block_until_ready(s)
        dt = time.time() - t0
        n_tr = iters * 8  # batch 8 roundtrips
        print(f"  {label}: {dt:.3f}s for {n_tr} roundtrips -> "
              f"{n_tr/dt:.2f} SHT/s  (sum {float(np.asarray(s)):.3e})",
              flush=True)

    def old_steps(a):
        Fn, Fs = pallas_sht.synth_legendre_pallas(otf, a, nh)
        ad = pallas_sht.adjoint_legendre_pallas(otf, Fn, Fs)
        return (Fn.real, Fn.imag), (Fs.real, Fs.imag), (ad.real, ad.imag)

    def new_steps(a):
        Fn, Fs = pallas_sht.synth_legendre_pallas_mxu(
            otf, a, nh, block_h=block_h, block_l=block_l)
        ad = pallas_sht.adjoint_legendre_pallas_mxu(
            otf, Fn, Fs, block_h=block_h, block_l=block_l)
        return (Fn.real, Fn.imag), (Fs.real, Fs.imag), (ad.real, ad.imag)

    time_fn(old_steps, "old (VPU kernels)")
    time_fn(new_steps, "NEW (MXU kernels)")


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    if SIZES in ("small", "both"):
        check(256, 511, block_h=512, block_l=256)
    if SIZES in ("big", "both"):
        check(1024, 2048, block_h=512, block_l=256)


def sweep(nside, lmax):
    """Block-size / precision sweep of the MXU kernels at one size."""
    from commander_tpu.sphere import pallas_sht as ps
    otf = sht_otf.legendre_otf(nside, lmax, 0, dtype="float32")
    nl = nm = lmax + 1
    nh = 2 * nside
    rng = np.random.default_rng(0)
    tri = np.tril(np.ones((nl, nm), np.float32))
    a_re = jnp.asarray((rng.standard_normal((8, nl, nm)) * tri
                        ).astype(np.float32))
    a_im = jnp.asarray((rng.standard_normal((8, nl, nm)) * tri
                        ).astype(np.float32))
    for prec, store in (("bf16x3", "pre"),):
        ps._MXU_PRECISION = prec
        ps._MXU_STORE = store
        for bh, lc in ((2048, 128), (2048, 256)):
            @jax.jit
            def loop(re, im):
                def body(i, a):
                    Fn, Fs = ps.synth_legendre_pallas_mxu(
                        otf, a, nh, block_h=bh, block_l=lc)
                    ad = ps.adjoint_legendre_pallas_mxu(
                        otf, Fn, Fs, block_h=bh, block_l=lc)
                    return ad.astype(jnp.complex64)
                out = jax.lax.fori_loop(0, 4, body, re + 1j * im)
                return jnp.sum(jnp.abs(out))
            try:
                t0 = time.time()
                sv = float(np.asarray(loop(a_re, a_im)))
                tc = time.time() - t0
                t0 = time.time()
                sv = float(np.asarray(loop(a_re, a_im)))
                dt = time.time() - t0
                print(f"  prec={prec} bh={bh} lc={lc}: {32/dt:.2f} SHT/s"
                      f" (compile {tc:.0f}s, sum {sv:.4e})",
                      flush=True)
            except Exception as e:
                print(f"  prec={prec} bh={bh} lc={lc}: FAIL "
                      f"{str(e)[:200]}", flush=True)


if SIZES == "sweep":
    sweep(1024, 2048)
