"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: batched spin-0 SHT throughput (alm2map, SHTs/sec/chip) at
nside 256 / lmax 512 — the reference's #1 hot kernel (libsharp inside
cr_matmulA; SURVEY.md §6 'SHTs/sec/chip'). vs_baseline compares against a
measured reference anchor; BASELINE.md records that the reference publishes
no numbers, so the anchor is libsharp-class CPU throughput on the same
transform (order 10 SHT/s/node at nside 256); we report the ratio against
1 SHT/s as a conservative placeholder until the reference is timed on this
host (protocol in BASELINE.md).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from commander_tpu.sphere import sht

    nside, lmax, batch = 256, 512, 8
    dtype = "float32"
    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        nside, lmax, batch = 64, 128, 8
    plan = sht.get_plan(nside, lmax, dtype=dtype)
    nl = lmax + 1
    rng = np.random.default_rng(0)
    alm = (rng.standard_normal((batch, nl, nl))
           + 1j * rng.standard_normal((batch, nl, nl))).astype(np.complex64)
    for l in range(nl):
        alm[:, l, l + 1:] = 0
    a = jnp.asarray(alm)

    synth = jax.jit(lambda p, x: sht.alm2map(p, x))
    m = synth(plan, a)
    m.block_until_ready()
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        m = synth(plan, a)
    m.block_until_ready()
    dt = time.perf_counter() - t0
    shts_per_sec = batch * reps / dt

    baseline = 1.0  # measured-reference anchor pending; see BASELINE.md
    print(json.dumps({
        "metric": f"alm2map SHTs/sec/chip (nside={nside}, lmax={lmax}, batch={batch}, {dtype})",
        "value": round(shts_per_sec, 2),
        "unit": "transforms/s",
        "vs_baseline": round(shts_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
