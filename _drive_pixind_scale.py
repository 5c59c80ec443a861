"""Driver run: per-pixel multi-parameter (MBB beta+T) indices at nside 64.

Closes the 'per-pixel theta with jointly-sampled multi-parameter
components at scale' roadmap item: tutorial config, dust beta AND T
sampled per-pixel (COMP_LMAX_IND < 0, --pixind), pixel-mixing CG.
"""
import time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import run

cfg = lower_params(Params.load("/root/reference/tutorial/param_tutorial.txt"))
cfg.sample_specind = True
for c in cfg.comps:
    if c.cclass == "diffuse":
        c.lmax_ind = -1          # per-pixel local sampler for every index
t0 = time.perf_counter()
state, chain = run(cfg, nside=64, lmax=128, synthetic=True, niter=3,
                   outdir="/tmp/chains_pixind_scale", verbose=False,
                   pixind=True, dtype="float32")
dt = (time.perf_counter() - t0) / 3
print(f"nside 64 per-pixel multi-param Gibbs: {dt:.1f} s/iter (CPU f32)")
