"""Driver launcher for the full-tutorial e2e (pol TOD bands + 8 comps).

Usage: python _run_tutorial_full.py <nside> <lmax> <niter> [outdir]
Phase timings print at the end (BASELINE protocol)."""
import sys
import time

import dataclasses

from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import run

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 256
lmax = int(sys.argv[2]) if len(sys.argv) > 2 else 2 * nside
niter = int(sys.argv[3]) if len(sys.argv) > 3 else 12
outdir = sys.argv[4] if len(sys.argv) > 4 else f"chains_tutorial_full_{nside}"

cfg = lower_params(Params.load("param_tutorial_full.txt"))
if nside == 512:
    # shakeout scale: keep TOD coverage dense enough for pol binning
    # (>= ~4 hits per (pixel, Stokes) at nside 512)
    cfg = dataclasses.replace(cfg, synth_tod_nscan=48, synth_tod_ndet=4,
                              synth_tod_ntod=65536)
elif nside < 512:
    cfg = dataclasses.replace(cfg, synth_tod_nscan=48, synth_tod_ndet=4,
                              synth_tod_ntod=16384)
t0 = time.time()
state, cp = run(cfg, nside=nside, lmax=lmax, synthetic=True, niter=niter,
                outdir=outdir, verbose=True, dtype="float32", pol=True,
                tod=True)
print(f"TOTAL {time.time()-t0:.0f}s chain={cp}", flush=True)
