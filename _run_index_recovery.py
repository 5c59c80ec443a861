"""Index-recovery run (VERDICT round-5 #7): 7 bands, 5 comps, nside 1024.

Prints injected vs recovered index summary at the end."""
import sys
import time

import numpy as np

from commander_tpu.io.chain import ChainFile
from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import run

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
lmax = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
niter = int(sys.argv[3]) if len(sys.argv) > 3 else 30
outdir = sys.argv[4] if len(sys.argv) > 4 else "chains_index_recovery"

cfg = lower_params(Params.load("param_index_recovery.txt"))
t0 = time.time()
state, cp = run(cfg, nside=nside, lmax=lmax, synthetic=True, niter=niter,
                outdir=outdir, verbose=True, dtype="float32")
print(f"TOTAL {time.time()-t0:.0f}s chain={cp}", flush=True)

TRUTH = {"synch": [-3.1], "dust": [1.6, 19.6], "ff": [7000.0],
         "ame": [21e9]}
with ChainFile(cp, "r") as ch:
    last = ch.last_sample()
    burn = max(2, last // 3)
    samples = {}
    for it in range(burn, last + 1):
        try:
            s = ch.read_sample(it)
        except KeyError:
            continue
        for name, ent in s["comps"].items():
            si = np.atleast_1d(np.asarray(ent.get("specind", [])))
            if si.size:
                samples.setdefault(name, []).append(si)
    print("component  param  injected     recovered (mean +- MC err)")
    for name, truth in TRUTH.items():
        if name not in samples:
            continue
        arr = np.asarray(samples[name])     # (niter_kept, npar)
        for j, tv in enumerate(truth):
            m = arr[:, j].mean()
            # batch-means MC error for the autocorrelated stream
            nb = max(2, len(arr) // 5)
            bm = arr[: (len(arr) // nb) * nb, j].reshape(nb, -1).mean(1)
            err = bm.std() / np.sqrt(nb)
            z = (m - tv) / max(err, 1e-12)
            print(f"{name:9s}  th{j}   {tv:12.4g} {m:12.4g} +- "
                  f"{err:.3g}  (z={z:+.1f})")
