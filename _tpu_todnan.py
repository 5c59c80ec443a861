"""Stage-by-stage finiteness probe of the encoded TOD path at nside 128."""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import (build_model, _setup_synthetic_tod, GHZ)
from commander_tpu.sampling import amplitude as amp, gibbs
from commander_tpu.sampling import tpu_gibbs as tg
from commander_tpu.sampling import joint as joint_mod
from commander_tpu.sphere import sht, healpix
from commander_tpu.tod.process import process_tod
from commander_tpu.utils import transfer as tr

jax.config.update("jax_default_device", jax.devices("cpu")[0])

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 128
lmax = 2 * nside
cfg = lower_params(Params.load("param_tutorial_full.txt"))
cfg = dataclasses.replace(cfg, synth_tod_nscan=48, synth_tod_ndet=4,
                          synth_tod_ntod=16384)

(plan, sysm, diffuse, bps, cl_cfg, cl0, meta, truth, pcfgs, ts, ps,
 cl_cfgs) = build_model(cfg, nside=nside, lmax=lmax, synthetic=True,
                        dtype="float32", pol=True)
print("built", flush=True)
gcfg = gibbs.GibbsConfig(cl_cfg=cl_cfg, cg_tol=1e-7, cg_maxiter=60,
                         cl_cfgs=cl_cfgs)
slots = tg.make_index_slots(diffuse, pcfgs)
state = gibbs.init_state(jax.random.PRNGKey(0), len(diffuse), 3, lmax,
                         len(cl_cfg.bin_starts),
                         ntemp=(0 if ts is None else ts.maps.shape[0]),
                         nsrc=(0 if ps is None else ps.stamp.shape[2]))
blocks = _setup_synthetic_tod(cfg, plan, sysm, diffuse, nside,
                              seed=cfg.base_seed)
print("tod sim done:", {b: (blk.tod.shape) for b, (t, blk, st, k, a)
                        in blocks.items()}, flush=True)
pvec = jnp.asarray(healpix.pix2vec_ring(nside))

dev0 = [d for d in jax.devices() if d.platform != "cpu"][0]
spec_sp, enc_sp = tr.encode((sysm, plan, ts, ps))
enc_sp = jax.device_put(enc_sp, dev0)
spec_st, enc_st = tr.encode((state,))
enc_st = jax.device_put(enc_st, dev0)
spec_pv, enc_pv = tr.encode((pvec,))
enc_pv = jax.device_put(enc_pv, dev0)

th0 = jnp.asarray([float(np.mean(diffuse[s.ci].theta0[s.which]))
                   for s in slots], jnp.float32)
_dt, _bt = tuple(diffuse), tuple(bps)


@jax.jit
def fg(e_sp, e_st, th):
    s, p, _ts, _ps = tr.decode(spec_sp, e_sp)
    (st,) = tr.decode(spec_st, e_st)
    st2, th2, s2 = tg.full_gibbs_step(gcfg, _dt, _bt, slots, s, p, st,
                                      th, jax.random.PRNGKey(5),
                                      beam_consistent=True, ts=_ts,
                                      ps=_ps)
    from commander_tpu.sampling.chisq import compute_residual
    r = compute_residual(s2, p, st2.a)
    chi = jnp.sum(jnp.square(r) * s2.inv_rms2)
    return (tr.encode_like(spec_st, (st2,)), th2.astype(jnp.float32),
            chi.astype(jnp.float32), st2.cg_iters.astype(jnp.float32),
            st2.cg_relres.astype(jnp.float32))


tod_enc = {}
for b, (tcfg_b, block_b, tstate_b, kind_b, aux_b) in blocks.items():
    sp_tb, en_tb = tr.encode((block_b, tstate_b))
    tod_enc[b] = [tcfg_b, sp_tb, jax.device_put(en_tb, dev0)]


def make_tod(b):
    tcfg_b, sp_tb, _ = tod_enc[b]
    tcfg_run = dataclasses.replace(tcfg_b, chisq_reject_sigma=1e30)

    @jax.jit
    def f(e_sp, e_tb, e_pv, e_st):
        s, p, _ts, _ps = tr.decode(spec_sp, e_sp)
        (st,) = tr.decode(spec_st, e_st)
        block_b, tstate_b = tr.decode(sp_tb, e_tb)
        (pv,) = tr.decode(spec_pv, e_pv)
        sky = amp._synth(p, amp._project_bands(s, p, st.a))
        if _ts is not None and st.t is not None:
            sky = sky + joint_mod._templates_fwd(_ts, st.t)
        if _ps is not None and st.p is not None:
            sky = sky + joint_mod._ptsrc_fwd(_ps, st.p, sky.shape[-1])
        sky = sky.astype(jnp.float32)
        tstate2, prod = process_tod(tcfg_run, block_b, tstate_b, sky[b],
                                    pv, jax.random.PRNGKey(7 + b), None,
                                    None, None, None)
        pm = prod["map"]
        pr = prod["rms"]
        stats = dict(
            sky_fin=jnp.isfinite(sky).all(),
            map_fin=jnp.isfinite(pm).all(),
            rms_fin=jnp.isfinite(pr).all(),
            gain_fin=jnp.isfinite(tstate2.gain).all(),
            sig_fin=jnp.isfinite(tstate2.sigma0).all(),
            ncorr_fin=jnp.isfinite(tstate2.n_corr).all(),
            fl_fin=jnp.isfinite(prod["fluct"]).all(),
            hit_frac=jnp.mean((pr > 0).astype(jnp.float32)),
            map_max=jnp.max(jnp.abs(jnp.where(pr > 0, pm, 0.0))),
            rms_min=jnp.min(jnp.where(pr > 0, pr, jnp.inf)),
            gain_min=jnp.min(tstate2.gain),
            sigma0_min=jnp.min(tstate2.sigma0),
        )
        hit = (pr > 0) & jnp.isfinite(pm) & jnp.isfinite(pr)
        nd = jnp.where(hit, pm.astype(s.data.dtype), 0.0)
        ir = jnp.where(hit, 1.0 / jnp.maximum(pr, 1e-30),
                       0.0).astype(s.inv_rms.dtype)
        s2 = dataclasses.replace(s, data=s.data.at[b].set(nd),
                                 inv_rms=s.inv_rms.at[b].set(ir),
                                 inv_rms2=s.inv_rms2.at[b].set(ir * ir))
        return (tr.encode_like(spec_sp, (s2, p, _ts, _ps)),
                tr.encode_like(sp_tb, (block_b, tstate2)),
                {k: jnp.asarray(v, jnp.float32) for k, v in stats.items()})
    return f


tod_f = {b: make_tod(b) for b in tod_enc}

# presample
t0 = time.time()
enc_st, th, chi, it, rr = fg(enc_sp, enc_st, th0)
print(f"presample {time.time()-t0:.0f}s chi={float(np.asarray(chi)):.4g} "
      f"cg={float(np.asarray(it))} rr={float(np.asarray(rr)):.2e}",
      flush=True)

for p_i in range(3):
    for b in tod_enc:
        enc_sp, tod_enc[b][2], stats = tod_f[b](enc_sp, tod_enc[b][2],
                                                enc_pv, enc_st)
        stats = {k: float(np.asarray(v)) for k, v in stats.items()}
        print(f"pass {p_i} band {b}: {stats}", flush=True)
    enc_st, th, chi, it, rr = fg(enc_sp, enc_st, th)
    print(f"pass {p_i} fg: chi={float(np.asarray(chi)):.4g} "
          f"cg={float(np.asarray(it))} rr={float(np.asarray(rr)):.2e}",
          flush=True)
