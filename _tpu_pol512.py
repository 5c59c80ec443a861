"""Isolate the nside-512 polarized encoded-gibbs NaN: no TOD, synthetic
pol system, one fg_step_enc-style call, staged finiteness probes."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import build_model
from commander_tpu.sampling import amplitude as amp, gibbs
from commander_tpu.sampling import tpu_gibbs as tg
from commander_tpu.sphere import sht
from commander_tpu.utils import transfer as tr
from commander_tpu.model.cl import ClModelConfig

jax.config.update("jax_default_device", jax.devices("cpu")[0])

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 512
lmax = 2 * nside

cfg = lower_params(Params.load("param_tutorial_full.txt"))
import dataclasses
# drop TOD for isolation
for i, b in enumerate(cfg.bands):
    cfg.bands[i] = dataclasses.replace(b, tod_type="none")
cfg = dataclasses.replace(cfg, enable_tod=False)

t0 = time.time()
(plan, sysm, diffuse, bps, cl_cfg, cl0, meta, truth, pcfgs, ts, ps,
 cl_cfgs) = build_model(cfg, nside=nside, lmax=lmax, synthetic=True,
                        dtype="float32", pol=True)
print(f"build {time.time()-t0:.0f}s", flush=True)

gcfg = gibbs.GibbsConfig(cl_cfg=cl_cfg, cg_tol=1e-7, cg_maxiter=30,
                         cl_cfgs=cl_cfgs)
slots = tg.make_index_slots(diffuse, pcfgs)
state = gibbs.init_state(jax.random.PRNGKey(0), len(diffuse),
                         meta["nmaps"], lmax, len(cl_cfg.bin_starts),
                         ntemp=(0 if ts is None else ts.maps.shape[0]),
                         nsrc=(0 if ps is None else ps.stamp.shape[2]))

plan_dev = sht.get_plan(nside, lmax, dtype="float32", spin2=True,
                        tables=False, legendre_backend="pallas")
spec_sp, enc_sp = tr.encode((sysm, plan_dev, ts, ps))
dev0 = [d for d in jax.devices() if d.platform != "cpu"][0]
enc_sp = jax.device_put(enc_sp, dev0)
spec_st, enc_st = tr.encode((state,))
enc_st = jax.device_put(enc_st, dev0)


@jax.jit
def probe(e_sp, e_st):
    s, p, _ts, _ps = tr.decode(spec_sp, e_sp)
    (st,) = tr.decode(spec_st, e_st)
    out = {}
    out["data_finite"] = jnp.isfinite(s.data).all()
    out["cl_finite"] = jnp.isfinite(s.cl).all()
    # pol synthesis roundtrip finiteness at scale
    a0 = st.a
    sky = amp._synth(p, amp._project_bands(s, p, a0))
    out["sky_finite"] = jnp.isfinite(sky).all()
    adj = amp._synth_T(p, sky)
    out["adj_finite"] = jnp.isfinite(jnp.abs(adj)).all()
    rhs = amp.compute_rhs(s, p, jax.random.PRNGKey(3))
    out["rhs_finite"] = jnp.isfinite(jnp.abs(rhs)).all()
    out["rhs_norm"] = jnp.sqrt(jnp.sum(jnp.abs(rhs) ** 2))
    M = amp.build_preconditioner(s, p)
    z = M(rhs)
    out["prec_finite"] = jnp.isfinite(jnp.abs(z)).all()
    return {k: jnp.asarray(v, jnp.float32) for k, v in out.items()}


t0 = time.time()
res = probe(enc_sp, enc_st)
res = {k: float(np.asarray(v)) for k, v in res.items()}
print(f"probe {time.time()-t0:.0f}s: {res}", flush=True)


@jax.jit
def one_step(e_sp, e_st):
    s, p, _ts, _ps = tr.decode(spec_sp, e_sp)
    (st,) = tr.decode(spec_st, e_st)
    st2, th, s2 = tg.full_gibbs_step(
        gcfg, tuple(diffuse), tuple(bps), slots, s, p, st,
        jnp.asarray([float(np.mean(t)) for sl in slots
                     for t in [diffuse[sl.ci].theta0[sl.which]]],
                    jnp.float32),
        jax.random.PRNGKey(5), beam_consistent=True, ts=_ts, ps=_ps)
    from commander_tpu.sampling.chisq import compute_residual
    r = compute_residual(s2, p, st2.a)
    chi = jnp.sum(jnp.square(r) * s2.inv_rms2)
    return (chi.astype(jnp.float32), st2.cg_iters.astype(jnp.float32),
            st2.cg_relres.astype(jnp.float32))

t0 = time.time()
chi, it, rr = (float(np.asarray(v)) for v in one_step(enc_sp, enc_st))
print(f"step {time.time()-t0:.0f}s: chisq={chi:.4g} cg={it} rr={rr:.2e}",
      flush=True)
