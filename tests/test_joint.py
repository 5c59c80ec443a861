"""Joint (diffuse + md/template + ptsrc) amplitude solve tests."""
import jax
import jax.numpy as jnp
import numpy as np

from commander_tpu.sampling import amplitude as amp
from commander_tpu.sampling import joint
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import random_alm_white, triangle_mask

from test_amplitude import make_system, NSIDE, LMAX, NPIX


def _joint_setup(rms_level=5.0, seed=0):
    plan, sys, a_true = make_system(rms_level=rms_level, seed=seed)
    nband = sys.data.shape[0]
    ts = joint.make_md_templates(NSIDE, nband)
    rng = np.random.default_rng(seed + 1)
    src_pix = rng.choice(NPIX, size=5, replace=False)
    F_src = np.abs(rng.standard_normal((nband, 5))) + 0.5
    ps = joint.gaussian_stamp_ptsrc(NSIDE, src_pix, F_src,
                                    np.array([600.0, 420.0, 300.0]),
                                    npatch=32)
    # inject known template + source signals into the data
    t_true = jnp.asarray(rng.standard_normal(ts.maps.shape[0]) * 5.0)
    p_true = jnp.asarray(np.abs(rng.standard_normal(5)) * 3.0)
    extra = joint._templates_fwd(ts, t_true) \
        + joint._ptsrc_fwd(ps, p_true, NPIX)
    import dataclasses
    sys = dataclasses.replace(sys, data=sys.data + extra)
    return plan, sys, ts, ps, a_true, t_true, p_true


def test_joint_operator_self_adjoint():
    plan, sys, ts, ps, *_ = _joint_setup()
    nl = LMAX + 1
    tri = jnp.asarray(triangle_mask(nl, nl))
    def rnd(seed):
        k = jax.random.PRNGKey(seed)
        ka, kt, kp = jax.random.split(k, 3)
        return joint.JointState(
            a=random_alm_white(ka, (3, 1, nl, nl)) * tri,
            t=jax.random.normal(kt, (ts.maps.shape[0],)),
            p=jax.random.normal(kp, (5,)))
    u, v = rnd(1), rnd(2)
    Au = joint.apply_A_joint(sys, plan, ts, ps, u)
    Av = joint.apply_A_joint(sys, plan, ts, ps, v)
    lhs = joint.joint_dot(u, Av)
    rhs = joint.joint_dot(Au, v)
    assert abs(lhs - rhs) < 1e-8 * abs(lhs)
    assert joint.joint_dot(u, Au) > 0


def test_joint_high_snr_recovery():
    plan, sys, ts, ps, a_true, t_true, p_true = _joint_setup(rms_level=0.01)
    x, res = joint.sample_joint(sys, plan, ts, ps, key=None, tol=1e-12,
                                maxiter=2000)
    assert res.converged
    # monopole/dipole templates and a_l0/a_l1 of diffuse comps are partially
    # degenerate (as in the reference, which constrains md with priors); the
    # SUM of the projected signals is what must be recovered.
    sky_rec = amp._synth(plan, amp._project_bands(sys, plan, x.a)) \
        + joint._templates_fwd(ts, x.t) + joint._ptsrc_fwd(ps, x.p, NPIX)
    resid = np.asarray(sys.data - sky_rec)
    rms = 0.01
    # residual should be at noise level
    assert np.sqrt((resid ** 2).mean()) < 3 * rms


def test_ptsrc_projection_adjoint():
    plan, sys, ts, ps, *_ = _joint_setup()
    rng = np.random.default_rng(3)
    p = jnp.asarray(rng.standard_normal(5))
    m = jnp.asarray(rng.standard_normal(sys.data.shape))
    lhs = float(jnp.sum(joint._ptsrc_fwd(ps, p, NPIX) * m))
    rhs = float(jnp.sum(p * joint._ptsrc_adj(ps, m)))
    assert abs(lhs - rhs) < 1e-9 * max(abs(lhs), 1.0)


def test_template_projection_adjoint():
    plan, sys, ts, ps, *_ = _joint_setup()
    rng = np.random.default_rng(4)
    t = jnp.asarray(rng.standard_normal(ts.maps.shape[0]))
    m = jnp.asarray(rng.standard_normal(sys.data.shape))
    lhs = float(jnp.sum(joint._templates_fwd(ts, t) * m))
    rhs = float(jnp.sum(t * joint._templates_adj(ts, m)))
    assert abs(lhs - rhs) < 1e-9 * max(abs(lhs), 1.0)


def test_template_amp_masked_posterior():
    """Masked template draw matches the analytic Gaussian posterior
    (sample_partialsky_tempamps, comm_signal_mod.f90:459-524)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from commander_tpu.sampling.joint import sample_template_amp_masked

    rng = np.random.default_rng(0)
    npix = 3072
    T = rng.standard_normal(npix)
    amp_true = 2.5
    sig = 0.3
    d = amp_true * T + sig * rng.standard_normal(npix)
    inv2 = jnp.full(npix, 1.0 / sig ** 2)
    mask = jnp.asarray((np.arange(npix) % 3 != 0).astype(float))
    # posterior mean (no prior)
    mu = float(sample_template_amp_masked(None, jnp.asarray(d),
                                          jnp.asarray(T), inv2, mask,
                                          sample=False))
    w = np.asarray(mask) / sig ** 2
    mu_ref = np.sum(w * d * T) / np.sum(w * T * T)
    assert abs(mu - mu_ref) < 1e-10
    assert abs(mu - amp_true) < 0.02
    # draws scatter with the posterior sigma
    draws = [float(sample_template_amp_masked(jax.random.PRNGKey(s),
                                              jnp.asarray(d), jnp.asarray(T),
                                              inv2, mask))
             for s in range(64)]
    sig_ref = 1.0 / np.sqrt(np.sum(w * T * T))
    assert abs(np.std(draws) - sig_ref) < 0.35 * sig_ref
    # strong prior pulls the draw to the prior mean
    mu_p = float(sample_template_amp_masked(None, jnp.asarray(d),
                                            jnp.asarray(T), inv2, mask,
                                            prior_mean=0.0, prior_std=1e-6,
                                            sample=False))
    assert abs(mu_p) < 1e-3
