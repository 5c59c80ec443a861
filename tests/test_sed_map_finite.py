"""Regression: SED/mixing evaluation must stay finite under lax.map/scan.

XLA's constant-folder + algebraic simplifier may reassociate
(h*nu/(k*T))^2 into (h*nu)^2/(k*T)^2; (6.6e-34 * 3e10)^2 ~ 4e-46
underflows float32 to 0/0 = NaN. This appeared ONLY in compiled
scan/map bodies (eager and vmap were fine) and took out the fullgibbs
driver path at every scale (chisq NaN on iteration 1, CG NaN on 2):
the spectral-index grid scan (_grid_lnL_total) evaluates
mixing_element inside jax.lax.map. Fixed by prescaling h/k in Python
f64 (utils.constants.H_OVER_K); this test locks the compiled path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from commander_tpu.instrument.bandpass import delta_bandpass, tophat_bandpass
from commander_tpu.model.mixing import DiffuseComponent, mixing_element

COMPS = [
    # cmb has no spectral parameters: which=-1 marks the sweep as
    # intentionally constant (the grid only drives the lax.map trip).
    (DiffuseComponent(name="cmb", sed="cmb", nu_ref=100e9,
                      unit="uK_cmb"), -1, (0.0, 1.0)),
    (DiffuseComponent(name="synch", sed="power_law", nu_ref=30e9,
                      theta0=(-3.1,)), 0, (-3.8, -2.4)),
    (DiffuseComponent(name="dust", sed="MBB", nu_ref=353e9,
                      theta0=(1.6, 19.6)), 0, (1.1, 2.1)),
    (DiffuseComponent(name="dust", sed="MBB", nu_ref=353e9,
                      theta0=(1.6, 19.6)), 1, (14.0, 26.0)),
    (DiffuseComponent(name="ff", sed="freefree", nu_ref=40e9,
                      theta0=(7000.0,)), 0, (4000.0, 12000.0)),
    (DiffuseComponent(name="ame", sed="spindust", nu_ref=22e9,
                      theta0=(21e9,)), 0, (15e9, 35e9)),
]


@pytest.mark.parametrize("comp,which,rng",
                         COMPS, ids=[f"{c.name}-{j}" for c, j, _ in COMPS])
@pytest.mark.parametrize("mkbp", [delta_bandpass, tophat_bandpass],
                         ids=["delta", "tophat"])
def test_mixing_finite_under_lax_map(comp, which, rng, mkbp):
    # guard against dead parametrizations: which must index a real
    # parameter, or be the explicit -1 "no parameters" marker
    if which >= 0:
        assert which < len(comp.theta0), (comp.name, which)
    else:
        assert not comp.theta0, (comp.name, which)
    grid = jnp.asarray(np.linspace(rng[0], rng[1], 16), jnp.float32)
    for f_ghz in (28.4, 44.1, 70.1, 353.0):
        bp = mkbp(f_ghz * 1e9)

        def one(tg):
            th = tuple(tg if i == which else jnp.asarray(t, jnp.float32)
                       for i, t in enumerate(comp.theta0))
            return jnp.asarray(mixing_element(comp, bp, th),
                               jnp.float32)

        vals = np.asarray(jax.jit(
            lambda g: jax.lax.map(one, g))(grid))
        assert np.isfinite(vals).all(), (comp.name, which, f_ghz, vals)
        # and the compiled values must match the eager ones
        ref = np.asarray([one(jnp.float32(x)) for x in np.asarray(grid)])
        np.testing.assert_allclose(vals, ref, rtol=2e-5)
