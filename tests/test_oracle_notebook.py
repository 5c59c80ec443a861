"""Statistical cross-validation against the reference's own pedagogical
oracle: the single-pixel CMB+dust Gibbs sampler of
/root/reference/tutorial/Foreground-modelling.ipynb ("3: Gibbs sampler").

The oracle is reimplemented here as a plain-numpy fixture with the same
conditionals (Gaussian amplitude draws with Gaussian priors; gridded
CDF-inversion draws for beta and T with Gaussian priors). The framework
side runs the SAME single-pixel Gibbs through the production primitives:
model.mixing / model.seds for the SED responses, ops.cg.pcg for the joint
amplitude conditional, and sampling.specind's gridded inversion sampler
for the indices. Posterior moments must agree within Monte-Carlo error —
the acceptance criterion BASELINE.md §protocol step 3 left untested in
round 1 (VERDICT missing #9).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from commander_tpu.instrument.bandpass import delta_bandpass
from commander_tpu.model.mixing import DiffuseComponent, mixing_element
from commander_tpu.ops.cg import pcg
from commander_tpu.sampling.specind import (SpecIndConfig,
                                            sample_specind_pixel)

H_OVER_K = 6.62607e-34 / 1.38065e-23
NUS = np.array([30., 44., 70., 100., 143., 217., 353., 545., 857.]) * 1e9
NU0_D = 857e9
TCMB = 2.7255
TRUE = dict(A_cmb=67.0, A_d=100.0, beta=1.6, T=19.0)
PRIORS = dict(A_cmb=(70.0, 10.0), A_d=(110.0, 20.0),
              beta=(1.65, 0.5), T=(18.0, 3.0))
NGIBBS = 3000
BURN = NGIBBS // 4


def _g(nu):
    """brightness->thermodynamic conversion of the notebook (1/thermo_to_rj)."""
    x = H_OVER_K * nu / TCMB
    return (np.exp(x) - 1.0) ** 2 / (x * x * np.exp(x))


def _s_d(nu, A_d, beta, T):
    return A_d * (nu / NU0_D) ** (beta + 1.0) \
        * np.expm1(H_OVER_K * NU0_D / T) / np.expm1(H_OVER_K * nu / T)


def _simulate(rng):
    s = _s_d(NUS, TRUE["A_d"], TRUE["beta"], TRUE["T"]) \
        + TRUE["A_cmb"] / _g(NUS)
    sigma = 0.1 * s
    return s + rng.standard_normal(len(NUS)) * sigma, sigma


def _oracle_chain(d, sigma, rng):
    """Plain-numpy transcription of the notebook's conditionals."""
    A_d, A_cmb, beta, T = 50.0, 100.0, 1.8, 20.0
    xbeta = np.linspace(1.0, 3.0, 1000)
    xT = np.linspace(10.0, 30.0, 1000)
    out = np.zeros((NGIBBS - BURN, 4))

    def gauss_draw(Tmpl, d_, prior):
        mu, sp = prior
        a1 = np.sum(d_ * Tmpl / sigma**2) \
            + np.sum(Tmpl / sigma * rng.standard_normal(len(Tmpl))) \
            + rng.standard_normal() / sp + mu / sp**2
        a2 = np.sum((Tmpl / sigma) ** 2) + sp**-2
        return a1 / a2

    def inv_draw(xs, lnP):
        P = np.exp(-(lnP - lnP.min()))
        Fx = np.cumsum(0.5 * (P[1:] + P[:-1])) * (xs[1] - xs[0])
        Fx = np.concatenate([[0.0], Fx])
        eta = rng.uniform(0, Fx[-1])
        return np.interp(eta, Fx, xs)

    for i in range(NGIBBS):
        Td = _s_d(NUS, 1.0, beta, T)
        A_d = gauss_draw(Td, d - A_cmb / _g(NUS), PRIORS["A_d"])
        Tc = 1.0 / _g(NUS)
        A_cmb = gauss_draw(Tc, d - _s_d(NUS, A_d, beta, T), PRIORS["A_cmb"])
        for name, xs in (("beta", xbeta), ("T", xT)):
            mu, sp = PRIORS[name]
            lnP = np.zeros(len(xs))
            for k, nu in enumerate(NUS):
                if name == "beta":
                    s = _s_d(nu, A_d, xs, T) + A_cmb / _g(nu)
                else:
                    s = _s_d(nu, A_d, beta, xs) + A_cmb / _g(nu)
                lnP += (d[k] - s) ** 2 / (2 * sigma[k] ** 2)
            lnP += (xs - mu) ** 2 / (2 * sp**2)
            val = inv_draw(xs, lnP)
            if name == "beta":
                beta = val
            else:
                T = val
        if i >= BURN:
            out[i - BURN] = (A_d, A_cmb, beta, T)
    return out


def _framework_chain(d, sigma, seed=0):
    """Same Gibbs through commander_tpu production primitives."""
    # the notebook's data vector is in brightness (RJ) units
    bps = [delta_bandpass(nu, unit="uK_RJ") for nu in NUS]
    cmb = DiffuseComponent(name="cmb", sed="cmb", nu_ref=100e9,
                           unit="uK_cmb")
    dust = DiffuseComponent(name="dust", sed="MBB", nu_ref=NU0_D,
                            theta0=(1.6, 19.0), unit="uK_RJ")
    cfg_b = SpecIndConfig(1.0, 3.0, ngrid=1000,
                          prior_mean=PRIORS["beta"][0],
                          prior_std=PRIORS["beta"][1])
    cfg_T = SpecIndConfig(10.0, 30.0, ngrid=1000,
                          prior_mean=PRIORS["T"][0],
                          prior_std=PRIORS["T"][1])
    inv_s2 = jnp.asarray(1.0 / sigma**2)[:, None, None]     # (B,1,1)
    d_j = jnp.asarray(d)[:, None, None]
    prior_mu = jnp.asarray([PRIORS["A_d"][0], PRIORS["A_cmb"][0]])
    prior_isd = jnp.asarray([1.0 / PRIORS["A_d"][1],
                             1.0 / PRIORS["A_cmb"][1]])

    def F_of(beta, T):
        # production mixing path: SED registry + unit ladder + bandpass
        return jnp.stack(
            [jnp.stack([mixing_element(dust, bp, (beta, T)),
                        mixing_element(cmb, bp, ())]) for bp in bps])

    @jax.jit
    def amp_draw(key, beta, T):
        """Joint (A_d, A_cmb) draw via the production CG solver on
        (A^T N^-1 A + S_p^-1) a = A^T N^-1 d + S_p^-1 mu + flucts."""
        F = F_of(beta, T)                                  # (B, 2)
        k1, k2, k3 = jax.random.split(key, 3)
        w = 1.0 / jnp.asarray(sigma) ** 2
        eta_d = jax.random.normal(k1, (len(NUS),))
        eta_p = jax.random.normal(k2, (2,))
        rhs = F.T @ (w * jnp.asarray(d)) \
            + F.T @ (jnp.sqrt(w) * eta_d) \
            + prior_isd**2 * prior_mu + prior_isd * eta_p

        def A_op(x):
            return F.T @ (w * (F @ x)) + prior_isd**2 * x
        res = pcg(A_op, rhs, tol=1e-12, maxiter=10)
        return res.x

    @jax.jit
    def index_draw(key, amps, beta, T):
        kb, kT = jax.random.split(key)
        A_d, A_cmb = amps[0], amps[1]
        # residual EXCLUDING nothing: chisq lnL uses res incl. the comp
        F_cmb = jnp.stack([mixing_element(cmb, bp, ()) for bp in bps])
        res = d_j - (F_cmb * A_cmb)[:, None, None]
        amp_pix = jnp.asarray(A_d)[None, None]
        b_new = sample_specind_pixel(kb, dust, bps, cfg_b, res, amp_pix,
                                     inv_s2, (beta, T), which=0)[0]
        T_new = sample_specind_pixel(kT, dust, bps, cfg_T, res, amp_pix,
                                     inv_s2, (b_new, T), which=1)[0]
        return b_new, T_new

    key = jax.random.PRNGKey(seed)
    beta, T = 1.8, 20.0
    out = np.zeros((NGIBBS - BURN, 4))
    for i in range(NGIBBS):
        key, k1, k2 = jax.random.split(key, 3)
        amps = amp_draw(k1, beta, T)
        beta, T = index_draw(k2, amps, beta, T)
        if i >= BURN:
            out[i - BURN] = (float(amps[0]), float(amps[1]),
                             float(beta), float(T))
    return out


@pytest.mark.slow
def test_posterior_moments_match_notebook_oracle():
    rng = np.random.default_rng(42)
    d, sigma = _simulate(rng)
    ours = _framework_chain(d, sigma)
    theirs = _oracle_chain(d, sigma, np.random.default_rng(7))
    names = ["A_d", "A_cmb", "beta", "T"]
    n_eff = len(ours) / 10.0          # generous autocorrelation allowance
    for j, name in enumerate(names):
        mu_o, sd_o = theirs[:, j].mean(), theirs[:, j].std()
        mu_f, sd_f = ours[:, j].mean(), ours[:, j].std()
        mc_err = sd_o / np.sqrt(n_eff)
        # means agree within 5x MC error, stds within 20%
        assert abs(mu_f - mu_o) < 5 * mc_err + 0.05 * sd_o, \
            (name, mu_f, mu_o, mc_err)
        assert abs(sd_f / sd_o - 1.0) < 0.2, (name, sd_f, sd_o)
