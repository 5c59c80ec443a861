"""Vectorized SED library — every diffuse component type of the reference.

Reference inventory (SURVEY.md §2.6; one eval function per concrete type in
``comm_*_comp_mod.f90``): cmb, powlaw (synchrotron), MBB (thermal dust),
freefree, spindust / spindust2 (AME), physdust, line (CO), md, template,
cmb_relquad. Here each SED is a pure jnp function of frequency [Hz] and the
component's spectral parameters theta, returning brightness-temperature (uK_RJ)
response normalized so the component amplitude is expressed in its natural
unit at its reference frequency (matching the reference's conventions:
``comm_cmb_comp_mod.f90`` unit handling, ``comm_powlaw_comp_mod.f90:~120``,
``comm_MBB_comp_mod.f90:~120``, ``comm_freefree_comp_mod.f90:~130``,
``comm_spindust_comp_mod.f90:~140``).

All functions broadcast: nu can be (nfreq,) while theta entries are scalars or
(..., npix) maps; outputs broadcast over both. Everything is jit-safe.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.constants import C_LIGHT, H_OVER_K, H_PLANCK, K_BOLTZ, T_CMB


def x_of(nu):
    """Dimensionless h nu / k T_cmb (prescaled h/k: see constants.H_OVER_K
    for the float32 XLA-reassociation underflow this avoids)."""
    return nu * (H_OVER_K / T_CMB)


def thermo_to_rj(nu):
    """dT_RJ / dT_cmb at frequency nu: x^2 e^x / (e^x - 1)^2."""
    x = x_of(nu)
    ex = jnp.exp(x)
    return x * x * ex / jnp.square(ex - 1.0)


def sed_cmb(nu, theta=()):
    """CMB: amplitude in uK_cmb, response in uK_RJ (comm_cmb_comp_mod.f90)."""
    return thermo_to_rj(nu)


def sed_powlaw(nu, nu_ref, beta):
    """Power law (synchrotron): (nu/nu_ref)^beta, amplitude uK_RJ at nu_ref
    (comm_powlaw_comp_mod.f90 evalSED)."""
    return jnp.exp(beta * jnp.log(nu / nu_ref))


def sed_curved_powlaw(nu, nu_ref, beta, c_run):
    """Power law with curvature: (nu/nu0)^(beta + C log(nu/nu0))."""
    lr = jnp.log(nu / nu_ref)
    return jnp.exp((beta + c_run * lr) * lr)


def sed_mbb(nu, nu_ref, beta, T_d):
    """Modified blackbody (thermal dust), amplitude uK_RJ at nu_ref
    (comm_MBB_comp_mod.f90 evalSED):
        S = (nu/nu0)^(beta+1) * (exp(h nu0/k T)-1)/(exp(h nu/k T)-1).
    """
    x0 = H_OVER_K * nu_ref / T_d
    x = H_OVER_K * nu / T_d
    return jnp.exp((beta + 1.0) * jnp.log(nu / nu_ref)) * jnp.expm1(x0) / jnp.expm1(x)


def _gaunt(nu, T_e):
    """Free-free Gaunt factor (Draine 2011 form used by the reference)."""
    nu9 = nu / 1e9
    Te4 = T_e / 1e4
    return jnp.log(jnp.exp(5.960 - (jnp.sqrt(3.0) / jnp.pi)
                           * jnp.log(nu9 * Te4 ** (-1.5))) + jnp.e)


def sed_freefree(nu, nu_ref, T_e):
    """Free-free, amplitude uK_RJ at nu_ref (comm_freefree_comp_mod.f90):
        S ~ g_ff(nu;Te)/g_ff(nu0;Te) * (nu0/nu)^2 * exp(-h nu/kTe)/exp(-h nu0/kTe)
    (the exponential factors are ~1 at radio frequencies; kept for parity).
    """
    g = _gaunt(nu, T_e) / _gaunt(nu_ref, T_e)
    expf = jnp.exp(-H_OVER_K * (nu - nu_ref) / T_e)
    return g * jnp.square(nu_ref / nu) * expf


# --- spinning dust: template SED shifted in peak frequency -----------------
# The reference interpolates the SpDust2 CNM emissivity table (input data
# file, not in-tree). We carry the same mechanism — log-log interpolation of a
# tabulated j(nu)/nu^2 template shifted so its peak lands at nu_p — with a
# built-in analytic stand-in (log-normal bump, peak 30 GHz) that can be
# replaced by a loaded table via `set_spindust_template`.

_SPD_LOGNU = np.log(np.geomspace(0.05e9, 3000e9, 512))
_sig = 0.7
_SPD_LOGJ = (-2.0 * _SPD_LOGNU) + (-0.5 * ((_SPD_LOGNU - np.log(30e9)) / _sig) ** 2)
# Native peak of the stored template, defined EXACTLY as the loader does
# (argmax of the raw emissivity j, comm_spindust_comp_mod.f90:128-133) so
# nu_p means the same thing for the built-in and a loaded table.
_SPD_PEAK = float(np.exp(_SPD_LOGNU[np.argmax(_SPD_LOGJ + 2.0 * _SPD_LOGNU)]))


def set_spindust_template(nu, j_emission, peak_hz):
    """Install a tabulated spinning-dust emissivity template (e.g. SpDust2)."""
    global _SPD_LOGNU, _SPD_LOGJ, _SPD_PEAK
    _SPD_LOGNU = np.log(np.asarray(nu))
    _SPD_LOGJ = np.log(np.asarray(j_emission) / np.asarray(nu) ** 2)
    _SPD_PEAK = float(peak_hz)


def load_spindust_template(path):
    """Load a SpDust2-style two-column ASCII emissivity file (nu [GHz],
    j_nu; '#' comments) and install it — the reference's COMP_SED_TEMPLATE
    read (read_spectrum, comm_utils.f90:619-677: GHz -> Hz) with the native
    peak taken at the emissivity maximum
    (comm_spindust_comp_mod.f90:128-133)."""
    tbl = np.loadtxt(path, comments="#")
    nu = np.asarray(tbl[:, 0], np.float64) * 1e9
    j = np.asarray(tbl[:, 1], np.float64)
    order = np.argsort(nu)
    nu, j = nu[order], j[order]
    set_spindust_template(nu, j, nu[int(np.argmax(j))])


def _spd_interp(lognu):
    return jnp.interp(lognu, jnp.asarray(_SPD_LOGNU), jnp.asarray(_SPD_LOGJ),
                      left=-300.0, right=-300.0)


def sed_spindust(nu, nu_ref, nu_p):
    """Spinning dust (AME), 1-parameter peak shift
    (comm_spindust_comp_mod.f90 evalSED):
        S(nu; nu_p) = (nu_ref/nu)^2 * f(nu * nu_p0/nu_p) / f(nu_ref * nu_p0/nu_p)
    where f is the tabulated intensity template and nu_p0 its native peak.
    """
    shift = jnp.log(_SPD_PEAK) - jnp.log(nu_p)
    num = _spd_interp(jnp.log(nu) + shift)
    den = _spd_interp(jnp.log(nu_ref) + shift)
    # stored logJ = log(j/nu^2), so the (nu_ref/nu)^2 intensity->RJ factor
    # of the reference formula is already inside the difference:
    # exp(num-den) = j(s nu)/j(s nu_ref) * (nu_ref/nu)^2
    return jnp.exp(num - den)


def sed_spindust2(nu, nu_ref, nu_p, alpha):
    """2-parameter AME: peak shift + power-law tilt
    (comm_spindust2_comp_mod.f90): S_spindust * (nu/nu_ref)^alpha."""
    return sed_spindust(nu, nu_ref, nu_p) * jnp.exp(alpha * jnp.log(nu / nu_ref))


# --- physical dust: multi-grain emission tables + U-distribution integral --
# The reference's comm_physdust_comp_mod.f90 reads per-grain-population
# emission tables e_i(wavelength, log U) (external data files), then evaluates
#   SED(nu; logUmin) = [ (1-gamma) sum_i A_i e_i(wav, logUmin)
#                        + gamma  sum_i A_i \int e_i(wav, logU(u)) f(u) du ]
#                      / (same at nu_ref) * (nu_ref/nu)^3
# with f(u) du the Aniano et al. (2012) power-law radiation-field
# distribution between Umin = 10^theta and Umax (evalSED :188-253). The
# default table below is generated from modified-blackbody grain curves with
# T_i(U) = T0_i U^(1/6) — replace with real DL07-style tables via
# set_physdust_model.

def _default_physdust_table():
    wav = np.geomspace(1.0, 3.0e6, 600)                       # um
    logU = np.linspace(-0.5, 0.5, 11)
    T0 = np.array([16.0, 19.0, 23.0, 9.0])
    beta_g = np.array([1.5, 1.7, 2.0, 1.2])
    nu = C_LIGHT / (wav * 1e-6)                               # (nnu,)
    T = T0[:, None, None] * (10.0 ** logU[None, None, :]) ** (1.0 / 6.0)
    x = H_PLANCK * nu[None, :, None] / (K_BOLTZ * T)
    # nu * I_nu with I_nu = Planck * nu^beta opacity (the reference's file
    # convention — its (nu_ref/nu)^3 factor assumes nu I_nu tables)
    log_e = ((4.0 + beta_g[:, None, None]) * np.log(nu[None, :, None])
             - np.log(np.expm1(np.clip(x, 1e-10, 700.0))))
    # a global offset cancels in the SED ratio; keep exp() in range
    log_e -= log_e.max()
    return np.log(wav), logU, log_e, np.array([1.0, 0.7, 0.3, 0.2])


_PD_LOGWAV, _PD_LOGU, _PD_LOGE, _PD_AMPS = _default_physdust_table()
_PD_PARS = {"log_umax": 0.5, "gamma": 0.0, "alpha": 2.0}


def set_physdust_model(wav_um, logU_grid, log_emission, amps,
                       log_umax=0.5, gamma=0.0, alpha=2.0):
    """Install physical-dust emission tables (the reference's
    CS_SED_TEMPLATE files) and auxiliary parameters (CS_AUXPAR:
    log_umax, gamma, alpha, amps)."""
    global _PD_LOGWAV, _PD_LOGU, _PD_LOGE, _PD_AMPS, _PD_PARS
    _PD_LOGWAV = np.log(np.asarray(wav_um))
    _PD_LOGU = np.asarray(logU_grid)
    # a global offset cancels in the SED ratio; keep exp() in range
    _PD_LOGE = np.asarray(log_emission) - np.max(log_emission)
    _PD_AMPS = np.asarray(amps)
    _PD_PARS = {"log_umax": float(log_umax), "gamma": float(gamma),
                "alpha": float(alpha)}


def _pd_interp2(logwav, logu):
    """Bilinear interpolation of log e_i over (log wav, logU); returns the
    amp-weighted linear-space sum over grain components. Broadcasts logwav
    against scalar/array logu."""
    lw = jnp.asarray(_PD_LOGWAV)
    lu = jnp.asarray(_PD_LOGU)
    tbl = jnp.asarray(_PD_LOGE)                                # (nc, nw, nu)
    iw = jnp.clip(jnp.searchsorted(lw, logwav) - 1, 0, len(_PD_LOGWAV) - 2)
    iu = jnp.clip(jnp.searchsorted(lu, logu) - 1, 0, len(_PD_LOGU) - 2)
    fw = (logwav - lw[iw]) / (lw[iw + 1] - lw[iw])
    fu = (logu - lu[iu]) / (lu[iu + 1] - lu[iu])
    fw = jnp.clip(fw, 0.0, 1.0)
    fu = jnp.clip(fu, 0.0, 1.0)
    v00 = tbl[:, iw, iu]
    v10 = tbl[:, iw + 1, iu]
    v01 = tbl[:, iw, iu + 1]
    v11 = tbl[:, iw + 1, iu + 1]
    loge = (v00 * (1 - fw) * (1 - fu) + v10 * fw * (1 - fu)
            + v01 * (1 - fw) * fu + v11 * fw * fu)
    return jnp.sum(jnp.asarray(_PD_AMPS)[:, None] * jnp.exp(
        loge.reshape(len(_PD_AMPS), -1)), axis=0).reshape(jnp.shape(loge)[1:])


def _pd_emission(nu, log_umin, n_u: int = 100):
    """(1-gamma) delta term + gamma U-distribution integral at frequency nu
    (broadcasts over nu)."""
    logwav = jnp.log(C_LIGHT / nu * 1e6)
    gamma = _PD_PARS["gamma"]
    alpha = _PD_PARS["alpha"]
    out = (1.0 - gamma) * _pd_interp2(logwav, log_umin)
    if gamma != 0.0:
        log_umax = _PD_PARS["log_umax"]
        umin = 10.0 ** log_umin
        umax = 10.0 ** log_umax
        jj = jnp.arange(n_u) / (n_u - 1.0)
        uval = umin * (umax / umin) ** jj                      # (n_u,)
        du = umin * ((umax / umin) ** (1.0 / (n_u - 1.0)) - 1.0)
        if alpha != 1.0:
            fdu = (uval ** (1.0 - alpha) * du * gamma * (alpha - 1.0)
                   / (umin ** (1.0 - alpha) - umax ** (1.0 - alpha)))
        else:
            fdu = du * gamma / jnp.log(umax / umin) * jnp.ones_like(uval)
        vals = _pd_interp2(logwav[..., None],
                           jnp.log10(uval) * jnp.ones_like(logwav[..., None]))
        out = out + jnp.sum(vals * fdu, axis=-1)
    return out


def sed_physdust(nu, nu_ref, log_umin):
    """Physical (multi-grain) dust SED, parameter theta = log10 Umin
    (comm_physdust_comp_mod.f90 evalSED :188-253). Emission ratio normalized
    at nu_ref, converted to brightness-temperature units via (nu_ref/nu)^3
    exactly as the reference; zero below 2 GHz."""
    num = _pd_emission(jnp.asarray(nu), log_umin)
    den = _pd_emission(jnp.asarray(nu_ref), log_umin)
    sed = (num / den) * (nu_ref / nu) ** 3
    return jnp.where(jnp.asarray(nu) < 2e9, 0.0, sed)


def sed_line(nu, nu_ref, width_hz=1e6):
    """Line emission (CO): delta response at the line frequency — handled at
    the mixing-matrix level (comm_line_comp_mod.f90 assigns per-band ratios);
    this kernel exists for completeness in quadrature integrals."""
    return jnp.where(jnp.abs(nu - nu_ref) < width_hz, 1.0, 0.0)


SED_REGISTRY = {
    "cmb": sed_cmb,
    "power_law": sed_powlaw,
    "curved_power_law": sed_curved_powlaw,
    "MBB": sed_mbb,
    "freefree": sed_freefree,
    "spindust": sed_spindust,
    "spindust2": sed_spindust2,
    "physdust": sed_physdust,
    "line": sed_line,
}

# Number of spectral parameters per type (theta columns), matching the
# reference's npar per component class.
SED_NPAR = {
    "cmb": 0, "power_law": 1, "curved_power_law": 2, "MBB": 2,
    "freefree": 1, "spindust": 1, "spindust2": 2, "physdust": 1,
    "line": 0, "md": 0, "template": 0, "cmb_relquad": 0,
}
