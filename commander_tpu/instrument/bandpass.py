"""Bandpass model: profiles, unit conversions, band integration.

TPU-native counterpart of the reference bandpass module
(``comm_bp_mod.f90`` + ``comm_bp_utils.f90``): a bandpass is a set of
quadrature nodes (nu_k, w_k) such that the band average of a spectral
radiance S is  F = sum_k w_k S(nu_k).  Where the reference precomputes
1D/2D spline lookup tables of band integrals over spectral-parameter grids
(``comm_F_int_{0D,1D,2D}_mod.f90``), we instead evaluate the quadrature
directly inside jit — a (batch x nnode) contraction that vectorizes over
pixels on the VPU/MXU and is exact rather than interpolated. (A cached-table
path can be added for hostile SEDs; so far direct quadrature is faster than
a gather-heavy spline on TPU.)

Bandpass types of the reference (comm_bp_mod.f90:99-116): delta, LFI, WMAP,
HFI_cmb, PSM_LFI, HFI_submm, DIRBE. They differ only in (a) how tau(nu) is
normalized and (b) the output unit convention. We implement the two
normalization families the reference uses:
  * ntherm  : tau normalized against the thermodynamic (CMB) spectrum
              (LFI/WMAP-style radiometers) — band value of dT_cmb is exact.
  * nrj     : tau normalized in brightness (RJ) units.
Bandpass shifts (update_tau, comm_bp_mod.f90:182-221): additive_shift
nu -> nu + delta (and powlaw_tilt) are supported by re-deriving quadrature
weights inside jit from the stored raw profile.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..utils.constants import C_LIGHT, GHZ, H_OVER_K, K_BOLTZ, T_CMB
from ..model.seds import thermo_to_rj


def a2t(nu):
    """uK_RJ -> uK_cmb conversion factor at nu: 1/thermo_to_rj."""
    return 1.0 / thermo_to_rj(nu)


def rj_to_MJysr(nu):
    """uK_RJ -> MJy/sr: 2 k nu^2 / c^2 * 1e-6 K/uK * 1e20 (MJy)."""
    return 2.0 * K_BOLTZ * (nu / C_LIGHT) ** 2 * 1e-6 * 1e20


@dataclasses.dataclass(frozen=True)
class Bandpass:
    """One detector/band bandpass as quadrature nodes.

    nu:  (nnode,) frequencies [Hz]
    tau: (nnode,) raw transmission profile (arbitrary normalization)
    unit: output unit of the band map ('uK_cmb', 'uK_RJ', 'MJy/sr')
    shift_model: 'none' | 'additive_shift' (reference: powlaw_tilt also)
    """
    nu: np.ndarray
    tau: np.ndarray
    unit: str = "uK_cmb"
    # reference profile family (comm_bp_mod.f90:99-116). Determines what
    # the stored tau responds to: RJ brightness temperature
    # (delta/tophat/LFI/WMAP/dame — radiometer conventions) or specific
    # intensity (HFI_cmb/PSM_LFI/HFI_submm/DIRBE — bolometer conventions,
    # where the RJ-temperature response picks up an extra nu^2).
    profile_type: str = "tophat"

    @property
    def nu_c(self) -> float:
        """Effective center frequency."""
        return float(np.sum(self.nu * self.tau) / np.sum(self.tau))

    def weights(self, delta: jnp.ndarray | float = 0.0,
                shift_model: str = "additive_shift"):
        """Quadrature nodes and normalized weights after a bandpass shift.

        Returns (nu_eff, w) with w such that the band response to a uK_RJ
        spectral shape S(nu) in the band's output unit is sum_k w_k S(nu_k).
        Mirrors comm_bp_mod.f90 update_tau (:182-292) + SED2F (:293-322):
        the RJ-temperature response is rho = tau (RJ-defined profiles) or
        tau (nu/nu_c)^2 (intensity-defined: the b'_RJ factor of the HFI /
        DIRBE branches), and the band value in unit U is
            F = int rho S dnu / int rho T_ref,U dnu
        with T_ref,U the 1-U reference spectrum in uK_RJ:
          uK_cmb:  dT_RJ/dT_cmb (update_tau's a / b'_nu ratios)
          uK_RJ:   1
          MJy/sr:  (nu_c/nu) / rj_to_MJysr(nu)   (IRAS color convention,
                   the (nu_c/nu)^ind_iras normalization of HFI_submm/DIRBE)
        Shift models (comm_bp_mod.f90:194-204):
          additive_shift: nu -> nu + delta
          powlaw_tilt:    tau -> tau * (nu/nu_c)^delta  (delta dimensionless)
        """
        tau = jnp.asarray(self.tau)
        if shift_model == "powlaw_tilt":
            nu = jnp.asarray(self.nu)
            tau = tau * (nu / self.nu_c) ** delta
        else:
            nu = jnp.asarray(self.nu) + delta
        if self.profile_type in ("HFI_cmb", "PSM_LFI", "HFI_submm", "DIRBE"):
            tau = tau * jnp.square(nu / self.nu_c)
        if self.nu.size == 1:
            # delta bandpass: evaluate at the (shifted) center frequency
            base = jnp.ones((1,))
        else:
            # trapezoid quadrature (the reference's tsum)
            dnu = jnp.gradient(nu)
            dnu = dnu.at[0].mul(0.5).at[-1].mul(0.5)
            base = tau * dnu
        scale = _UNIT_SCALE.get(self.unit)
        if scale is None:
            raise ValueError(f"unknown band unit {self.unit}")
        if self.unit in ("uK_cmb", "mK_cmb", "K_cmb"):
            norm = jnp.sum(base * thermo_to_rj(nu)) / scale
        elif self.unit == "uK_RJ":
            norm = jnp.sum(base)
        else:   # MJy/sr
            # IRAS convention: reference spectrum I(nu) = 1 MJy/sr (nu_c/nu)
            # expressed in uK_RJ
            norm = jnp.sum(base * (self.nu_c / nu) / rj_to_MJysr(nu))
        return nu, base / norm

    def integrate(self, sed_vals, delta=0.0):
        """Band-integrate precomputed SED values at self nodes (no shift)."""
        _, w = self.weights(delta)
        return jnp.sum(w * sed_vals, axis=-1)


def sz_thermo(nu):
    """Thermal SZ spectral shape in CMB-thermodynamic units:
    f(x) = x (e^x + 1)/(e^x - 1) - 4 (comm_bp_utils.f90 comp_sz_thermo)."""
    x = jnp.asarray(nu) * (H_OVER_K / T_CMB)
    return x * (jnp.exp(x) + 1.0) / jnp.expm1(x) - 4.0


def band_sz_conversion(bp: Bandpass) -> float:
    """y_SZ -> band-map unit conversion (the reference's a2sz family,
    comm_bp_mod.f90:227-263): band response of the thermal SZ distortion
    spectrum T_cmb * f_sz(nu) expressed in the band's output unit."""
    nu, w = bp.weights(0.0)
    # SZ signal in uK_RJ at each node: y * T_cmb[uK] * f_sz(nu) * dT_RJ/dT
    s_rj = (T_CMB * 1e6) * sz_thermo(nu) * thermo_to_rj(nu)
    return float(jnp.sum(w * s_rj))


_UNIT_SCALE = {"uK_cmb": 1.0, "mK_cmb": 1e-3, "K_cmb": 1e-6,
               "uK_RJ": 1.0, "MJy/sr": 1.0}

# per-profile-type relative trimming thresholds on tau
# (comm_bp_mod.f90:99-116)
PROFILE_THRESHOLD = {"delta": 0.0, "LFI": 0.0, "WMAP": 0.0, "DIRBE": 0.0,
                     "HFI_cmb": 1e-7, "PSM_LFI": 1e-7, "HFI_submm": 1e-5,
                     "dame": 0.0}


def trim_profile(nu: np.ndarray, tau: np.ndarray, profile_type: str):
    """Drop nodes with tau below the profile type's relative threshold
    (the reference's per-type threshold trimming at read time)."""
    thr = PROFILE_THRESHOLD.get(profile_type, 0.0)
    if thr <= 0:
        return nu, tau
    keep = tau >= thr * tau.max()
    return nu[keep], tau[keep]


def delta_bandpass(nu0: float, unit: str = "uK_cmb") -> Bandpass:
    """Delta-function bandpass at nu0 (reference profile type 'delta')."""
    return Bandpass(nu=np.array([nu0]), tau=np.array([1.0]), unit=unit,
                    profile_type="delta")


def tophat_bandpass(nu0: float, frac_width: float = 0.2, n: int = 65,
                    unit: str = "uK_cmb") -> Bandpass:
    """Top-hat bandpass (useful stand-in for LFI/WMAP radiometer profiles)."""
    nu = np.linspace(nu0 * (1 - frac_width / 2), nu0 * (1 + frac_width / 2), n)
    return Bandpass(nu=nu, tau=np.ones(n), unit=unit)


def band_unit_conversions(bp: Bandpass):
    """Scalars converting the band's unit to/from uK_RJ at band center
    (the reference's RJ2unit family, comm_comp_mod.f90:249-269)."""
    nu_c = bp.nu_c
    if bp.unit == "uK_cmb":
        to_rj = float(thermo_to_rj(nu_c))
    elif bp.unit == "uK_RJ":
        to_rj = 1.0
    elif bp.unit == "MJy/sr":
        to_rj = 1.0 / float(rj_to_MJysr(nu_c))
    return to_rj
