"""Zodiacal-light emission: Kelsall IPD model line-of-sight integration.

TPU-native counterpart of ``comm_zodi_mod.f90`` (compute_zodi_template
:372): the Kelsall et al. (1998) interplanetary-dust components (smooth
cloud, dust bands, circumsolar ring) integrated along each sample's line of
sight. The reference loops samples and quadrature nodes in Fortran; here
the LOS integral is one (samples x nodes) tensor on the VPU.

Geometry: heliocentric ecliptic coordinates; the observer sits at
earth_pos (AU). Emission is blackbody at the local dust temperature
T(R) = T0 R^-delta times the component density, band-integrated via the
bandpass's effective frequency (delta-nu approximation, as the reference's
per-band SED evaluation).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..utils.constants import C_LIGHT, H_OVER_K, H_PLANCK, K_BOLTZ

AU = 1.495978707e11  # m


@dataclasses.dataclass(frozen=True)
class KelsallCloud:
    """Smooth cloud parameters (Kelsall Table 1 defaults)."""
    n0: float = 1.13e-7      # density at 1 AU [AU^-1]
    alpha: float = 1.34
    beta: float = 4.14
    gamma: float = 0.942
    mu: float = 0.189
    incl: float = 2.03 * np.pi / 180.0   # inclination [rad]
    omega: float = 77.7 * np.pi / 180.0  # ascending node [rad]
    x0: float = 0.0119       # offsets [AU]
    y0: float = 0.00548
    z0: float = -0.00215
    T0: float = 286.0        # dust temperature at 1 AU [K]
    delta: float = 0.467


def _cloud_density(cfg: KelsallCloud, x, y, z):
    xp = x - cfg.x0
    yp = y - cfg.y0
    zp = z - cfg.z0
    R = jnp.sqrt(xp**2 + yp**2 + zp**2)
    # height above the tilted midplane
    zc = xp * jnp.sin(cfg.omega) * jnp.sin(cfg.incl) \
        - yp * jnp.cos(cfg.omega) * jnp.sin(cfg.incl) + zp * jnp.cos(cfg.incl)
    zeta = jnp.abs(zc) / jnp.maximum(R, 1e-6)
    g = jnp.where(zeta < cfg.mu, zeta**2 / (2.0 * cfg.mu), zeta - cfg.mu / 2.0)
    return cfg.n0 * R ** (-cfg.alpha) * jnp.exp(-cfg.beta * g ** cfg.gamma)


@dataclasses.dataclass(frozen=True)
class KelsallBand:
    """Dust band component (Kelsall Table 1, three bands)."""
    n0: float
    delta_zeta: float       # rad
    v: float
    p: float
    delta_r: float          # AU

    def density(self, x, y, z):
        R = jnp.sqrt(x**2 + y**2 + z**2)
        zeta = jnp.abs(z) / jnp.maximum(R, 1e-6)
        zr = zeta / self.delta_zeta
        g6 = zr**6
        return (3.0 * self.n0 / R) * jnp.exp(-(zr**6)) \
            * (self.v + zr**self.p) / (1.0 + 0.0 * zr) \
            * (1.0 - jnp.exp(-((R / self.delta_r) ** 20)))


BAND1 = KelsallBand(n0=5.6e-10, delta_zeta=8.78e-2, v=0.1, p=4.0, delta_r=1.5)
BAND2 = KelsallBand(n0=1.99e-9, delta_zeta=3.49e-2, v=0.9, p=4.0, delta_r=0.94)
BAND3 = KelsallBand(n0=1.44e-10, delta_zeta=2.63e-2, v=0.05, p=4.0, delta_r=1.5)


@dataclasses.dataclass(frozen=True)
class KelsallRing:
    """Circumsolar ring + Earth-trailing feature (Kelsall Table 1)."""
    n0_ring: float = 1.83e-8
    R_ring: float = 1.03
    sigma_r_ring: float = 0.025
    sigma_z_ring: float = 0.054
    n0_feat: float = 1.9e-8
    R_feat: float = 1.06
    sigma_r_feat: float = 0.10
    sigma_z_feat: float = 0.091
    theta_feat: float = -10.0 * np.pi / 180.0
    sigma_theta_feat: float = 12.1 * np.pi / 180.0

    def density(self, x, y, z, earth_lon):
        R = jnp.sqrt(x**2 + y**2 + z**2)
        ring = self.n0_ring * jnp.exp(
            -((R - self.R_ring) ** 2) / (2 * self.sigma_r_ring**2)
            - jnp.abs(z) / self.sigma_z_ring)
        theta = jnp.arctan2(y, x) - (earth_lon + self.theta_feat)
        theta = jnp.arctan2(jnp.sin(theta), jnp.cos(theta))
        feat = self.n0_feat * jnp.exp(
            -((R - self.R_feat) ** 2) / (2 * self.sigma_r_feat**2)
            - jnp.abs(z) / self.sigma_z_feat
            - theta**2 / (2 * self.sigma_theta_feat**2))
        return ring + feat


def _planck_MJysr(nu, T):
    """Blackbody intensity in MJy/sr."""
    x = nu * H_OVER_K / jnp.maximum(T, 1.0)
    # grouped so no f32 intermediate under/overflows even if XLA
    # reassociates (see constants.H_OVER_K): h*nu ~ 8e-21, (nu/c)^2 ~ 1e9
    B = 2.0 * (H_PLANCK * nu) * jnp.square(nu / C_LIGHT) / jnp.expm1(x)
    return B * 1e20


def zodi_template(cfg: KelsallCloud, nu: float, earth_pos, los_vec,
                  r_max: float = 5.2, n_nodes: int = 25,
                  bands: tuple = (), ring: "KelsallRing | None" = None):
    """LOS-integrated zodi intensity [MJy/sr].

    earth_pos: (..., 3) observer position [AU] (broadcast over samples);
    los_vec: (..., 3) unit pointing in ecliptic coords. Optional dust
    bands (BAND1..3) and ring/feature components add their densities
    (comm_zodi_mod compute_zodi_template includes the same set).
    """
    s_nodes = jnp.linspace(0.02, r_max, n_nodes)
    ds = s_nodes[1] - s_nodes[0]
    pos = earth_pos[..., None, :] + los_vec[..., None, :] * s_nodes[:, None]
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
    R = jnp.sqrt(x**2 + y**2 + z**2)
    T = cfg.T0 * jnp.maximum(R, 1e-6) ** (-cfg.delta)
    dens = _cloud_density(cfg, x, y, z)
    for b in bands:
        dens = dens + b.density(x, y, z)
    if ring is not None:
        earth_lon = jnp.arctan2(earth_pos[..., 1], earth_pos[..., 0])
        dens = dens + ring.density(x, y, z, earth_lon[..., None])
    emis = dens * _planck_MJysr(nu, T)
    # integrate n(s) B(T(s)) ds with s in AU: Kelsall densities are
    # normalized for AU path lengths (n0 = 1.13e-7 AU^-1 gives ~17 MJy/sr
    # toward the ecliptic pole at 25 um, the DIRBE ZLE scale)
    return jnp.sum(emis, axis=-1) * ds


# ---------------------------------------------------------------------------
# TOD-level template (the driver's entry point; compute_zodi_template,
# comm_zodi_mod.f90:372-513)
# ---------------------------------------------------------------------------

# Galactic -> ecliptic rotation (J2000; the reference precomputes the same
# matrix via getEcl2GalMatrix at init, comm_zodi_mod.f90:324-367)
GAL2ECL = np.array([
    [-0.054882486, 0.494116468, -0.867661702],
    [-0.993821033, -0.110993846, -0.000346354],
    [-0.096476249, 0.862281440, 0.499513697]]).T  # ecl<-equ @ equ<-gal


def _gal2ecl_matrix():
    """Build gal->ecl as (equ->ecl) @ (gal->equ) from first principles so
    the constant above is auditable: obliquity 23.4392911 deg; galactic
    pole/center per the IAU 1958 definition."""
    eps = np.radians(23.4392911)
    equ2ecl = np.array([[1, 0, 0],
                        [0, np.cos(eps), np.sin(eps)],
                        [0, -np.sin(eps), np.cos(eps)]])
    # galactic -> equatorial (J2000) rotation (columns = gal axes in equ)
    gal2equ = np.array([
        [-0.0548755604, +0.4941094279, -0.8676661490],
        [-0.8734370902, -0.4448296300, -0.1980763734],
        [-0.4838350155, +0.7469822445, +0.4559837762]])
    return equ2ecl @ gal2equ


GAL2ECL = _gal2ecl_matrix()


def zodi_tod_template(nside: int, pix, satpos, nu, r_sat: float = 1.0,
                      cloud: KelsallCloud = KelsallCloud(),
                      bands: tuple = (BAND1, BAND2, BAND3),
                      ring: "KelsallRing | None" = None,
                      n_nodes: int = 25, r_max: float = 5.2):
    """Zodi signal for a TOD chunk, reference call signature.

    pix: (..., Nt) RING pixels (galactic); satpos: (Ns, 2) observatory
    ecliptic (lon, lat) [deg] broadcast over the leading axis of pix;
    nu: band frequency [Hz]. Returns (..., Nt) intensity [MJy/sr].

    Matches compute_zodi_template (comm_zodi_mod.f90:372-513): observer at
    r_sat AU from (lon, lat); LOS unit vectors are the galactic HEALPix
    pixel vectors rotated to ecliptic.
    """
    from ..sphere import healpix

    vec_gal = healpix.pix2vec_ring(nside)               # (npix, 3)
    ecl_vecs = jnp.asarray(vec_gal @ GAL2ECL.T)         # (npix, 3)
    lon = jnp.radians(satpos[:, 0])
    lat = jnp.radians(satpos[:, 1])
    earth = r_sat * jnp.stack([jnp.cos(lat) * jnp.cos(lon),
                               jnp.cos(lat) * jnp.sin(lon),
                               jnp.sin(lat)], axis=-1)   # (Ns, 3)
    extra = pix.ndim - 1
    earth_b = earth.reshape(earth.shape[:1] + (1,) * extra + (3,))
    los = ecl_vecs[pix]                                  # (..., Nt, 3)
    return zodi_template(cloud, nu, earth_b, los, r_max=r_max,
                         n_nodes=n_nodes, bands=bands, ring=ring)


def mjysr_to_uk_rj(nu: float) -> float:
    """MJy/sr -> uK_RJ at frequency nu [Hz] (dB/dT_RJ = 2 k nu^2/c^2)."""
    dbdt = 2.0 * K_BOLTZ * nu * nu / (C_LIGHT * C_LIGHT)   # W/m^2/Hz/sr/K
    return 1e-20 / dbdt * 1e6                              # MJy/sr -> uK_RJ


def mjysr_to_uk_cmb(nu: float) -> float:
    """MJy/sr -> uK_CMB at frequency nu [Hz] (dB/dT at T_CMB)."""
    from ..utils.constants import T_CMB
    x = nu * (H_OVER_K / T_CMB)
    g = np.expm1(x) ** 2 / (x * x * np.exp(x))
    return mjysr_to_uk_rj(nu) * g
