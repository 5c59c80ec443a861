"""One fully-jitted Gibbs iteration: amplitudes + C_ell + spectral indices
+ in-jit mixing rebuild.

The general driver (run.py) orchestrates the nonlinear step host-side per
(component, parameter) — flexible, but each step leaves jit. This module is
the TPU production path for the common case (scalar spectral indices,
fullsky inversion sampling, shared resolution): the ENTIRE Gibbs iteration
— the reference's commander.f90:182-254 loop body minus TOD —

    1. F(theta) mixing rebuild       (updateMixmat, in-jit quadrature)
    2. a ~ P(a | d, Cl, theta)       (sample_amps_by_CG)
    3. Cl ~ P(Cl | a)                (sample_powspec, binned inverse-gamma)
    4. theta_cj ~ P(theta | a, d)    (sampleDiffuseSpecIndFullsky_nonlin,
                                      one batched grid per (comp, param))

is one jit-compiled function of (system, state, thetas, key), so a whole
chain runs device-side with no host round trips. Reference call stack:
SURVEY.md §3.2; the per-(comp,param) residual/grid evaluations are batched
SHTs + einsums instead of the reference's serial Fortran loops.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..model.mixing import DiffuseComponent, mixing_matrix
from ..sphere import sht
from . import amplitude as amp
from . import gibbs as gibbs_mod
from . import specind as si
def synth_bands_seq(plan, alm_b):
    """Band synthesis sequenced over the band axis (lax.map, unroll 1).

    Identical math to amp._synth on (B, S, nl, nm); used on the
    residual/index phases so only ONE band's ring-FFT workspaces are
    live at a time. At nside 1024 the (B*S)-batched cap-Bluestein
    scratches are ~280 MB each and the unrolled slot loop keeps ~16 of
    them concurrent — the round-5 native-scale OOM (17.6/15.75 GB).
    The CG operator keeps the batched _synth: it runs O(100x) more
    often and its while-loop temps don't stack across slots."""
    return jax.lax.map(lambda ab: amp._synth(plan, ab), alm_b)


def residual_seq(sys, plan, a, exclude=None):
    """compute_residual with band-sequential synthesis (same values)."""
    if exclude is not None:
        a = a.at[exclude].set(0.0)
    alm_b = amp._project_bands(sys, plan, a)
    return sys.data - synth_bands_seq(plan, alm_b)


@dataclasses.dataclass(frozen=True)
class IndexSlot:
    """Static config of one sampled spectral parameter (comp ci, slot j)."""
    ci: int
    which: int
    cfg: si.SpecIndConfig


def make_index_slots(comps: Sequence[DiffuseComponent], pcfgs=None,
                     ngrid: int = 64):
    """One IndexSlot per sampled parameter of every component with free
    parameters, with grid ranges from the param configs (COMP_*_LOW/HIGH)
    or +-50% around the defaults."""
    slots = []
    for ci, c in enumerate(comps):
        for j, t0 in enumerate(c.theta0):
            if c.sed in ("cmb", "md", "template", "line"):
                continue
            lo = hi = pm = pr = None
            lnl = "chisq"
            if pcfgs is not None:
                info = list(pcfgs[ci].indices.values())[j] \
                    if j < len(pcfgs[ci].indices) else {}
                u = 1e9 if list(pcfgs[ci].indices.keys())[j] == "nu_p" \
                    else 1.0
                lo = None if info.get("low") is None else info["low"] * u
                hi = None if info.get("high") is None else info["high"] * u
                pm = None if info.get("prior_mean") is None \
                    else info["prior_mean"] * u
                pr = info.get("prior_rms")
                pr = pr * u if pr else None
                lnl = str(info.get("lnl_type") or "chisq")
            if lo is None or hi is None:
                lo = t0 - 0.5 * abs(t0) - 0.1
                hi = t0 + 0.5 * abs(t0) + 0.1
            slots.append(IndexSlot(ci=ci, which=j, cfg=si.SpecIndConfig(
                grid_min=float(lo), grid_max=float(hi), ngrid=ngrid,
                prior_mean=pm, prior_std=pr, lnl_type=lnl)))
    return tuple(slots)


def full_gibbs_step(gcfg: gibbs_mod.GibbsConfig, comps, bps, slots,
                    base_sys: amp.AmplitudeSystem, plan,
                    state: gibbs_mod.GibbsState, thetas: jnp.ndarray,
                    key, beam_consistent: bool = False,
                    ts=None, ps=None):
    """One jitted Gibbs iteration. thetas: flat (nslot,) parameter vector
    (order = `slots`). Returns (new_state, new_thetas, sys_with_new_F).

    Jit with static (gcfg, comps, bps, slots) via functools.partial or
    static_argnums; base_sys/plan/state/thetas/key are traced pytrees.
    """
    nslot = len(slots)

    def theta_tuple(th_vec):
        out = []
        k = 0
        for ci, c in enumerate(comps):
            row = []
            for j, t0 in enumerate(c.theta0):
                s_idx = next((i for i, s in enumerate(slots)
                              if s.ci == ci and s.which == j), None)
                row.append(th_vec[s_idx] if s_idx is not None else t0)
            out.append(tuple(row))
        return out

    # 1. mixing rebuild from current thetas (updateMixmat)
    F = mixing_matrix(comps, bps, thetas=theta_tuple(thetas))
    if F.ndim == 2:
        F = F[..., None].repeat(base_sys.data.shape[1], axis=-1)
    sys = dataclasses.replace(base_sys, F=F.astype(base_sys.data.dtype))

    # 2+3. amplitude CG + binned Cl (gibbs_step); ts/ps extend the
    # solve to the joint [diffuse alms | template amps | source amps]
    # system (cr_amp2x) — the tutorial's md / radio / relquad rows
    state = dataclasses.replace(state, key=key)
    state = gibbs_mod.gibbs_step(gcfg, sys, plan, state, ts, ps)
    extra_sky = None
    if ts is not None and state.t is not None:
        from . import joint as joint_mod
        extra_sky = joint_mod._templates_fwd(ts, state.t)
    if ps is not None and state.p is not None:
        from . import joint as joint_mod
        p_sky = joint_mod._ptsrc_fwd(ps, state.p,
                                     base_sys.data.shape[-1])
        extra_sky = p_sky if extra_sky is None else extra_sky + p_sky

    # 4. spectral indices: fullsky grid inversion per slot, sequential in
    # slot order (each draw conditions on the previous ones, like the
    # reference's per-parameter loop, comm_nonlin_mod.f90:92-193)
    th = thetas
    k_ind = jax.random.fold_in(state.key, 17)
    for i, slot in enumerate(slots):
        k_ind, k = jax.random.split(k_ind)
        tt = theta_tuple(th)
        F = mixing_matrix(comps, bps, thetas=tt)
        if F.ndim == 2:
            F = F[..., None].repeat(base_sys.data.shape[1], axis=-1)
        sys_i = dataclasses.replace(sys, F=F.astype(base_sys.data.dtype))
        res = residual_seq(sys_i, plan, state.a, exclude=slot.ci)
        if extra_sky is not None:
            # md / ptsrc / template signals are "other components" for
            # the index conditional (the reference's residual subtracts
            # every other active component, comm_nonlin_mod.f90:1707+)
            res = res - extra_sky
        amp_pix = sht.alm2map(plan, state.a[slot.ci])
        # beam-consistent index lnL: project the component amplitude
        # through each band's b_l so the model matches the data's
        # resolution (static flag: the caller checks b_l deviates
        # from 1; costs B extra synths per slot when on)
        amp_band = None
        if beam_consistent:
            amp_band = jax.lax.map(
                lambda ab: sht.alm2map(plan, ab),
                state.a[slot.ci][None] * sys_i.bl[..., None])
        t_new = si.sample_specind_fullsky(
            k, comps[slot.ci], bps, slot.cfg, res, amp_pix,
            sys_i.inv_rms2, tt[slot.ci], which=slot.which,
            amp_band=amp_band)
        th = th.at[i].set(jnp.reshape(t_new, ()).astype(th.dtype))

    # final mixing with the fresh thetas (next iteration's operator)
    F = mixing_matrix(comps, bps, thetas=theta_tuple(th))
    if F.ndim == 2:
        F = F[..., None].repeat(base_sys.data.shape[1], axis=-1)
    sys = dataclasses.replace(sys, F=F.astype(base_sys.data.dtype))
    return state, th, sys
