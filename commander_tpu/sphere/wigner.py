"""Spin-weighted associated Legendre tables via scaled Wigner-d recurrences.

This is the table builder feeding the batched SHT (the TPU-native replacement
for libsharp's on-the-fly Legendre recurrences, reference ``sharp.f90`` /
libsharp2). One code path covers every spin:

    sLambda_lm(theta) = (-1)^m sqrt((2l+1)/(4pi)) d^l_{m,-s}(theta)

so that  sY_lm(theta, phi) = sLambda_lm(theta) e^{i m phi}.
For s=0 this reduces to the scalar normalized associated Legendre function
lambda_lm with Condon-Shortley phase (the same normalization healpy uses).

Numerical strategy: the l-recurrence for d^l_{mm'} is stable upward, but the
seed d^{l0}_{mm'} ~ cos^a(theta/2) sin^b(theta/2) underflows float64 for
m ~ thousands near the poles. We therefore run the recurrence on
(mantissa, exponent-block) pairs, renormalizing whenever the mantissa leaves
[2^-450, 2^450]; values that remain below ~1e-300 after unscaling flush to a
clean 0.0 (they are physically negligible there).

Host-side numpy, vectorized over rings; tables are cast and shipped to device
once per (nside, lmax, spin).
"""
from __future__ import annotations

import functools

import numpy as np

_SCALE_EXP = 450  # renormalize when |mantissa| crosses 2^±_SCALE_EXP
_BIG = float(2.0**_SCALE_EXP)
_BIGI = float(2.0**-_SCALE_EXP)


@functools.lru_cache(maxsize=None)
def _theta_halves(nside: int):
    from .healpix import ring_geometry

    g = ring_geometry(nside)
    nh = 2 * nside  # north rings incl. equator
    th = g.theta[:nh]
    return np.cos(th / 2.0), np.sin(th / 2.0)


def wigner_d_table_fast(lmax: int, m_max: int, mp: int, cth2: np.ndarray,
                        sth2: np.ndarray) -> np.ndarray:
    """Vectorized-over-m version of wigner_d_table (identical output).

    One numpy loop over l updating all (theta, m) columns at once — the
    recurrence, seeds, and exponent-tracked rescaling all vectorize. This
    is what makes nside >= 512 plan builds tractable (the per-m Python
    loop costs minutes at lmax 1024+).
    """
    from scipy.special import gammaln

    ntheta = cth2.shape[0]
    nm = m_max + 1
    x = (cth2**2 - sth2**2)[:, None]                      # (T, 1)
    out = np.zeros((ntheta, lmax + 1, nm), dtype=np.float64)

    m = np.arange(nm, dtype=np.float64)[None, :]          # (1, nm)
    amp = abs(mp)
    l0 = np.maximum(m, amp).astype(np.int64)              # (1, nm)

    # --- seeds (log space), all m at once --------------------------------
    with np.errstate(divide="ignore"):
        lc, ls = np.log(cth2)[:, None], np.log(sth2)[:, None]
    logv = np.empty((ntheta, nm))
    sign = np.empty((ntheta, nm))
    hi = (m >= amp)                                       # seed at l0 = m
    logc_hi = 0.5 * (gammaln(2 * m + 1) - gammaln(m + mp + 1)
                     - gammaln(m - mp + 1))
    logv_hi = logc_hi + (m + mp) * lc + (m - mp) * ls
    sign_hi = np.broadcast_to((-1.0) ** (m - mp), (ntheta, nm))
    logc_lo = 0.5 * (gammaln(2 * amp + 1) - gammaln(amp + m + 1)
                     - gammaln(amp - m + 1))
    if mp > 0:
        logv_lo = logc_lo + (mp + m) * lc + (mp - m) * ls
        sign_lo = np.ones((ntheta, nm))
    else:
        logv_lo = logc_lo + (amp - m) * lc + (amp + m) * ls
        sign_lo = np.broadcast_to((-1.0) ** (amp + m), (ntheta, nm))
    logv = np.where(hi, logv_hi, logv_lo)
    sign = np.where(hi, sign_hi, sign_lo)

    lbig = np.log(_BIG)
    seed_exp = np.floor(logv / lbig).astype(np.int64)
    seed_mant = sign * np.exp(logv - seed_exp * lbig)
    bad = ~np.isfinite(logv)
    seed_mant[bad] = 0.0
    seed_exp[bad] = 0

    def emit(l, mant, exp, cols):
        v = np.where(exp == 0, mant,
                     np.where(exp < 0, mant * np.where(exp >= -1, _BIGI, 0.0),
                              mant * _BIG))
        out[:, l, :][:, cols] = v[:, cols]

    cur_mant = np.zeros((ntheta, nm))
    cur_exp = np.zeros((ntheta, nm), np.int64)
    prev_mant = np.zeros((ntheta, nm))
    prev_exp = np.zeros((ntheta, nm), np.int64)

    mf = m  # (1, nm) float
    for l in range(int(l0.min()), lmax + 1):
        starting = (l0 == l)[0]                            # (nm,) bool
        if starting.any():
            cur_mant[:, starting] = seed_mant[:, starting]
            cur_exp[:, starting] = seed_exp[:, starting]
            prev_mant[:, starting] = 0.0
            prev_exp[:, starting] = 0
        active = (l0 <= l)[0]
        emit(l, cur_mant, cur_exp, active)
        if l == lmax:
            break
        # recurrence l -> l+1 for columns with l0 <= l
        lf = float(l)
        wl1 = np.sqrt(np.maximum(((lf + 1) ** 2 - mf**2)
                                 * ((lf + 1) ** 2 - mp**2), 0.0)) / (lf + 1)
        if l == 0:
            alpha = x * np.ones((1, nm))
            beta = np.zeros((1, nm))
        else:
            wl = np.sqrt(np.maximum((lf**2 - mf**2) * (lf**2 - mp**2), 0.0)) / lf
            with np.errstate(divide="ignore", invalid="ignore"):
                alpha = (2 * lf + 1) * (x - (mf * mp) / (lf * (lf + 1))) / wl1
                beta = wl / wl1
            alpha[:, ~np.isfinite(alpha[0])] = 0.0
            beta = np.where(np.isfinite(beta), beta, 0.0)
        de = prev_exp - cur_exp
        scale_prev = np.where(de == 0, 1.0, np.where(de <= -1, _BIGI, _BIG))
        scale_prev = np.where(de <= -2, 0.0, scale_prev)
        new_mant = alpha * cur_mant - beta * prev_mant * scale_prev
        new_exp = cur_exp.copy()
        big = np.abs(new_mant) > _BIG
        if big.any():
            new_mant = np.where(big, new_mant * _BIGI, new_mant)
            cur_scaled = np.where(big, cur_mant * _BIGI, cur_mant)
            new_exp = new_exp + big
        else:
            cur_scaled = cur_mant
        # the divided cur must carry the incremented exponent (new_exp), or
        # the beta*prev term is double-scaled to ~0 on the step after a
        # rescale — a ~5% persistent error when the rescale lands near the
        # turning point where prev ~ cur (caught vs scipy at nside 512).
        # copy(): the starting-column reset mutates prev_exp in place and
        # must not clobber cur_exp through aliasing
        prev_mant, prev_exp = cur_scaled, new_exp.copy()
        cur_mant, cur_exp = new_mant, new_exp
        # freeze inactive columns so their (zero) state is untouched
        inactive = (l0 > l)[0]
        if inactive.any():
            cur_mant[:, inactive] = 0.0
            prev_mant[:, inactive] = 0.0
            cur_exp[:, inactive] = 0
            prev_exp[:, inactive] = 0
    return out


def wigner_d_table(lmax: int, m_max: int, mp: int, cth2: np.ndarray,
                   sth2: np.ndarray) -> np.ndarray:
    """d^l_{m,mp}(theta) for l=0..lmax, m=0..m_max, fixed mp, all thetas.

    Returns (ntheta, lmax+1, m_max+1) float64, zero where l < max(m,|mp|).
    Upward three-term recurrence in l (Varshalovich 4.8.4 rearranged):

      c_{l+1} d^{l+1} = (2l+1) [ l(l+1) x - m mp ] d^l  -  (l+1) c_l d^{l-1},
      c_l = l sqrt((l^2-m^2)(l^2-mp^2))   [with the (l+1)/(l) factors folded in]

    run on (mantissa, block-exponent) pairs for underflow safety.
    """
    ntheta = cth2.shape[0]
    x = cth2**2 - sth2**2  # cos(theta)
    out = np.zeros((ntheta, lmax + 1, m_max + 1), dtype=np.float64)

    from scipy.special import gammaln

    for m in range(0, m_max + 1):
        l0 = max(m, abs(mp))
        if l0 > lmax:
            break
        # seed at l = l0. Two cases:
        if m >= abs(mp):
            # d^{m}_{m,mp} = C * cos^{m+mp}(t/2) * (-sin(t/2))^{m-mp}
            logc = 0.5 * (gammaln(2 * m + 1) - gammaln(m + mp + 1)
                          - gammaln(m - mp + 1))
            with np.errstate(divide="ignore"):
                logv = logc + (m + mp) * np.log(cth2) + (m - mp) * np.log(sth2)
            sign = np.full(ntheta, (-1.0) ** (m - mp))
        else:
            # l0 = |mp| > m: seed d^{|mp|}_{m,mp} via index symmetries of
            # d^j_{j,m} = C cos^{j+m}(t/2) (-sin(t/2))^{j-m}.
            amp = abs(mp)
            logc = 0.5 * (gammaln(2 * amp + 1) - gammaln(amp + m + 1)
                          - gammaln(amp - m + 1))
            if mp > 0:
                # d^{mp}_{m,mp} = (-1)^{m-mp} d^{mp}_{mp,m}
                #              = (-1)^{m-mp} (-1)^{mp-m} C cos^{mp+m} sin^{mp-m}
                with np.errstate(divide="ignore"):
                    logv = logc + (mp + m) * np.log(cth2) + (mp - m) * np.log(sth2)
                sign = np.ones(ntheta)
            else:
                # d^{amp}_{m,-amp} = d^{amp}_{amp,-m}
                #                  = C cos^{amp-m} (-sin)^{amp+m}
                with np.errstate(divide="ignore"):
                    logv = logc + (amp - m) * np.log(cth2) + (amp + m) * np.log(sth2)
                sign = np.full(ntheta, (-1.0) ** (amp + m))

        # mantissa/exponent representation: val = mant * _BIG^exp
        exp = np.floor(logv / np.log(_BIG)).astype(np.int64)
        mant = sign * np.exp(logv - exp * np.log(_BIG))
        mant = np.where(np.isfinite(mant), mant, 0.0)
        bad = ~np.isfinite(logv)
        mant[bad] = 0.0
        exp[bad] = 0

        def emit(l, mant, exp):
            v = np.where(exp == 0, mant,
                         np.where(exp < 0,
                                  mant * np.power(_BIGI, np.minimum(-exp, 3)),
                                  mant * np.power(_BIG, np.minimum(exp, 3))))
            v = np.where(exp < -1, 0.0, v)  # < ~1e-270: flush
            out[:, l, m] = v

        emit(l0, mant, exp)
        if l0 == lmax:
            continue

        # recurrence l -> l+1:
        # d^{l+1} = (A_l x + B_l) d^l + C_l d^{l-1}
        # with standard coefficients:
        #  A_l = (2l+1) l (l+1) / ( (l+1) ... ) — use the clean form:
        #  let u_l = sqrt((l^2-m^2)(l^2-mp^2)) / l   (for l>=1)
        #  d^{l+1} = [ (2l+1)(x - m*mp/(l(l+1))) d^l - u_l*(l+1)/l... ]
        # Precisely (Kostelec & Rockmore / libsharp):
        #   w_{l+1} d^{l+1} = (2l+1)[x - m mp / (l(l+1))] d^l - w'_l d^{l-1}
        #   w_{l+1} = sqrt(((l+1)^2-m^2)((l+1)^2-mp^2)) / (l+1)
        #   w'_l    = sqrt((l^2-m^2)(l^2-mp^2)) / l
        prev_mant = np.zeros(ntheta)
        prev_exp = np.zeros(ntheta, dtype=np.int64)
        cur_mant, cur_exp = mant, exp
        for l in range(l0, lmax):
            if l == 0:
                # d^1_{00} = x (m=mp=0 only reaches here)
                new_mant = x * cur_mant
                new_exp = cur_exp.copy()
            else:
                wl1 = np.sqrt(((l + 1.0) ** 2 - m**2) * ((l + 1.0) ** 2 - mp**2)) / (l + 1.0)
                wl = np.sqrt((float(l) ** 2 - m**2) * (float(l) ** 2 - mp**2)) / float(l)
                alpha = (2 * l + 1.0) * (x - (m * mp) / (l * (l + 1.0))) / wl1
                beta = wl / wl1
                # align exponents: d^{l-1} term scaled by _BIG^(prev_exp-cur_exp)
                de = prev_exp - cur_exp
                scale_prev = np.where(de == 0, 1.0,
                                      np.where(de <= -1, _BIGI, _BIG)).astype(np.float64)
                scale_prev = np.where(de <= -2, 0.0, scale_prev)
                # de >= +1 shouldn't happen (|d| <= 1 overall & upward growth)
                new_mant = alpha * cur_mant - beta * prev_mant * scale_prev
                new_exp = cur_exp.copy()
            # renormalize
            big = np.abs(new_mant) > _BIG
            if np.any(big):
                new_mant = np.where(big, new_mant * _BIGI, new_mant)
                cur_scaled = np.where(big, cur_mant * _BIGI, cur_mant)
                new_exp = new_exp + big.astype(np.int64)
            else:
                cur_scaled = cur_mant
            # see wigner_d_table_fast: prev must carry the incremented
            # exponent after a rescale (copy: no aliasing with cur_exp)
            prev_mant, prev_exp = cur_scaled, new_exp.copy()
            cur_mant, cur_exp = new_mant, new_exp
            emit(l + 1, cur_mant, cur_exp)
    return out


@functools.lru_cache(maxsize=None)
def spin_lambda_north(nside: int, lmax: int, spin: int, mmax: int | None = None):
    """sLambda_lm on the northern rings (incl. equator) of an nside grid.

    Returns (lam_pos, lam_neg):
      lam_pos[r, l, m] = sqrt((2l+1)/4pi) d^l_{m,-s}(theta_r)
      lam_neg[r, l, m] = sqrt((2l+1)/4pi) d^l_{m, s}(theta_r)
    With our d-convention this matches scipy/healpy for s=0:
      Y_lm(theta, phi) = lam_pos[.., l, m] e^{i m phi}  (CS phase included).
    For spin 0 the two are identical and lam_neg is lam_pos (same object).
    Shapes (2*nside, lmax+1, mmax+1) float64. Southern rings follow from
      d^l_{m,mp}(pi - theta) = (-1)^{l-mp} d^l_{m,-mp}(theta)  =>
      sLambda_lm(pi-theta) = (-1)^{l} * [(-1)^{...}] — handled in sht.py.
    """
    if mmax is None:
        mmax = lmax
    cth2, sth2 = _theta_halves(nside)
    norm = np.sqrt((2.0 * np.arange(lmax + 1) + 1.0) / (4.0 * np.pi))
    pref = norm[None, :, None]
    d_pos = wigner_d_table_fast(lmax, mmax, -spin, cth2, sth2)
    lam_pos = pref * d_pos
    if spin == 0:
        return lam_pos, lam_pos
    d_neg = wigner_d_table_fast(lmax, mmax, spin, cth2, sth2)
    lam_neg = pref * d_neg
    return lam_pos, lam_neg
