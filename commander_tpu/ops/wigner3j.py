"""Wigner 3j symbols (Racah formula, log-factorial stabilized).

TPU-native counterpart of the reference's ``drc3jj.f`` (SLATEC), used for
beam/pixel-window mode-coupling calculations. Host-side numpy. The
alternating Racah sum is evaluated with log-scaled terms; accurate to
~1e-10 for l up to a few hundred, which covers the coupling-matrix uses.
"""
from __future__ import annotations

import numpy as np
from scipy.special import gammaln


def _lnf(n):
    return gammaln(np.asarray(n, np.float64) + 1.0)


def wigner_3j(l1, l2, l3, m1, m2, m3) -> float:
    """Single 3j symbol (l1 l2 l3; m1 m2 m3)."""
    if m1 + m2 + m3 != 0:
        return 0.0
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return 0.0
    if abs(m1) > l1 or abs(m2) > l2 or abs(m3) > l3:
        return 0.0
    # triangle coefficient (log)
    ln_delta = 0.5 * (_lnf(l1 + l2 - l3) + _lnf(l1 - l2 + l3)
                      + _lnf(-l1 + l2 + l3) - _lnf(l1 + l2 + l3 + 1))
    ln_pref = 0.5 * (_lnf(l1 + m1) + _lnf(l1 - m1) + _lnf(l2 + m2)
                     + _lnf(l2 - m2) + _lnf(l3 + m3) + _lnf(l3 - m3))
    t_min = max(0, l2 - l3 - m1, l1 - l3 + m2)
    t_max = min(l1 + l2 - l3, l1 - m1, l2 + m2)
    if t_max < t_min:
        return 0.0
    ts = np.arange(t_min, t_max + 1)
    ln_terms = -( _lnf(ts) + _lnf(l1 + l2 - l3 - ts) + _lnf(l1 - m1 - ts)
                 + _lnf(l2 + m2 - ts) + _lnf(l3 - l2 + m1 + ts)
                 + _lnf(l3 - l1 - m2 + ts))
    ln_max = ln_terms.max()
    s = np.sum((-1.0) ** ts * np.exp(ln_terms - ln_max))
    return float((-1.0) ** (l1 - l2 - m3)
                 * np.exp(ln_delta + ln_pref + ln_max) * s)


def wigner_3j_series(l2: int, l3: int, m2: int, m3: int):
    """All allowed l1 for fixed (l2, l3, m2, m3), m1 = -(m2+m3) — the
    DRC3JJ contract. Returns (l1_min, array over l1_min..l2+l3)."""
    m1 = -(m2 + m3)
    l1min = max(abs(l2 - l3), abs(m1))
    l1max = l2 + l3
    return l1min, np.array([wigner_3j(l1, l2, l3, m1, m2, m3)
                            for l1 in range(l1min, l1max + 1)])
