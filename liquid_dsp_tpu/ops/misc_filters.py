"""Remaining filter components: Farrow fractional delay, IIR
decimator/interpolator, linear prediction.

Reference analogs (studied, not copied):
  * firfarrow — src/filter/src/firfarrow.c:45+ (windowed-sinc fractional
    delay with polynomial-in-mu coefficients; we evaluate taps directly
    for a given mu, which is the same filter the polynomial fit
    approximates).
  * iirdecim/iirinterp — src/filter/src/iirdecim.c / iirinterp.c (IIR
    filter + down/up-sampling).
  * lpc — src/filter/src/lpc.c (Levinson-Durbin recursion over the
    autocorrelation).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import Proc
from ..design.windows import kaiser, kaiser_beta_as
from .iir import iirfilt
from .fir import firfilt

__all__ = ["firfarrow_taps", "firfarrow", "iirdecim", "iirinterp", "lpc",
           "autocorr_estimate"]


def firfarrow_taps(h_len: int, mu: float, fc: float = 0.45,
                   as_db: float = 60.0, npoly: int = 5) -> np.ndarray:
    """Fractional-delay filter taps, replicating the reference Farrow
    structure exactly (reference firfarrow.c genpoly/set_delay): each tap
    is a degree-npoly polynomial in mu least-squares fitted to windowed
    sinc samples at npoly+1 offsets, evaluated at -mu with the highest
    coefficient dropped (the reference's poly_val receives k=Q), then
    normalized by the DC response at mu=0."""
    if not (-1.0 <= mu <= 1.0):
        raise ValueError("fractional delay mu must be in [-1, 1]")
    from ..design.windows import kaiser_beta_as
    from ..design.special import besseli0

    Q = npoly
    beta = kaiser_beta_as(as_db)
    mu_vect = (np.arange(Q + 1) - Q) / Q + 0.5

    def kaiser_shift(n, N, mu_):
        t = n - (N - 1) / 2.0 + mu_
        r = 2.0 * t / N
        return besseli0(beta * np.sqrt(np.maximum(1 - r * r, 0.0))) / \
            besseli0(beta)

    P = np.zeros((h_len, Q + 1))
    for i in range(h_len):
        x = i - (h_len - 1) / 2.0
        hp = np.sinc(2.0 * fc * (x + mu_vect)) * \
            np.asarray([kaiser_shift(i, h_len, mv) for mv in mu_vect])
        P[i] = np.polynomial.polynomial.polyfit(mu_vect, hp, Q)

    def taps_at(mu_):
        # reference poly_val uses only the first Q coefficients
        powers = (-mu_) ** np.arange(Q)
        return P[:, :Q] @ powers

    gamma = 1.0 / np.sum(taps_at(0.0))
    return (gamma * taps_at(mu)).astype(np.float32)


def firfarrow(h_len: int = 19, mu: float = 0.0, fc: float = 0.45,
              as_db: float = 60.0, name: str = "firfarrow") -> Proc:
    """Fractional-delay FIR Proc (static mu per instance)."""
    return firfilt(firfarrow_taps(h_len, mu, fc, as_db), name=name)


def iirdecim(m: int, b=None, a=None, order: int = 4,
             name: str = "iirdecim") -> Proc:
    """IIR anti-alias filter then M:1 downsample (reference iirdecim.c).

    With b/a omitted, designs the reference default prototype: SOS
    butterworth lowpass of the given order at fc = 0.5/m
    (iirdecim.c create_default)."""
    if b is None:
        from ..design.iirdes import iirdes_sos
        from .iir import iirfilt_sos
        B, A = iirdes_sos("butter", order, 0.5 / m, ap_db=0.1, as_db=60.0)
        f = iirfilt_sos(B, A)
    else:
        f = iirfilt(b, a)

    def init(batch_shape=(), dtype=jnp.complex64):
        return f.init(batch_shape=batch_shape, dtype=dtype)

    def apply(params, carry, x):
        T = x.shape[-1]
        if T % m:
            raise ValueError(f"iirdecim block length {T} not a multiple "
                             f"of {m}")
        y, c = f.apply(params, carry, x)
        return y[..., ::m], c

    return Proc(params=f.params, init=init, apply=apply, rate=(1, m),
                name=name)


def iirinterp(m: int, b=None, a=None, order: int = 4,
              name: str = "iirinterp") -> Proc:
    """1:M upsample then IIR image-reject filter (reference iirinterp.c,
    reference applies no gain compensation).  With b/a omitted, designs
    the reference default SOS butterworth prototype at fc = 0.5/m."""
    if b is None:
        from ..design.iirdes import iirdes_sos
        from .iir import iirfilt_sos
        B, A = iirdes_sos("butter", order, 0.5 / m, ap_db=0.1, as_db=60.0)
        f = iirfilt_sos(B, A)
    else:
        f = iirfilt(b, a)

    def init(batch_shape=(), dtype=jnp.complex64):
        return f.init(batch_shape=batch_shape, dtype=dtype)

    def apply(params, carry, x):
        T = x.shape[-1]
        up = jnp.zeros(x.shape[:-1] + (T * m,), x.dtype)
        up = up.at[..., ::m].set(x)
        # no gain compensation: the reference zero-stuffs and filters
        # without scaling (iirinterp.c execute)
        y, c = f.apply(params, carry, up)
        return y, c

    return Proc(params=f.params, init=init, apply=apply, rate=(m, 1),
                name=name)


def autocorr_estimate(x, p: int) -> np.ndarray:
    """Biased autocorrelation r[0..p]."""
    x = np.asarray(x)
    n = len(x)
    return np.asarray([np.sum(x[k:] * np.conj(x[: n - k])) / n
                       for k in range(p + 1)])


def lpc(x, p: int, return_reflection: bool = False):
    """Linear prediction via Levinson-Durbin (reference lpc.c
    liquid_lpc/levinson): returns (a, e) with a[0] = 1 and e the
    prediction error variance per order [p+1] computed from the
    UNNORMALIZED autocorrelation, matching the reference outputs.
    return_reflection=True returns the reflection coefficients instead
    of the error variances."""
    x = np.asarray(x)
    n = len(x)
    # reference liquid_lpc: unnormalized autocorrelation (lpc.c:59-66)
    r = np.asarray([np.sum(x[k:] * np.conj(x[: n - k]))
                    for k in range(p + 1)]).real
    a = np.zeros(p + 1)
    g = np.zeros(p)
    e = np.zeros(p + 1)
    a[0] = 1.0
    err = r[0]
    e[0] = err
    if err <= 0:
        raise ValueError("lpc: signal has no energy")
    for i in range(1, p + 1):
        acc = r[i] + np.dot(a[1:i], r[1:i][::-1])
        k = -acc / err
        g[i - 1] = k
        # Levinson update: a'[j] = a[j] + k*a[i-j]
        a_new = a.copy()
        for j in range(1, i + 1):
            a_new[j] = a[j] + k * a[i - j]
        a = a_new
        err *= (1.0 - k * k)
        e[i] = err
    return (a, g) if return_reflection else (a, e)
