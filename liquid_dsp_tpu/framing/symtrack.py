"""symtrack: streaming symbol tracker (AGC -> symbol sync -> LMS EQ ->
carrier PLL -> demod).

Reference analog (studied, not copied): symtrack_cccf
(reference src/framing/src/symtrack.c:42-124): agc_crcf -> symsync (2
samples/symbol rnyquist) -> eqlms_cccf -> nco PLL driven by the modem's
demod phase error -> symbol decisions.

TPU design: AGC and symbol sync are the existing scan-based Procs; the
carrier PLL runs as one scan over recovered symbols; the equalizer
update is decision-directed LMS.  Variable-rate boundaries are compacted
between stages (host-side), matching the burst/streaming use case.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.agc import agc
from ..ops.symsync import symsync
from ..ops.equalize import eqlms_lowpass_weights, eqlms_run
from ..modem import constellation

__all__ = ["SymtrackResult", "symtrack"]


class SymtrackResult(NamedTuple):
    symbols: np.ndarray    # recovered (equalized, derotated) symbols
    decisions: np.ndarray  # hard decisions (indices)


def _pll_scan(table, syms, bw: float):
    """Carrier tracking loop over symbols: mix, slice, phase-error
    feedback with a 2nd-order loop (reference symtrack internal PLL)."""
    alpha = bw
    beta = 0.5 * bw * bw
    tab = jnp.asarray(table)

    def step(c, s):
        theta, dtheta = c
        v = s * jnp.exp(-1j * theta)
        d2 = jnp.abs(v - tab) ** 2
        idx = jnp.argmin(d2)
        ref = tab[idx]
        e = jnp.angle(v * jnp.conj(ref))
        dtheta = dtheta + beta * e
        theta = theta + dtheta + alpha * e
        return (theta, dtheta), (v, idx)

    (_, _), (v, idx) = lax.scan(
        step, (jnp.float32(0.0), jnp.float32(0.0)), jnp.asarray(syms))
    return np.asarray(v), np.asarray(idx)


def symtrack(x, ftype: str = "arkaiser", k: int = 2, m: int = 7,
             beta: float = 0.3, ms: str = "qpsk",
             eq_len: int = 13, eq_mu: float = 0.05,
             pll_bw: float = 0.05, bandwidth: float = 0.9) -> SymtrackResult:
    """Track a continuous stream of modulated samples and return the
    recovered symbols (reference symtrack_cccf_execute_block)."""
    x = jnp.asarray(np.asarray(x, np.complex64))
    # 1. AGC
    ag = agc(bandwidth=0.02)
    y, _ = ag(x, batch_shape=())
    # 2. symbol timing recovery
    ss = symsync(ftype, k, m, beta, bw=0.02)
    (sy, sv), _ = ss(y, batch_shape=())
    syms = np.asarray(sy)[np.asarray(sv)]
    if len(syms) == 0:
        return SymtrackResult(np.zeros(0, np.complex64),
                              np.zeros(0, np.int64))
    # 3. carrier tracking PLL
    table = constellation(ms)
    v, _ = _pll_scan(table, syms.astype(np.complex64), pll_bw)
    # 4. decision-directed LMS equalizer
    L = eq_len
    # x2_sum primed at L (unit-power symbols post-AGC) so the normalized
    # step size doesn't blow up while the window fills
    # lowpass-initialized equalizer (reference symtrack.c:122
    # eqlms_create_lowpass(eq_len, 0.45))
    carry = {"w": jnp.asarray(eqlms_lowpass_weights(L), jnp.complex64),
             "buf": jnp.zeros(L, jnp.complex64),
             "x2_sum": jnp.float32(L),
             "n": jnp.int32(L)}  # window treated as already full
    tab = jnp.asarray(table)

    def slicer(yv):
        # nearest constellation point (scalar or batched)
        return tab[jnp.argmin(jnp.abs(yv[..., None] - tab) ** 2, axis=-1)]

    veq, _ = eqlms_run(None, eq_mu, carry, jnp.asarray(v), slicer=slicer)
    veq = np.asarray(veq)
    from ..modem import demodulate
    dec = np.asarray(demodulate(table, jnp.asarray(veq)))
    return SymtrackResult(veq, dec)
