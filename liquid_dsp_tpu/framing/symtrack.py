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

__all__ = ["SymtrackResult", "symtrack", "symtrack_stream", "Symtrack"]


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


# ---------------------------------------------------------------------------
# Streaming symbol tracker: persistent Proc + object wrapper
# ---------------------------------------------------------------------------
#
# The reference symtrack_cccf is a PERSISTENT object: state (AGC gain,
# timing phase, equalizer weights, carrier phase) survives across
# execute() calls indefinitely (reference src/framing/src/symtrack.c:
# 42-124).  The streaming Proc below chains every stage's carry; the
# variable-rate boundary after symsync is handled by GATED updates (the
# fused PLL+LMS scan is a no-op on invalid slots), so the whole tracker
# is one jittable block apply with static shapes — block-by-block
# output is bit-identical to the one-shot symtrack() on the same
# capture.

def symtrack_stream(ftype: str = "arkaiser", k: int = 2, m: int = 7,
                    beta: float = 0.3, ms: str = "qpsk",
                    eq_len: int = 13, eq_mu: float = 0.05,
                    pll_bw: float = 0.05, agc_bw: float = 0.02,
                    sync_bw: float = 0.02,
                    name: str = "symtrack_stream"):
    """Streaming symbol tracker Proc.

    apply(params, carry, x[..., T]) -> ((syms, decisions, valid), carry')
    where the outputs are at the symsync slot rate with a validity mask
    (compact with the mask).  All stage states persist in the carry.
    """
    from ..core import Proc, scan_unroll
    ag = agc(bandwidth=agc_bw)
    ss = symsync(ftype, k, m, beta, bw=sync_bw)
    table = np.asarray(constellation(ms)).astype(np.complex64)
    tab_re = table.real.copy()
    tab_im = table.imag.copy()
    alpha = float(pll_bw)
    beta2 = 0.5 * float(pll_bw) ** 2
    L = int(eq_len)
    mu = float(eq_mu)
    w0 = eqlms_lowpass_weights(L).astype(np.complex64)
    w0_re, w0_im = w0.real.copy(), w0.imag.copy()

    def init(batch_shape=(), dtype=jnp.complex64):
        w = lax.complex(jnp.asarray(w0_re), jnp.asarray(w0_im))
        return {"agc": ag.init(batch_shape, dtype),
                "ss": ss.init(batch_shape, dtype),
                "theta": jnp.zeros(batch_shape, jnp.float32),
                "dtheta": jnp.zeros(batch_shape, jnp.float32),
                # x2_sum/n primed at L: window treated as already full
                # (reference symtrack.c:122 eqlms_create_lowpass init)
                "eq_w": jnp.broadcast_to(w, batch_shape + (L,)).astype(dtype),
                "eq_buf": jnp.zeros(batch_shape + (L,), dtype),
                "eq_x2": jnp.full(batch_shape, float(L), jnp.float32),
                "eq_n": jnp.full(batch_shape, L, jnp.int32)}

    def apply(params, carry, x):
        y, agc_c = ag.apply(ag.params, carry["agc"], x)
        (sy, sv), ss_c = ss.apply(ss.params, carry["ss"], y)
        tab = lax.complex(jnp.asarray(tab_re), jnp.asarray(tab_im))
        iota = jnp.arange(tab.shape[0], dtype=jnp.int32)

        def slice_pt(idx):
            """Nearest constellation point WITHOUT a traced-index gather
            (CLAUDE.md: gathers serialize on TPU): one-hot reduce —
            exact, since each product is value*1 or value*0."""
            oh = (idx[..., None] == iota).astype(jnp.float32)
            return jnp.sum(oh * tab, axis=-1)

        def step(c, inp):
            s, valid = inp
            vm = valid
            # carrier PLL (2nd-order loop on the slicer phase error)
            vmix = s * jnp.exp(-1j * c["theta"]).astype(s.dtype)
            idx = jnp.argmin(jnp.abs(vmix[..., None] - tab) ** 2, axis=-1)
            e = jnp.angle(vmix * jnp.conj(slice_pt(idx)))
            dtheta_n = c["dtheta"] + beta2 * e
            theta_n = c["theta"] + dtheta_n + alpha * e
            # decision-directed normalized LMS on the mixed symbol
            buf = jnp.concatenate([c["eq_buf"][..., 1:], vmix[..., None]],
                                  axis=-1)
            x2 = (vmix * jnp.conj(vmix)).real
            x2_sum = c["eq_x2"] + x2 - (c["eq_buf"][..., 0] *
                                        jnp.conj(c["eq_buf"][..., 0])).real
            yeq = jnp.sum(jnp.conj(c["eq_w"]) * buf, axis=-1)
            dec = jnp.argmin(jnp.abs(yeq[..., None] - tab) ** 2, axis=-1)
            err = slice_pt(dec) - yeq
            n = c["eq_n"] + 1
            gate = (n >= L).astype(jnp.float32)
            w = c["eq_w"] + (gate * mu)[..., None] * jnp.conj(err)[..., None] \
                * buf / jnp.maximum(x2_sum, 1e-12)[..., None]
            vme = vm[..., None]
            new = {"theta": jnp.where(vm, theta_n, c["theta"]),
                   "dtheta": jnp.where(vm, dtheta_n, c["dtheta"]),
                   "eq_w": jnp.where(vme, w, c["eq_w"]),
                   "eq_buf": jnp.where(vme, buf, c["eq_buf"]),
                   "eq_x2": jnp.where(vm, x2_sum, c["eq_x2"]),
                   "eq_n": jnp.where(vm, n, c["eq_n"])}
            return new, (yeq, dec)

        pll_c = {kk: carry[kk] for kk in
                 ("theta", "dtheta", "eq_w", "eq_buf", "eq_x2", "eq_n")}
        st = jnp.moveaxis(sy, -1, 0)
        vt = jnp.moveaxis(sv, -1, 0)
        pll_c, (yt, dt) = lax.scan(step, pll_c, (st, vt), unroll=scan_unroll(8))
        out = (jnp.moveaxis(yt, 0, -1), jnp.moveaxis(dt, 0, -1), sv)
        return out, {"agc": agc_c, "ss": ss_c, **pll_c}

    return Proc(params=(), init=init, apply=apply, rate=(1, k), name=name)


class Symtrack:
    """Persistent symbol-tracker object (the reference symtrack_cccf
    create/execute/reset contract).  Feed arbitrary-length sample
    arrays; returns (symbols, decisions) recovered so far this call.
    State survives across calls; reset() re-arms everything."""

    def __init__(self, ftype: str = "arkaiser", k: int = 2, m: int = 7,
                 beta: float = 0.3, ms: str = "qpsk",
                 eq_len: int = 13, eq_mu: float = 0.05,
                 pll_bw: float = 0.05, block_len: int = 4096):
        self._proc = symtrack_stream(ftype, k, m, beta, ms, eq_len, eq_mu,
                                     pll_bw)
        self._k = k
        self.block_len = int(block_len) // k * k
        self._jit = jax.jit(self._proc.apply)
        self.reset()

    def reset(self):
        self._carry = self._proc.init()
        self._pending = np.zeros(0, np.complex64)

    def execute(self, x):
        self._pending = np.concatenate(
            [self._pending, np.asarray(x, np.complex64)])
        syms, decs = [], []
        while len(self._pending) >= self.block_len:
            blk = self._pending[:self.block_len]
            self._pending = self._pending[self.block_len:]
            (sy, dec, sv), self._carry = self._jit(
                (), self._carry, jnp.asarray(blk))
            sv = np.asarray(sv)
            syms.append(np.asarray(sy)[sv])
            decs.append(np.asarray(dec)[sv])
        if syms:
            return (np.concatenate(syms), np.concatenate(decs))
        return (np.zeros(0, np.complex64), np.zeros(0, np.int64))
