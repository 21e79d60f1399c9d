"""Convolutional codes: K=7 and K=9 rate-1/2 encoders with Viterbi
decoding, plus the punctured rate variants.

Reference analog (studied, not copied): reference src/fec/src/fec_conv.c
(encode shift-register loop :98-115; decode delegates to external libfec
Viterbi), puncture matrices fec_conv_pmatrix.c:26-98.  The reference
cannot run these without libfec; we implement them natively.

Polynomials are the standard NASA/CCSDS generators used by libfec:
K=7: (0x6d, 0x4f); K=9: (0x1af, 0x11d).  Encoder convention matches the
reference: sr = (sr << 1) | bit; output bit r = parity(sr & poly[r]),
MSB-first packing, rate-1/2 base.

TPU design: Viterbi is a lax.scan over time of a vectorized
add-compare-select across all 2^(K-1) states (SURVEY.md §7 hard part #3)
with traceback via stored decisions.  Works on hard bits or soft LLRs
(branch metrics = Hamming or negative-correlation).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .block import unpack_bits, pack_bits

__all__ = ["CONV_SCHEMES", "conv_get_enc_msg_length", "conv_encode",
           "conv_decode", "PUNCTURE_MATRICES"]

_POLYS = {
    "v27": (7, (0x6D, 0x4F)),
    "v29": (9, (0x1AF, 0x11D)),
}

# puncture matrices (reference fec_conv_pmatrix.c:26-98), row-major
# [rate_num rows of output streams x period columns]
PUNCTURE_MATRICES = {
    "p23": [[1, 1], [1, 0]],
    "p34": [[1, 1, 0], [1, 0, 1]],
    "p45": [[1, 1, 1, 1], [1, 0, 0, 0]],
    "p56": [[1, 1, 0, 1, 0], [1, 0, 1, 0, 1]],
    "p67": [[1, 1, 1, 0, 1, 0], [1, 0, 0, 1, 0, 1]],
    "p78": [[1, 1, 1, 1, 0, 1, 0], [1, 0, 0, 0, 1, 0, 1]],
}
_P29 = {  # K=9 variants differ (fec_conv_pmatrix.c:63-98)
    "p23": [[1, 1], [1, 0]],
    "p34": [[1, 1, 1], [1, 0, 0]],
    "p45": [[1, 1, 0, 1], [1, 0, 1, 0]],
    "p56": [[1, 0, 1, 1, 0], [1, 1, 0, 0, 1]],
    "p67": [[1, 1, 0, 1, 1, 0], [1, 0, 1, 0, 0, 1]],
    "p78": [[1, 1, 0, 1, 0, 1, 1], [1, 0, 1, 0, 1, 0, 0]],
}

CONV_SCHEMES = tuple(
    [b for b in _POLYS] +
    [f"{b}{p}" for b in _POLYS for p in PUNCTURE_MATRICES])


def _parse(scheme: str):
    scheme = scheme.lower()
    base = scheme[:3]
    if base not in _POLYS:
        raise ValueError(f"unknown convolutional scheme {scheme!r}")
    K, polys = _POLYS[base]
    pmat = None
    if len(scheme) > 3:
        tag = scheme[3:]
        table = _P29 if base == "v29" else PUNCTURE_MATRICES
        if tag not in table:
            raise ValueError(f"unknown puncturing {tag!r}")
        pmat = np.asarray(table[tag], np.uint8)
    return K, polys, pmat


def _parity_bits(v: np.ndarray) -> np.ndarray:
    """Bitwise parity of each element (vectorized popcount & 1)."""
    v = v.astype(np.uint32)
    v ^= v >> 16
    v ^= v >> 8
    v ^= v >> 4
    v ^= v >> 2
    v ^= v >> 1
    return (v & 1).astype(np.uint8)


def conv_get_enc_msg_length(scheme: str, dec_len: int) -> int:
    """Encoded bytes (reference fec.c: rate-1/2 with K-1 flush bits;
    punctured variants scale by the puncture rate)."""
    K, _, pmat = _parse(scheme)
    nbits_in = 8 * dec_len + K  # payload + flush (reference uses +K)
    nbits_out = 2 * nbits_in
    if pmat is not None:
        period = pmat.shape[1]
        kept = int(pmat.sum())
        nsym = -(-nbits_out // (2 * period))
        # exact: count kept bits over the punctured stream
        total = 0
        full = nbits_in // period
        total = full * kept
        rem = nbits_in % period
        if rem:
            total += int(pmat[:, :rem].sum())
        nbits_out = total
    return -(-nbits_out // 8)


def conv_encode(scheme: str, msg) -> np.ndarray:
    """Encode a byte array; returns encoded bytes (MSB-first packing)."""
    K, polys, pmat = _parse(scheme)
    bits = unpack_bits(np.asarray(msg, np.uint8))
    bits = np.concatenate([bits, np.zeros(K, np.uint8)])  # flush
    n = len(bits)
    # shift register history via sliding window of the last K bits
    padded = np.concatenate([np.zeros(K - 1, np.uint8), bits])
    win = np.lib.stride_tricks.sliding_window_view(padded, K)  # [n, K]
    weights = 1 << np.arange(K - 1, -1, -1)
    sr = (win * weights).sum(axis=1).astype(np.uint32)          # [n]
    outs = [ _parity_bits(sr & p) for p in polys ]              # r x [n]
    enc = np.stack(outs, axis=1)                                # [n, 2]
    if pmat is not None:
        period = pmat.shape[1]
        keep = pmat.T  # [period, 2] column-major in time
        mask = np.resize(keep, (n, 2) if n % period == 0 else
                         ((-(-n // period)) * period, 2))[:n]
        enc = enc.reshape(-1)[mask.reshape(-1).astype(bool)]
    else:
        enc = enc.reshape(-1)
    return pack_bits(enc)


@lru_cache(maxsize=None)
def _trellis(K: int, polys):
    """Branch output bits per (state, input): state = previous K-1 bits."""
    ns = 1 << (K - 1)
    s = np.arange(ns, dtype=np.uint32)
    out = np.zeros((ns, 2, len(polys)), np.uint8)
    nxt = np.zeros((ns, 2), np.int32)
    for b in (0, 1):
        sr = (s << 1) | b  # K-bit register
        for r, p in enumerate(polys):
            out[:, b, r] = _parity_bits(sr & p)
        nxt[:, b] = (sr & (ns - 1)).astype(np.int32)
    return out, nxt


def conv_decode(scheme: str, enc, dec_len: int, soft=None) -> np.ndarray:
    """Viterbi decode to dec_len bytes.

    soft: optional float array of LLR-like metrics per encoded bit
    (positive = bit 1); when given, `enc` is ignored for metric purposes.
    Punctured bits are depunctured as erasures (zero metric).
    """
    K, polys, pmat = _parse(scheme)
    r = len(polys)
    nbits_in = 8 * dec_len + K
    if soft is None:
        ebits = unpack_bits(np.asarray(enc, np.uint8))
        metrics = 2.0 * ebits.astype(np.float32) - 1.0  # ±1, + = bit 1
    else:
        metrics = np.asarray(soft, np.float32)
    # depuncture into [nbits_in, r] with zeros at punctured positions
    branch_obs = np.zeros((nbits_in, r), np.float32)
    if pmat is None:
        need = nbits_in * r
        m = np.zeros(need, np.float32)
        m[: min(need, len(metrics))] = metrics[:need]
        branch_obs = m.reshape(nbits_in, r)
    else:
        period = pmat.shape[1]
        keep = np.resize(pmat.T, ((-(-nbits_in // period)) * period, r)
                         )[:nbits_in].astype(bool)
        flat = np.zeros(nbits_in * r, np.float32)
        sel = keep.reshape(-1)
        k = min(int(sel.sum()), len(metrics))
        idx = np.nonzero(sel)[0][:k]
        flat[idx] = metrics[:k]
        branch_obs = flat.reshape(nbits_in, r)

    out, nxt = _trellis(K, tuple(polys))
    ns = out.shape[0]
    # branch metric: correlation of observed ±1 metrics with expected bits
    exp = 2.0 * out.astype(np.float32) - 1.0  # [ns, 2, r]
    obs = jnp.asarray(branch_obs)             # [T, r]
    exp_j = jnp.asarray(exp)
    nxt_j = jnp.asarray(nxt)

    NEG = -1e9

    def step(pm, ob):
        # pm: [ns] path metrics; ob: [r]
        bm = jnp.einsum("sbr,r->sb", exp_j, ob)      # [ns, 2]
        cand = pm[:, None] + bm                      # [ns, 2]
        # scatter-max into next states
        flat_next = nxt_j.reshape(-1)                # [ns*2]
        flat_cand = cand.reshape(-1)
        new_pm = jnp.full((ns,), NEG, jnp.float32).at[flat_next].max(flat_cand)
        # decision: which (prev_state, bit) won for each next state
        is_winner = flat_cand == new_pm[flat_next]
        # index of winning flat branch per next state (first winner)
        order = jnp.arange(ns * 2)
        win_idx = jnp.full((ns,), ns * 2, jnp.int32).at[flat_next].min(
            jnp.where(is_winner, order, ns * 2).astype(jnp.int32))
        return new_pm, win_idx

    pm0 = jnp.full((ns,), NEG, jnp.float32).at[0].set(0.0)
    pm, decisions = lax.scan(step, pm0, obs)  # decisions: [T, ns]

    # traceback from state 0 (flushed)
    def back(state, dec_t):
        flat = dec_t[state]
        prev_state = flat // 2
        bit = flat % 2
        return prev_state, bit

    state0 = jnp.asarray(0, jnp.int32)
    _, bits_rev = lax.scan(back, state0, decisions, reverse=True)
    bits = np.asarray(bits_rev).astype(np.uint8)
    payload = bits[: 8 * dec_len]
    return pack_bits(payload)[:dec_len]
