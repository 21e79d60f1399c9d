"""OFDM frame PHY: generator and block-native synchronizer.

Reference analogs (studied, not copied):
  * ofdmframe common — src/multichannel/src/ofdmframe.common.c:41-224:
    default subcarrier allocation (guards M/10, pilots every 4 or 8
    bins), S0 sequence (even data/pilot bins, +-1 from the default
    m-sequence, nextpow2(M) clipped to [4,8]), S1 (all enabled bins,
    order m+1), time-domain forms scaled by 1/sqrt(M_Sx).
  * ofdmframegen — src/multichannel/src/ofdmframegen.c:84-345: per
    symbol: pilots +-1 from msequence(8), data scaled by
    1/sqrt(M_pilot+M_data), centered-bin mapping k=(i+M/2)%M, IFFT,
    cyclic prefix + raised-cosine taper overlap.
  * ofdmframesync — src/multichannel/src/ofdmframesync.c:241-1100:
    seek-PLCP (S0 autocorrelation) -> carrier/timing estimation from
    S0/S1 -> per-subcarrier gain EQ -> pilot-tracked payload demod.

TPU design: the receiver is a block pipeline — the Schmidl-Cox S0
autocorrelation, S1 cross-correlation, channel estimate, and the
payload's CP-strip + batched FFT + EQ + pilot phase tracking are all
whole-capture vectorized operations (no per-sample state machine).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..utils.sequence import MSequence

__all__ = ["OFDMParams", "ofdm_params", "ofdm_generate_frame",
           "ofdm_frame_sync", "OFDMSyncResult"]

SCTYPE_NULL, SCTYPE_PILOT, SCTYPE_DATA = 0, 1, 2


class OFDMParams(NamedTuple):
    M: int
    cp_len: int
    taper_len: int
    p: np.ndarray          # subcarrier types [M]
    S0: np.ndarray         # freq-domain S0 [M]
    s0: np.ndarray         # time-domain S0 [M]
    S1: np.ndarray
    s1: np.ndarray
    M_null: int
    M_pilot: int
    M_data: int


def default_sctype(M: int) -> np.ndarray:
    """Reference ofdmframe_init_default_sctype (ofdmframe.common.c:176)."""
    p = np.zeros(M, np.uint8)
    M2 = M // 2
    G = max(M // 10, 2)
    P = 8 if M > 34 else 4
    P2 = P // 2
    for i in range(1, M2 - G):
        t = SCTYPE_PILOT if ((i + P2) % P) == 0 else SCTYPE_DATA
        p[i] = t
        p[M - i] = t
    return p


def _init_S(p: np.ndarray, M: int, order: int, even_only: bool):
    ms = MSequence(order)
    S = np.zeros(M, np.complex64)
    count = 0
    for i in range(M):
        s = ms.generate_symbol(3) & 0x01
        if p[i] == SCTYPE_NULL:
            continue
        if even_only and (i % 2) != 0:
            continue
        S[i] = 1.0 if s else -1.0
        count += 1
    if count == 0:
        raise ValueError("ofdm frame: no subcarriers enabled; check "
                         "allocation")
    # time domain: unnormalized inverse FFT scaled by 1/sqrt(count)
    s_t = np.fft.ifft(S) * M / np.sqrt(count)
    return S, s_t.astype(np.complex64), count


def ofdm_params(M: int = 64, cp_len: int = 16,
                taper_len: int = 0, p=None) -> OFDMParams:
    if p is None:
        p = default_sctype(M)
    p = np.asarray(p, np.uint8)
    m = int(np.ceil(np.log2(M)))
    m = min(max(m, 4), 8)
    S0, s0, M_S0 = _init_S(p, M, m, even_only=True)
    S1, s1, M_S1 = _init_S(p, M, m + 1, even_only=False)
    M_null = int(np.sum(p == SCTYPE_NULL))
    M_pilot = int(np.sum(p == SCTYPE_PILOT))
    M_data = int(np.sum(p == SCTYPE_DATA))
    if M_pilot < 2:
        raise ValueError("ofdm frame requires at least two pilot "
                         "subcarriers")
    return OFDMParams(M, cp_len, taper_len, p, S0, s0, S1, s1,
                      M_null, M_pilot, M_data)


def _pilot_order(params: "OFDMParams") -> np.ndarray:
    """Pilot bins in the reference's traversal order: the writesymbol
    loop visits bins k=(i+M/2)%M for i ascending (ofdmframegen.c:290),
    so the pilot msequence is consumed in fftshifted bin order."""
    M = params.M
    k = (np.arange(M) + M // 2) % M
    return k[np.asarray(params.p)[k] == SCTYPE_PILOT]


def _pilot_sequence(n_pilots: int, n_syms: int) -> np.ndarray:
    """Per-symbol pilot values [n_syms, n_pilots] from msequence(8)
    (reference ofdmframegen.c:168, one advance per pilot per symbol),
    ordered as _pilot_order traverses the bins."""
    ms = MSequence(8)
    out = np.zeros((n_syms, n_pilots), np.float32)
    for s in range(n_syms):
        for j in range(n_pilots):
            out[s, j] = 1.0 if ms.advance() else -1.0
    return out


def _symbolize(params: OFDMParams, X: np.ndarray) -> np.ndarray:
    """Freq symbol [.., M] -> time samples [.., cp+M] (no taper)."""
    x = np.fft.ifft(X, axis=-1) * params.M
    return np.concatenate([x[..., params.M - params.cp_len:], x], axis=-1)


def ofdm_generate_frame(params: OFDMParams, data_syms) -> np.ndarray:
    """Assemble a frame: [S0, S0, S1, payload symbols].

    data_syms: [n_syms, M_data] modulated data points.
    Returns time samples [(3 + n_syms) * (M + cp_len)].
    """
    M, cp = params.M, params.cp_len
    data_syms = np.atleast_2d(np.asarray(data_syms))
    n_syms = data_syms.shape[0]
    if data_syms.shape[1] != params.M_data:
        raise ValueError(f"expected {params.M_data} data symbols per OFDM "
                         f"symbol, got {data_syms.shape[1]}")
    g = 1.0 / np.sqrt(params.M_pilot + params.M_data)
    pilots = _pilot_sequence(params.M_pilot, n_syms)
    pil_idx = _pilot_order(params)
    dat_idx = np.nonzero(params.p == SCTYPE_DATA)[0]
    X = np.zeros((n_syms, M), np.complex64)
    X[:, pil_idx] = pilots * g
    X[:, dat_idx] = data_syms * g
    payload = _symbolize(params, X).reshape(-1)
    # preamble: S0 twice + S1.  The first S0 symbol is rotated by TWO
    # cp lengths, the second by one (reference ofdmframegen_write_S0a/b)
    # so the pair is contiguous in the s0 sequence's own period.
    idx_a = (np.arange(M + cp) + M - 2 * cp) % M
    idx_b = (np.arange(M + cp) + M - cp) % M
    s1_sym = np.concatenate([params.s1[M - cp:], params.s1])
    return np.concatenate([params.s0[idx_a], params.s0[idx_b], s1_sym,
                           payload]).astype(np.complex64)


class OFDMSyncResult(NamedTuple):
    detected: bool
    sample_index: int
    cfo_hat: float
    data_syms: Optional[np.ndarray]   # [n_syms, M_data]
    evm_db: float


def ofdm_frame_sync(params: OFDMParams, x, n_syms: int,
                    threshold: float = 0.7) -> OFDMSyncResult:
    """Block-native OFDM synchronizer.

    1. Schmidl-Cox autocorrelation on the half-symbol-periodic S0
       (coarse timing + carrier offset; reference execute_seekplcp).
    2. S1 cross-correlation for exact symbol timing + phase.
    3. Per-subcarrier channel estimate from S1 (reference _S1 EQ init).
    4. Batched payload FFT + EQ + per-symbol pilot phase correction.
    """
    x = np.asarray(x, np.complex64)
    M, cp = params.M, params.cp_len
    M2 = M // 2
    T = len(x)
    # --- 1. Schmidl-Cox over the whole capture ---
    prod = x[M2:] * np.conj(x[:-M2])
    c = np.cumsum(np.concatenate([[0], prod]))
    P = c[M2:] - c[:-M2]           # sum over window M/2 at each offset
    e = np.cumsum(np.concatenate([[0], np.abs(x) ** 2]))
    R = e[M:] - e[:-M]
    L = min(len(P), len(R))
    metric = np.abs(P[:L]) / np.maximum(R[:L], 1e-12) * 2.0
    hits = np.nonzero(metric > threshold)[0]
    if len(hits) == 0:
        return OFDMSyncResult(False, 0, 0.0, None, 0.0)
    d0 = int(hits[0])
    # plateau: advance to local max within one symbol
    w_end = min(d0 + M + cp, L)
    d0 = d0 + int(np.argmax(metric[d0:w_end]))
    cfo = float(np.angle(P[d0]) / M2)
    # --- 2. de-rotate and find S1 by cross-correlation ---
    t = np.arange(T)
    xc = x * np.exp(-1j * cfo * t)
    # search S1 within a window after the coarse point
    search_lo = d0
    search_hi = min(d0 + 3 * (M + cp) + M, T - M)
    best_idx, best_val, best_ph = -1, 0.0, 0.0
    s1 = params.s1
    s1_e = np.sum(np.abs(s1) ** 2)
    for k in range(search_lo, search_hi):
        v = np.vdot(s1, xc[k: k + M])  # sum conj(s1)*x
        m = np.abs(v) / s1_e
        if m > best_val:
            best_val, best_idx, best_ph = m, k, np.angle(v)
    if best_idx < 0:
        return OFDMSyncResult(False, 0, cfo, None, 0.0)
    # S1 body starts at best_idx; frame payload starts after it
    payload_start = best_idx + M
    # --- 3. channel estimate from S1 ---
    S1_rx = np.fft.fft(xc[best_idx: best_idx + M])
    on = params.p != SCTYPE_NULL
    G = np.zeros(M, np.complex64)
    G[on] = S1_rx[on] / (params.S1[on] * np.sqrt(params.M_pilot +
                                                 params.M_data))
    # smooth channel estimate across enabled bins (reference smoothing)
    on_idx = np.nonzero(on)[0]
    Gs = G.copy()
    vals = G[on_idx]
    sm = np.convolve(vals, np.ones(3) / 3.0, mode="same")
    sm[0] = vals[0]
    sm[-1] = vals[-1]
    Gs[on_idx] = sm
    # --- 4. payload demod ---
    pil_idx = _pilot_order(params)
    dat_idx = np.nonzero(params.p == SCTYPE_DATA)[0]
    pilots = _pilot_sequence(params.M_pilot, n_syms)
    need = payload_start + n_syms * (M + cp)
    if need > T:
        return OFDMSyncResult(False, best_idx, cfo, None, 0.0)
    body = xc[payload_start: need].reshape(n_syms, M + cp)[:, cp:]
    Xr = np.fft.fft(body, axis=-1) / np.sqrt(params.M_pilot + params.M_data)
    inv = np.zeros(M, np.complex64)
    nz = np.abs(Gs) > 1e-9
    inv[nz] = 1.0 / Gs[nz]
    Xeq = Xr * inv[None, :]
    # per-symbol phase from pilots
    pr = Xeq[:, pil_idx] * pilots
    ph = np.angle(np.sum(pr, axis=1))
    Xeq = Xeq * np.exp(-1j * ph)[:, None]
    data = Xeq[:, dat_idx]
    # EVM vs nearest of a dense grid is modem-specific; report vs unit circle
    evm_db = float(20 * np.log10(np.std(np.abs(data) - np.mean(np.abs(data)))
                                 + 1e-12))
    return OFDMSyncResult(True, best_idx, cfo, data, evm_db)
