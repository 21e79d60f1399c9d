"""flexframegen / flexframesync: variable-length single-carrier frames
with runtime-configurable payload modulation and FEC.

Reference analogs (studied, not copied): reference src/framing/src/
flexframegen.c:43-400 and flexframesync.c — 64-symbol p/n preamble
(msequence(7,0x0089,1), same as frame64), 20-byte header (14 user +
protocol/length/mod/fec control bytes, flexframegen.c:300-323) coded
with CRC-32 + SEC-DED(72,64) + Hamming(8,4) on QPSK with pilots every
16 symbols (liquid.internal.h:1127-1133), payload coded per runtime
properties, ARKAISER k=2 m=7 beta=0.25 pulse shaping.

TPU design: same block receiver as frame64 — detect anywhere, gather
matched-filter outputs; the header is decoded first to learn the payload
length/scheme, then the payload symbols are sliced from the same symbol
stream (two-stage block pipeline instead of a per-sample state machine).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..design.firdes import firdes_arkaiser
from ..ops.fir import firinterp
from .qpacket import (qpacketmodem_encode, qpacketmodem_decode,
                      qpacketmodem_frame_len, qpilotgen, qpilotsync,
                      qpilot_frame_len)
from .frame64 import frame64_preamble
from .detector import qdetector_detect

__all__ = ["flexframegen", "flexframesync", "FlexFrameResult",
           "FLEXFRAME_H_USER"]

_K = 2
_M = 7
_BETA = 0.25
_NPFB = 32
FLEXFRAME_H_USER = 14
_H_CRC, _H_FEC0, _H_FEC1, _H_MOD = "crc32", "secded7264", "hamming84", "qpsk"
_PROTOCOL = 101

from .wire import (crc_to_wire, fec_to_wire, modem_to_wire,
                   crc_from_wire, fec_from_wire, modem_from_wire)


def _header_syms_len():
    n_mod = qpacketmodem_frame_len(FLEXFRAME_H_USER + 6, _H_CRC, _H_FEC0,
                                   _H_FEC1, _H_MOD)
    return qpilot_frame_len(n_mod, 16), n_mod


def _interp_taps():
    return firdes_arkaiser(_K, _M, _BETA).astype(np.float32)


def flexframegen(header, payload, crc: str = "crc32", fec0: str = "none",
                 fec1: str = "golay2412", ms: str = "qpsk") -> np.ndarray:
    """Assemble a frame; returns complex samples at 2 samples/symbol."""
    header = np.asarray(header, np.uint8)
    payload = np.asarray(payload, np.uint8)
    if header.shape != (FLEXFRAME_H_USER,):
        raise ValueError(f"flexframe header must be {FLEXFRAME_H_USER} "
                         f"bytes")
    n = len(payload)
    hdr = np.zeros(FLEXFRAME_H_USER + 6, np.uint8)
    hdr[:FLEXFRAME_H_USER] = header
    # reference wire format (flexframegen.c:300-323): protocol byte,
    # 16-bit payload length, then the reference enum values — mod scheme
    # in one byte, CRC(3 bits)<<5|fec0(5 bits), fec1(5 bits)
    hdr[FLEXFRAME_H_USER + 0] = _PROTOCOL
    hdr[FLEXFRAME_H_USER + 1] = (n >> 8) & 0xFF
    hdr[FLEXFRAME_H_USER + 2] = n & 0xFF
    hdr[FLEXFRAME_H_USER + 3] = modem_to_wire(ms)
    hdr[FLEXFRAME_H_USER + 4] = ((crc_to_wire(crc) & 0x07) << 5) | \
        (fec_to_wire(fec0) & 0x1F)
    hdr[FLEXFRAME_H_USER + 5] = fec_to_wire(fec1) & 0x1F

    h_mod = np.asarray(qpacketmodem_encode(hdr, _H_CRC, _H_FEC0, _H_FEC1,
                                           _H_MOD))
    h_sym = qpilotgen(h_mod, 16)
    p_sym = np.asarray(qpacketmodem_encode(payload, crc, fec0, fec1, ms))

    settle = 2 * _M  # reference tail: 2m zero symbols (flexframegen.c:457)
    stream = np.concatenate([frame64_preamble(), h_sym, p_sym,
                             np.zeros(settle, np.complex64)])
    qi = firinterp(_K, _interp_taps())
    y, _ = qi(jnp.asarray(stream.astype(np.complex64)), batch_shape=())
    return np.asarray(y).astype(np.complex64)


class FlexFrameResult(NamedTuple):
    detected: bool
    header_ok: bool
    crc_ok: bool
    header: Optional[np.ndarray]
    payload: Optional[np.ndarray]
    ms: str
    payload_len: int
    evm_db: float


_TEMPLATE = None
_BANK = None


def _detector_template():
    qi = firinterp(_K, _interp_taps())
    seq = np.concatenate([frame64_preamble(),
                          np.zeros(2 * _M, np.complex64)])
    y, _ = qi(jnp.asarray(seq), batch_shape=())
    return np.asarray(y).astype(np.complex64)


def _mf_bank():
    h = firdes_arkaiser(_K * _NPFB, _M, _BETA).astype(np.float32)
    n = len(h) - 1
    Lb = n // _NPFB
    return np.stack([h[b + np.arange(Lb) * _NPFB] for b in range(_NPFB)])


def _mf_symbols(x, det, n_sym):
    """Matched-filter symbol stream from the aligned capture (same gather
    pipeline as framesync64)."""
    global _BANK
    if _BANK is None:
        _BANK = _mf_bank()
    tau = det.tau_hat
    if tau > 0:
        b = int(tau * _NPFB) % _NPFB
        off = 0
    else:
        b = int((1.0 + tau) * _NPFB) % _NPFB
        off = -1
    n0 = det.sample_index
    Lb = _BANK.shape[1]
    taps = _BANK[b][::-1].astype(np.complex64)
    base = n0 + off + 2 * np.arange(n_sym)
    idx = base[:, None] + np.arange(Lb)[None, :] - (Lb - 1)
    pad = Lb
    xp = np.concatenate([np.zeros(pad, np.complex64), x,
                         np.zeros(2 * n_sym + pad, np.complex64)])
    win = xp[idx + pad]
    tt = (idx - n0).astype(np.float32)
    win = win * np.exp(-1j * (det.dphi_hat * tt + det.phi_hat)
                       ).astype(np.complex64)
    sym = win @ taps
    return sym * (0.5 / max(det.gamma_hat, 1e-12))


def flexframesync(x, threshold: float = 0.5) -> FlexFrameResult:
    """Recover a flexframe from a capture buffer."""
    global _TEMPLATE
    if _TEMPLATE is None:
        _TEMPLATE = _detector_template()
    x = np.asarray(x, np.complex64)
    det = qdetector_detect(x, _TEMPLATE, threshold=threshold, range_bins=2)
    nores = FlexFrameResult(False, False, False, None, None, "", 0, 0.0)
    if not det.detected:
        return nores

    h_sym_len, h_mod_len = _header_syms_len()
    n_lead = 64 + 2 * _M
    # first decode the header
    n_first = n_lead + h_sym_len
    sym = _mf_symbols(x, det, n_first)
    h_rx = sym[n_lead: n_lead + h_sym_len]
    h_mod, dphi2, phi2, g2 = qpilotsync(h_rx, h_mod_len, 16)
    hdr, h_ok = qpacketmodem_decode(h_mod, FLEXFRAME_H_USER + 6, _H_CRC,
                                    _H_FEC0, _H_FEC1, _H_MOD)
    if not h_ok or hdr[FLEXFRAME_H_USER] != _PROTOCOL:
        return FlexFrameResult(True, False, False, None, None, "", 0, 0.0)
    n_payload = (int(hdr[FLEXFRAME_H_USER + 1]) << 8) | \
        int(hdr[FLEXFRAME_H_USER + 2])
    try:
        ms = modem_from_wire(int(hdr[FLEXFRAME_H_USER + 3]))
        crc = crc_from_wire((int(hdr[FLEXFRAME_H_USER + 4]) >> 5) & 0x07)
        fec0 = fec_from_wire(int(hdr[FLEXFRAME_H_USER + 4]) & 0x1F)
        fec1 = fec_from_wire(int(hdr[FLEXFRAME_H_USER + 5]) & 0x1F)
        # frame-length computation raises for wire-valid but unimplemented
        # schemes (e.g. user-defined 'arb' constellations) — report a
        # failed header instead of crashing the receiver
        p_sym_len = qpacketmodem_frame_len(n_payload, crc, fec0, fec1, ms)
    except (ValueError, KeyError):
        return FlexFrameResult(True, False, False, None, None, "", 0, 0.0)
    n_total = n_first + p_sym_len
    sym = _mf_symbols(x, det, n_total)
    # residual carrier from header pilots extends over payload
    i_all = np.arange(p_sym_len) + h_sym_len
    p_rx = sym[n_first: n_total] * np.exp(
        -1j * (dphi2 * i_all + phi2)) / max(g2, 1e-12)
    payload, ok = qpacketmodem_decode(p_rx, n_payload, crc, fec0, fec1, ms)
    from ..modem import constellation, demodulate, modulate
    table = constellation(ms)
    ref = np.asarray(modulate(table, demodulate(table, jnp.asarray(p_rx))))
    evm_db = float(20 * np.log10(np.sqrt(np.mean(np.abs(p_rx - ref) ** 2))
                                 + 1e-12))
    return FlexFrameResult(True, True, bool(ok), hdr[:FLEXFRAME_H_USER],
                           payload, ms, n_payload, evm_db)
