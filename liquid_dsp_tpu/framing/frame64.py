"""framegen64 / framesync64: the fixed 8+64-byte frame PHY pair.

Reference analogs (studied, not copied):
  * framegen64  — src/framing/src/framegen64.c:38-172: 64-symbol BPSK-
    quadrature m-sequence preamble (msequence(7,0x0089,1)), qpacketmodem
    (72B -> 600 QPSK symbols via CRC-24 + Golay(24,12)), qpilotgen
    (600 -> 630 symbols, spacing 21), ARKAISER k=2 m=7 beta=0.3 pulse
    interpolation -> exactly LIQUID_FRAME64_LEN = 1440 samples.
  * framesync64 — src/framing/src/framesync64.c:66-430: qdetector ->
    mixer/matched-filter/decimate -> qpilotsync -> qpacketmodem decode.

TPU design (SURVEY.md §7): the receiver is a block pipeline — detect the
preamble anywhere in the capture with one batched FFT cross-correlation,
then mix/filter/sample the aligned window with gathers (no per-sample
state machine).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..design.firdes import firdes_arkaiser
from ..ops.fir import firinterp
from ..utils.sequence import MSequence
from .qpacket import (qpacketmodem_encode, qpacketmodem_decode,
                      qpilotgen, qpilotsync)
from .detector import qdetector_detect

__all__ = ["FRAME64_LEN", "framegen64", "framesync64", "Frame64Result",
           "frame64_preamble"]

FRAME64_LEN = 1440
_K = 2          # samples/symbol
_M = 7          # filter semi-length (symbols)
_BETA = 0.3     # excess bandwidth
_NPFB = 32      # matched-filter bank resolution


def frame64_preamble() -> np.ndarray:
    """64-symbol p/n preamble (reference framegen64.c:60-66)."""
    ms = MSequence(7, 0x0089, 1)
    out = np.zeros(64, np.complex64)
    s2 = np.sqrt(0.5)
    for i in range(64):
        # NOTE: the reference's two msequence_advance() calls sit in one
        # expression (framegen64.c:62-63) whose evaluation order is
        # unspecified in C; the shipped builds evaluate the imaginary
        # operand first, so the first bit maps to Q, the second to I.
        im = s2 if ms.advance() else -s2
        re = s2 if ms.advance() else -s2
        out[i] = re + 1j * im
    return out


def _interp_taps() -> np.ndarray:
    return firdes_arkaiser(_K, _M, _BETA).astype(np.float32)


def framegen64(header, payload) -> np.ndarray:
    """Generate one frame: 8-byte header + 64-byte payload ->
    1440 complex samples (reference framegen64_execute:130-172)."""
    header = np.asarray(header, np.uint8)
    payload = np.asarray(payload, np.uint8)
    if header.shape != (8,) or payload.shape != (64,):
        raise ValueError("framegen64 takes an 8-byte header and a "
                         "64-byte payload")
    msg = np.concatenate([header, payload])
    syms = np.asarray(qpacketmodem_encode(
        msg, "crc24", "none", "golay2412", "qpsk"))
    assert len(syms) == 600
    frame_syms = qpilotgen(syms, 21)
    assert len(frame_syms) == 630
    # pulse-shape: preamble + payload + settling zeros
    settle = 2 * _M + 2 + 10
    stream = np.concatenate([frame64_preamble(), frame_syms,
                             np.zeros(settle, np.complex64)])
    qi = firinterp(_K, _interp_taps())
    y, _ = qi(jnp.asarray(stream), batch_shape=())
    y = np.asarray(y)
    assert len(y) == FRAME64_LEN
    return y.astype(np.complex64)


def _detector_template() -> np.ndarray:
    """Interpolated preamble + filter tail (reference
    qdetector_cccf_create_linear: s_len = k*(64 + 2m))."""
    qi = firinterp(_K, _interp_taps())
    seq = np.concatenate([frame64_preamble(),
                          np.zeros(2 * _M, np.complex64)])
    y, _ = qi(jnp.asarray(seq), batch_shape=())
    return np.asarray(y).astype(np.complex64)


def _mf_bank() -> np.ndarray:
    """Polyphase matched-filter bank [npfb, Lb] (reference
    framesync64.c:144: firpfb_crcf_create_rnyquist(ARKAISER, 32, 2, 7))."""
    h = firdes_arkaiser(_K * _NPFB, _M, _BETA).astype(np.float32)
    n = len(h) - 1  # 2*k*npfb*m
    Lb = n // _NPFB  # branch length = 2*k*m
    bank = np.stack([h[b + np.arange(Lb) * _NPFB] for b in range(_NPFB)])
    return bank  # [npfb, Lb]


class Frame64Result(NamedTuple):
    detected: bool
    crc_ok: bool
    header: Optional[np.ndarray]
    payload: Optional[np.ndarray]
    evm_db: float
    rssi_db: float
    cfo: float          # radians/sample
    sample_index: int


_TEMPLATE = None
_BANK = None


def framesync64(x, threshold: float = 0.5) -> Frame64Result:
    """Recover a frame64 from a capture buffer [T] (T >= 1440ish).

    Block pipeline: detect -> mix down -> polyphase matched filter at the
    estimated timing phase, decimated 2:1 -> pilot sync -> packet decode.
    """
    global _TEMPLATE, _BANK
    if _TEMPLATE is None:
        _TEMPLATE = _detector_template()
        _BANK = _mf_bank()
    x = np.asarray(x, np.complex64)
    det = qdetector_detect(x, _TEMPLATE, threshold=threshold, range_bins=2)
    if not det.detected:
        return Frame64Result(False, False, None, None, 0.0, 0.0, 0.0, -1)

    # timing: filterbank index + base offset (framesync64.c:299-306)
    tau = det.tau_hat
    if tau > 0:
        b = int(tau * _NPFB) % _NPFB
        off = 0
    else:
        b = int((1.0 + tau) * _NPFB) % _NPFB
        off = -1
    n0 = det.sample_index

    # number of matched-filter symbol outputs needed:
    # 64 preamble + 2m delay + 630 payload
    n_sym = 64 + 2 * _M + 630
    Lb = _BANK.shape[1]
    taps = _BANK[b][::-1].copy()  # newest-first ordering for the window dot

    # sample instants (2 samples/symbol) relative to template start
    base = n0 + off + 2 * np.arange(n_sym)
    idx = base[:, None] + np.arange(Lb)[None, :] - (Lb - 1)
    pad = Lb
    xp = np.concatenate([np.zeros(pad, np.complex64), x,
                         np.zeros(2 * n_sym + pad, np.complex64)])
    # mix down with detector estimates (phase referenced to template start)
    t_idx = idx + pad
    win = xp[t_idx]                                     # [n_sym, Lb]
    tt = (idx - n0).astype(np.float32)
    mix = np.exp(-1j * (det.dphi_hat * tt + det.phi_hat)).astype(np.complex64)
    win = win * mix
    sym = win @ taps.astype(np.complex64)
    sym = sym * (0.5 / max(det.gamma_hat, 1e-12))

    payload_rx = sym[64 + 2 * _M: 64 + 2 * _M + 630]
    payload_sym, dphi2, phi2, g2 = qpilotsync(payload_rx, 600, 21)
    payload_bytes, ok = qpacketmodem_decode(
        payload_sym, 72, "crc24", "none", "golay2412", "qpsk")

    # stats: EVM vs nearest QPSK point
    from ..modem import constellation, demodulate, modulate
    table = constellation("qpsk")
    s_hat = demodulate(table, jnp.asarray(payload_sym))
    ref = np.asarray(modulate(table, s_hat))
    evm = np.sqrt(np.mean(np.abs(payload_sym - ref) ** 2))
    evm_db = float(20 * np.log10(evm + 1e-12))
    rssi_db = float(20 * np.log10(max(det.gamma_hat, 1e-12)))
    # cfo is radians/SAMPLE: dphi_hat already is; qpilotsync's dphi2 is
    # radians per payload symbol at k=2 samples/symbol, so rescale
    return Frame64Result(True, bool(ok),
                         payload_bytes[:8].copy(), payload_bytes[8:].copy(),
                         evm_db, rssi_db, float(det.dphi_hat + dphi2 / _K),
                         n0)
