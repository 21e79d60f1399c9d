"""gmskframegen / gmskframesync: GMSK-modulated frames.

Reference analogs (studied, not copied): reference src/framing/src/
gmskframegen.c:40-360 (63-bit msequence(6,0x6d,1) preamble, 13-byte
header = 8 user + version/length/crc/fec control, CRC-32 +
Hamming(12,8), payload per runtime FEC; GMSK k samples/symbol) and
gmskframesync.c (detector_cccf time-domain correlator + MF timing).

TPU design: detect the GMSK-modulated preamble template with the same
batched FFT cross-correlator used by the linear framers; the GMSK
phase-derivative demodulator is CFO-tolerant by construction (a carrier
offset appears as a constant bias in the instantaneous frequency, which
is estimated from the preamble and subtracted).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..modem.cpm import gmsk_modulator, gmsk_demodulator
from ..utils.sequence import MSequence
from ..fec.packetizer import (packetizer_encode, packetizer_decode,
                              packetizer_compute_enc_msg_len)
from ..fec.block import unpack_bits, pack_bits
from ..utils.random import scramble_data, unscramble_data
from ..design.windows import hamming
from .wire import crc_to_wire, fec_to_wire, crc_from_wire, fec_from_wire
from .detector import qdetector_detect

__all__ = ["gmskframegen", "gmskframesync", "GMSKFrameResult",
           "GMSKFRAME_H_USER"]

GMSKFRAME_H_USER = 8
_H_CRC, _H_FEC = "crc32", "hamming128"
_VERSION = 3


def _preamble_bits(n: int = 63) -> np.ndarray:
    ms = MSequence(6, 0x6D, 1)
    return np.asarray([ms.advance() for _ in range(n)], np.uint8)


def gmskframegen(header, payload, k: int = 2, m: int = 3, bt: float = 0.5,
                 crc: str = "crc32", fec0: str = "none",
                 fec1: str = "none") -> np.ndarray:
    """Assemble a GMSK frame; returns complex samples (k per bit)."""
    header = np.asarray(header, np.uint8)
    payload = np.asarray(payload, np.uint8)
    if header.shape != (GMSKFRAME_H_USER,):
        raise ValueError(f"gmskframe header must be {GMSKFRAME_H_USER} "
                         f"bytes")
    n = len(payload)
    hdr = np.zeros(GMSKFRAME_H_USER + 5, np.uint8)
    hdr[:GMSKFRAME_H_USER] = header
    q = GMSKFRAME_H_USER
    # reference wire format (gmskframegen.c:317-345): version byte,
    # 16-bit length, crc(3b)<<5|fec0(5b), fec1(5b) — reference enum
    # values; header coded crc32+hamming128 then scrambled
    hdr[q + 0] = _VERSION
    hdr[q + 1] = (n >> 8) & 0xFF
    hdr[q + 2] = n & 0xFF
    hdr[q + 3] = ((crc_to_wire(crc) & 0x07) << 5) | \
        (fec_to_wire(fec0) & 0x1F)
    hdr[q + 4] = fec_to_wire(fec1) & 0x1F
    h_enc = scramble_data(packetizer_encode(hdr, _H_CRC, _H_FEC, "none"))
    p_enc = packetizer_encode(payload, crc, fec0, fec1)
    bits = np.concatenate([_preamble_bits(), unpack_bits(h_enc),
                           unpack_bits(p_enc),
                           np.zeros(2 * m, np.uint8)])  # tail flush
    mod = gmsk_modulator(k, m, bt)
    y, _ = mod(jnp.asarray(bits.astype(np.int32)), batch_shape=())
    y = np.asarray(y).astype(np.complex64)
    # amplitude ramp over the first/last m symbols (gmskframegen.c:360)
    w = hamming(2 * m * k).astype(np.float32)
    y[: m * k] *= w[: m * k]
    y[-m * k:] *= w[m * k:]
    return y


class GMSKFrameResult(NamedTuple):
    detected: bool
    header_ok: bool
    crc_ok: bool
    header: Optional[np.ndarray]
    payload: Optional[np.ndarray]
    payload_len: int


_TEMPLATES = {}


def _template(k, m, bt):
    key = (k, m, bt)
    if key not in _TEMPLATES:
        mod = gmsk_modulator(k, m, bt)
        bits = np.concatenate([_preamble_bits(),
                               np.zeros(2 * m, np.uint8)])
        y, _ = mod(jnp.asarray(bits.astype(np.int32)), batch_shape=())
        _TEMPLATES[key] = np.asarray(y).astype(np.complex64)
    return _TEMPLATES[key]


def gmskframesync(x, k: int = 2, m: int = 3, bt: float = 0.5,
                  threshold: float = 0.5) -> GMSKFrameResult:
    """Recover a GMSK frame from a capture buffer."""
    x = np.asarray(x, np.complex64)
    s = _template(k, m, bt)
    det = qdetector_detect(x, s, threshold=threshold, range_bins=2)
    nores = GMSKFrameResult(False, False, False, None, None, 0)
    if not det.detected:
        return nores
    n0 = det.sample_index
    # demodulate from the detected start; CFO folds into a frequency bias
    # the demodulator's matched filter ignores after mixing correction
    t = np.arange(len(x) - n0)
    xa = x[n0:] * np.exp(-1j * (det.dphi_hat * t + det.phi_hat))
    dem = gmsk_demodulator(k, m, bt)
    bits, _ = dem(jnp.asarray(xa), batch_shape=())
    bits = np.asarray(bits)
    # demodulator delay: 2m bits
    bits = bits[2 * m:]
    h_enc_len = packetizer_compute_enc_msg_len(GMSKFRAME_H_USER + 5,
                                               _H_CRC, _H_FEC, "none")
    h_bits = 8 * h_enc_len
    if len(bits) < 63 + h_bits:
        return nores
    h_enc = unscramble_data(pack_bits(bits[63: 63 + h_bits])[:h_enc_len])
    hdr, h_ok = packetizer_decode(h_enc, GMSKFRAME_H_USER + 5, _H_CRC,
                                  _H_FEC, "none")
    q = GMSKFRAME_H_USER
    if not h_ok or hdr[q] != _VERSION:
        return GMSKFrameResult(True, False, False, None, None, 0)
    n_payload = (int(hdr[q + 1]) << 8) | int(hdr[q + 2])
    try:
        crc = crc_from_wire((int(hdr[q + 3]) >> 5) & 0x07)
        fec0 = fec_from_wire(int(hdr[q + 3]) & 0x1F)
        fec1 = fec_from_wire(int(hdr[q + 4]) & 0x1F)
    except ValueError:
        return GMSKFrameResult(True, False, False, None, None, 0)
    p_enc_len = packetizer_compute_enc_msg_len(n_payload, crc, fec0, fec1)
    p_bits = 8 * p_enc_len
    if len(bits) < 63 + h_bits + p_bits:
        return GMSKFrameResult(True, True, False, hdr[:q], None, n_payload)
    p_enc = pack_bits(bits[63 + h_bits: 63 + h_bits + p_bits])[:p_enc_len]
    payload, ok = packetizer_decode(p_enc, n_payload, crc, fec0, fec1)
    return GMSKFrameResult(True, True, bool(ok), hdr[:q], payload,
                           n_payload)
