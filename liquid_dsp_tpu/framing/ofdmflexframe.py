"""ofdmflexframegen / ofdmflexframesync: OFDM frames with per-frame
runtime modulation and FEC, signalled in a protected header.

Reference analogs (studied, not copied): reference src/framing/src/
ofdmflexframegen.c:108-560 and ofdmflexframesync.c — S0/S0/S1 OFDM
preamble, 14-byte header (8 user + protocol/length/mod/fec,
:495-523) coded CRC-32 + Golay(24,12) on BPSK (36 encoded bytes = 288
header symbols, liquid.internal.h:1153-1163), scrambled; payload coded
per runtime properties and mapped onto the data subcarriers.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..multichannel.ofdm import (OFDMParams, ofdm_params,
                                 ofdm_generate_frame, ofdm_frame_sync)
from ..modem import constellation, bits_per_symbol, modulate, demodulate
from ..fec.packetizer import packetizer_encode, packetizer_decode, \
    packetizer_compute_enc_msg_len
from .wire import (crc_to_wire, fec_to_wire, modem_to_wire,
                   crc_from_wire, fec_from_wire, modem_from_wire)
from ..fec.block import unpack_bits, pack_bits
from ..utils.random import scramble_data, unscramble_data

__all__ = ["ofdmflexframegen", "ofdmflexframesync", "OFDMFlexResult",
           "OFDMFLEXFRAME_H_USER"]

OFDMFLEXFRAME_H_USER = 8
_H_CRC, _H_FEC = "crc32", "golay2412"
_H_MOD = "bpsk"
_PROTOCOL = 104


def _syms_from_bytes(data: np.ndarray, ms: str) -> np.ndarray:
    bps = bits_per_symbol(ms)
    bits = unpack_bits(data)
    nsym = -(-len(bits) // bps)
    bits = np.concatenate([bits, np.zeros(nsym * bps - len(bits),
                                          np.uint8)])
    idx = bits.reshape(nsym, bps) @ (1 << np.arange(bps - 1, -1, -1))
    return np.asarray(modulate(constellation(ms), jnp.asarray(idx)))


def _bytes_from_syms(syms: np.ndarray, ms: str, n_bytes: int) -> np.ndarray:
    bps = bits_per_symbol(ms)
    s = np.asarray(demodulate(constellation(ms), jnp.asarray(syms)))
    bits = ((s[:, None] >> np.arange(bps - 1, -1, -1)) & 1).astype(np.uint8)
    return pack_bits(bits.reshape(-1))[:n_bytes]


def _frame_geometry(params: OFDMParams, payload_len: int, crc, fec0, fec1,
                    ms):
    """Header and payload each occupy whole OFDM symbols (reference
    ofdmflexframegen.c:192-194, :489-492); unused data slots in the last
    symbol of each block are pad."""
    h_enc_len = packetizer_compute_enc_msg_len(
        OFDMFLEXFRAME_H_USER + 6, _H_CRC, _H_FEC, "none")
    h_syms = 8 * h_enc_len  # BPSK
    p_enc_len = packetizer_compute_enc_msg_len(payload_len, crc, fec0, fec1)
    bps = bits_per_symbol(ms)
    p_syms = -(-(8 * p_enc_len) // bps)
    nh = -(-h_syms // params.M_data)
    np_ = -(-p_syms // params.M_data)
    return h_syms, p_syms, nh, np_


def ofdmflexframegen(header, payload, M: int = 64, cp_len: int = 16,
                     crc: str = "crc32", fec0: str = "none",
                     fec1: str = "golay2412", ms: str = "qpsk",
                     params: OFDMParams | None = None) -> np.ndarray:
    """Assemble an OFDM flexframe; returns complex time samples."""
    header = np.asarray(header, np.uint8)
    payload = np.asarray(payload, np.uint8)
    if header.shape != (OFDMFLEXFRAME_H_USER,):
        raise ValueError(f"ofdmflexframe header must be "
                         f"{OFDMFLEXFRAME_H_USER} bytes")
    if params is None:
        params = ofdm_params(M, cp_len)
    n = len(payload)
    hdr = np.zeros(OFDMFLEXFRAME_H_USER + 6, np.uint8)
    hdr[:OFDMFLEXFRAME_H_USER] = header
    k = OFDMFLEXFRAME_H_USER
    # reference wire format (ofdmflexframegen.c:496-523): protocol,
    # 16-bit length, mod scheme enum, crc(3b)<<5|fec0(5b), fec1(5b);
    # header coded crc32 + golay2412 then scrambled, BPSK on data bins
    hdr[k + 0] = _PROTOCOL
    hdr[k + 1] = (n >> 8) & 0xFF
    hdr[k + 2] = n & 0xFF
    hdr[k + 3] = modem_to_wire(ms)
    hdr[k + 4] = ((crc_to_wire(crc) & 0x07) << 5) | \
        (fec_to_wire(fec0) & 0x1F)
    hdr[k + 5] = fec_to_wire(fec1) & 0x1F
    h_enc = packetizer_encode(hdr, _H_CRC, _H_FEC, "none")
    h_enc = scramble_data(h_enc)
    h_syms = _syms_from_bytes(h_enc, _H_MOD)
    p_enc = packetizer_encode(payload, crc, fec0, fec1)
    p_syms = _syms_from_bytes(p_enc, ms)
    # header and payload each fill whole OFDM symbols; pad slots carry
    # zeros here (the reference pads with random modem symbols, which
    # receivers ignore — ofdmflexframegen.c:620-626)
    Md = params.M_data
    nh = -(-len(h_syms) // Md)
    npd = -(-len(p_syms) // Md)
    grid = np.zeros((nh + npd, Md), np.complex64)
    grid.reshape(-1)[: len(h_syms)] = h_syms
    grid[nh:].reshape(-1)[: len(p_syms)] = p_syms
    return ofdm_generate_frame(params, grid)


class OFDMFlexResult(NamedTuple):
    detected: bool
    header_ok: bool
    crc_ok: bool
    header: Optional[np.ndarray]
    payload: Optional[np.ndarray]
    ms: str
    payload_len: int


def ofdmflexframesync(x, M: int = 64, cp_len: int = 16,
                      params: OFDMParams | None = None,
                      threshold: float = 0.7) -> OFDMFlexResult:
    """Recover an OFDM flexframe from a capture."""
    if params is None:
        params = ofdm_params(M, cp_len)
    x = np.asarray(x, np.complex64)
    nores = OFDMFlexResult(False, False, False, None, None, "", 0)
    # first: demod enough OFDM symbols for the header
    h_enc_len = packetizer_compute_enc_msg_len(
        OFDMFLEXFRAME_H_USER + 6, _H_CRC, _H_FEC, "none")
    h_syms_n = 8 * h_enc_len
    n_hdr_ofdm = -(-h_syms_n // params.M_data)
    r = ofdm_frame_sync(params, x, n_hdr_ofdm, threshold=threshold)
    if not r.detected or r.data_syms is None:
        return nores
    h_stream = r.data_syms.reshape(-1)[:h_syms_n]
    h_enc = _bytes_from_syms(h_stream, _H_MOD, h_enc_len)
    h_enc = unscramble_data(h_enc)
    hdr, h_ok = packetizer_decode(h_enc, OFDMFLEXFRAME_H_USER + 6, _H_CRC,
                                  _H_FEC, "none")
    k = OFDMFLEXFRAME_H_USER
    if not h_ok or hdr[k] != _PROTOCOL:
        return OFDMFlexResult(True, False, False, None, None, "", 0)
    n_payload = (int(hdr[k + 1]) << 8) | int(hdr[k + 2])
    try:
        ms = modem_from_wire(int(hdr[k + 3]))
        crc = crc_from_wire((int(hdr[k + 4]) >> 5) & 0x07)
        fec0 = fec_from_wire(int(hdr[k + 4]) & 0x1F)
        fec1 = fec_from_wire(int(hdr[k + 5]) & 0x1F)
        # geometry computation raises for wire-valid but unimplemented
        # schemes (e.g. user-defined 'arb' constellations) — treat those
        # as a failed header rather than crashing the receiver
        h_syms, p_syms, nh, npd = _frame_geometry(params, n_payload, crc,
                                                  fec0, fec1, ms)
    except (ValueError, KeyError):
        return OFDMFlexResult(True, False, False, None, None, "", 0)
    r2 = ofdm_frame_sync(params, x, nh + npd, threshold=threshold)
    if not r2.detected or r2.data_syms is None:
        return OFDMFlexResult(True, True, False, hdr[:k], None, ms,
                              n_payload)
    # payload starts on a fresh OFDM symbol after the header block
    p_stream = r2.data_syms[nh:].reshape(-1)[:p_syms]
    p_enc_len = packetizer_compute_enc_msg_len(n_payload, crc, fec0, fec1)
    p_enc = _bytes_from_syms(p_stream, ms, p_enc_len)
    payload, ok = packetizer_decode(p_enc, n_payload, crc, fec0, fec1)
    return OFDMFlexResult(True, True, bool(ok), hdr[:k], payload, ms,
                          n_payload)
