"""Packetizer: CRC + two FEC stages + interleaving, byte-exact with the
reference pipeline.

Reference analog (studied, not copied): reference src/fec/src/
packetizer.c:39-80 (length computation), packetizer_encode (:~200):
msg -> append CRC -> fec0 encode -> interleave(enc0_len) -> fec1 encode
-> interleave(enc1_len); decode runs the plan in reverse.  Interleaver
depth is 0 (pass-through) for a LIQUID_FEC_NONE stage
(packetizer.c:132-133).
"""
from __future__ import annotations

import numpy as np

from .crc import crc_sizeof_key, crc_generate_key, crc_validate_message
from . import dispatch as _fec
from .interleave import interleave, deinterleave

__all__ = ["packetizer_compute_enc_msg_len", "packetizer_compute_dec_msg_len",
           "packetizer_encode", "packetizer_decode",
           "packetizer_decode_soft"]


def _plan(msg_len: int, crc: str, fec0: str, fec1: str):
    k = msg_len + crc_sizeof_key(crc)
    stages = []
    n0 = k
    for fs in (fec0, fec1):
        enc_len = _fec.fec_get_enc_msg_length(fs, n0)
        depth = 0 if fs == "none" else 4
        stages.append((fs, n0, enc_len, depth))
        n0 = enc_len
    return k, stages


def packetizer_compute_enc_msg_len(msg_len: int, crc: str,
                                   fec0: str, fec1: str) -> int:
    _, stages = _plan(msg_len, crc, fec0, fec1)
    return stages[-1][2]


def packetizer_compute_dec_msg_len(enc_len: int, crc: str,
                                   fec0: str, fec1: str) -> int:
    """Largest msg_len whose encoded length fits enc_len
    (reference packetizer.c:58-80)."""
    n_hat = 0
    while True:
        k_hat = packetizer_compute_enc_msg_len(n_hat, crc, fec0, fec1)
        if k_hat >= enc_len:
            return n_hat
        n_hat += 1


def packetizer_encode(msg, crc: str = "crc32", fec0: str = "none",
                      fec1: str = "none") -> np.ndarray:
    msg = np.asarray(msg, np.uint8)
    k, stages = _plan(len(msg), crc, fec0, fec1)
    # append CRC key big-endian (reference packetizer_encode:~210)
    key = crc_generate_key(crc, msg)
    nk = crc_sizeof_key(crc)
    buf = np.concatenate([msg, np.asarray(
        [(key >> (8 * (nk - 1 - i))) & 0xFF for i in range(nk)], np.uint8)])
    for fs, dec_len, enc_len, depth in stages:
        buf = _fec.fec_encode(fs, buf[:dec_len])
        buf = interleave(buf, depth=depth)
    return buf


def packetizer_decode(pkt, msg_len: int, crc: str = "crc32",
                      fec0: str = "none", fec1: str = "none"):
    """Returns (msg, crc_ok)."""
    pkt = np.asarray(pkt, np.uint8)
    k, stages = _plan(msg_len, crc, fec0, fec1)
    buf = pkt
    for fs, dec_len, enc_len, depth in reversed(stages):
        buf = deinterleave(buf[:enc_len], depth=depth)
        buf = _fec.fec_decode(fs, buf, dec_len)
    nk = crc_sizeof_key(crc)
    msg = buf[:msg_len]
    key = 0
    for b in buf[msg_len: msg_len + nk].tolist():
        key = (key << 8) | int(b)
    return msg, crc_validate_message(crc, msg, key)


def packetizer_decode_soft(llr_bits, msg_len: int, crc: str = "crc32",
                           fec0: str = "none", fec1: str = "none"):
    """Soft-decision decode: llr_bits is a float array of 8*enc_len
    per-bit metrics (positive = bit 1).  The outer FEC stage decodes
    soft (soft Viterbi for convolutional schemes; hard slicing fallback
    otherwise, as in the reference fec_decode_soft); the inner stage is
    hard (reference packetizer.c:336-390).  One deliberate improvement
    over the reference: when the outer stage is 'none' (a pure
    pass-through — depth-0 interleave, identity code) the LLRs are
    forwarded intact and the INNER stage decodes soft, instead of
    hard-slicing at the pass-through as packetizer.c does.
    Returns (msg, crc_ok)."""
    from .interleave import deinterleave_soft
    from . import dispatch as _fec_mod
    llr_bits = np.asarray(llr_bits, np.float32)
    k, stages = _plan(msg_len, crc, fec0, fec1)
    (fs0, dec0, enc0, depth0), (fs1, dec1, enc1, depth1) = stages
    if len(llr_bits) < 8 * enc1:
        raise ValueError(f"expected {8*enc1} soft bits, got {len(llr_bits)}")
    if fs1 == "none":
        # pass-through outer stage: keep the metrics soft for the inner
        # decoder (strictly better than the reference's hard slice)
        soft = deinterleave_soft(llr_bits[: 8 * enc0], depth=depth0)
        buf = _fec_mod.fec_decode_soft(fs0, soft, dec0)
    else:
        # outer: soft deinterleave + soft decode (soft Viterbi for conv,
        # max-correlation codeword search for Hamming/Golay/rep)
        soft = deinterleave_soft(llr_bits[: 8 * enc1], depth=depth1)
        buf = _fec_mod.fec_decode_soft(fs1, soft, dec1)
        # inner: hard
        buf = deinterleave(buf[:enc0], depth=depth0)
        buf = _fec_mod.fec_decode(fs0, buf, dec0)
    nk = crc_sizeof_key(crc)
    msg = buf[:msg_len]
    key = 0
    for b in buf[msg_len: msg_len + nk].tolist():
        key = (key << 8) | int(b)
    return msg, crc_validate_message(crc, msg, key)


def pack_bits_arr(bits):
    from .block import pack_bits
    return pack_bits(bits)
