"""Unified FEC dispatch across all scheme families
(reference src/fec/src/fec.c fec_create/encode/decode dispatch :475+).
"""
from __future__ import annotations

import numpy as np

from . import block as _block
from . import conv as _conv
from . import rs as _rs

__all__ = ["FEC_SCHEMES", "fec_get_enc_msg_length", "fec_encode",
           "fec_decode", "fec_get_rate"]

FEC_SCHEMES = _block.FEC_SCHEMES + _conv.CONV_SCHEMES + ("rs8",)


def fec_get_enc_msg_length(scheme: str, dec_len: int) -> int:
    scheme = scheme.lower()
    if scheme in _conv.CONV_SCHEMES:
        return _conv.conv_get_enc_msg_length(scheme, dec_len)
    if scheme == "rs8":
        return _rs.rs_get_enc_msg_length(dec_len)
    return _block.fec_get_enc_msg_length(scheme, dec_len)


def fec_encode(scheme: str, msg) -> np.ndarray:
    scheme = scheme.lower()
    if scheme in _conv.CONV_SCHEMES:
        return _conv.conv_encode(scheme, msg)
    if scheme == "rs8":
        return _rs.rs_encode(msg)
    return _block.fec_encode(scheme, msg)


def fec_decode(scheme: str, enc, dec_len: int) -> np.ndarray:
    scheme = scheme.lower()
    if scheme in _conv.CONV_SCHEMES:
        return _conv.conv_decode(scheme, enc, dec_len)
    if scheme == "rs8":
        msg, _ = _rs.rs_decode(enc, dec_len)
        return msg
    return _block.fec_decode(scheme, enc, dec_len)


def fec_decode_soft(scheme: str, llr, dec_len: int) -> np.ndarray:
    """Soft-decision decode where the scheme supports it (reference
    fec_decode_soft dispatch, fec.c): convolutional codes run soft
    Viterbi, Hamming/Golay run maximum-correlation codeword search,
    repetition codes sum the metrics.  Other schemes slice hard.

    llr: float per-bit metrics for the ENCODED bits (positive = 1).
    """
    scheme = scheme.lower()
    llr = np.asarray(llr, np.float32)
    if scheme in _conv.CONV_SCHEMES:
        return _conv.conv_decode(scheme, None, dec_len, soft=llr)
    if scheme in ("hamming74", "hamming84", "hamming128", "hamming1511",
                  "hamming3126", "golay2412"):
        return _block._block_decode_soft(scheme, llr, dec_len)
    if scheme == "rep3":
        return _block._rep_decode_soft(3, llr, dec_len)
    if scheme == "rep5":
        return _block._rep_decode_soft(5, llr, dec_len)
    hard = _block.pack_bits((llr > 0).astype(np.uint8))
    n_enc = fec_get_enc_msg_length(scheme, dec_len)
    return fec_decode(scheme, hard[:n_enc], dec_len)


def fec_get_rate(scheme: str) -> float:
    return 1024 / fec_get_enc_msg_length(scheme, 1024)
