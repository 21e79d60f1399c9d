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


def fec_get_rate(scheme: str) -> float:
    return 1024 / fec_get_enc_msg_length(scheme, 1024)
