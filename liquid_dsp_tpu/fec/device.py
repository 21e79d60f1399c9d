"""Device-resident soft block-FEC decode: the byte-plane decode matmul
ON the TPU, where it belongs inside a receiver pipeline.

The host byte path (`fec/block.py`) stays the right tool for packet
assembly, but a streaming receiver that has already produced corrected
payload SYMBOLS on device (framing/stream_rx.py) should not round-trip
them to the host just to run a [nsym, n] @ [n, 2^k] correlation — that
matmul is exactly MXU-shaped.  This module builds, per qpacketmodem
configuration, a jittable decoder:

    symbols [..., nsym_mod] complex
      -> exact max-log LLRs (modem.demodulate_soft, on device)
      -> bit-level deinterleave as ONE static-index gather (the
         reference interleaver's depth-4 byte/bit-mask swap cascade is
         a fixed bit permutation for a given length; precomputed host-
         side by pushing an index ramp through deinterleave_soft —
         static numpy index arrays are the TPU-safe gather form)
      -> [..., ncw, n] @ [n, 2^k] codebook correlation on the MXU
         (Precision.HIGHEST: scores feed an argmax, and one-pass-bf16
         error can flip borderline codeword decisions)
      -> argmax -> k-bit message indices [..., ncw] int32

plus a small host `finish` that packs message bits to bytes and checks
the CRC (byte packing + CRC are O(bytes) and control-flow-bound — the
reference's own callback hands bytes to host user code anyway,
src/framing/src/framesync64.c:68-70).

Soft max-correlation decode is the reference's own soft criterion
(fecsoft_hamming74_decode and friends minimize soft distance —
identical argmax); it is strictly stronger than the hard-decision path
under noise, so frames the hard decoder loses can still decode.

Reference analogs: fec soft decode dispatch src/fec/src/fec.c,
qpacketmodem_decode_soft src/framing/src/qpacketmodem.c:297-316.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

from .block import _GCOLS, _code_matrices
from .crc import crc_sizeof_key, crc_validate_message
from .packetizer import packetizer_compute_enc_msg_len
from .interleave import deinterleave_soft
from .dispatch import fec_get_enc_msg_length

__all__ = ["qpacket_soft_decoder", "packetizer_soft_decoder",
           "block_codebook"]


@functools.lru_cache(maxsize=16)
def block_codebook(scheme: str):
    """(bipolar codebook [n, 2^k] float32, n, k) for a block scheme.
    bip[:, m] = 2*G(m) - 1 where G(m) is message m's codeword."""
    n, k, _ = _GCOLS[scheme]
    G, _, _ = _code_matrices(scheme)
    msgs = ((np.arange(1 << k)[:, None] >>
             np.arange(k - 1, -1, -1)) & 1).astype(np.uint8)
    C = (msgs @ G) % 2                       # [2^k, n]
    return (2.0 * C.T - 1.0).astype(np.float32), n, k


@functools.lru_cache(maxsize=16)
def _deint_perm(enc_len: int) -> np.ndarray:
    """Bit-level deinterleave permutation for an enc_len-byte packet:
    out_bit[i] = in_bit[perm[i]] (static int32 index array)."""
    ramp = np.arange(8 * enc_len, dtype=np.float32)
    return np.asarray(deinterleave_soft(ramp), np.float32).astype(np.int32)


def _golay_pack(msgs: np.ndarray, dec_len: int) -> np.ndarray:
    """Pack 12-bit message indices into bytes, two messages -> 3 bytes
    (mirrors fec/block.py golay byte layout); msgs [..., ncw]."""
    full, rem = divmod(dec_len, 3)
    m0 = msgs[..., 0:2 * full:2]
    m1 = msgs[..., 1:2 * full:2]
    out = np.zeros(msgs.shape[:-1] + (dec_len,), np.uint8)
    out[..., 0:3 * full:3] = (m0 >> 4) & 0xFF
    out[..., 1:3 * full:3] = ((m0 & 0x0F) << 4) | ((m1 >> 8) & 0x0F)
    out[..., 2:3 * full:3] = m1 & 0xFF
    for i in range(rem):
        out[..., 3 * full + i] = msgs[..., 2 * full + i] & 0xFF
    return out


def packetizer_soft_decoder(payload_len: int, crc: str = "crc24",
                            fec0: str = "none", fec1: str = "golay2412"):
    """Build (device_fn, finish) for a PACKETIZER configuration whose
    outer code is a block scheme and inner code is none.

    device_fn(llr [..., >= 8*enc_len] float, positive = bit 1) ->
      msgs [..., ncw] int32 — fully jittable; callers that demodulate
      their own soft bits (GMSK phase-derivative MF) feed them here.
    finish(msgs numpy [..., ncw]) -> (payload [..., payload_len] uint8,
      crc_ok [...] bool) — host byte packing + CRC.
    """
    if fec0 != "none":
        raise ValueError("device decoder supports fec0='none' "
                         "(frame64/flexframe default payload shape)")
    if fec1 not in _GCOLS:
        raise ValueError(f"outer scheme {fec1!r} is not a block code")
    if _GCOLS[fec1][1] > 16:
        # hamming3126's 31 x 2^26 codebook does not fit anywhere useful
        raise ValueError(f"{fec1!r} codebook too large for the matmul "
                         "decoder (k > 16)")
    dec_len = payload_len + crc_sizeof_key(crc)
    enc_len = fec_get_enc_msg_length(fec1, dec_len)
    assert enc_len == packetizer_compute_enc_msg_len(
        payload_len, crc, fec0, fec1)
    bip, n, k = block_codebook(fec1)
    if fec1 == "golay2412":
        rem = dec_len % 3
        ncw = 2 * (dec_len // 3) + rem
    else:
        ncw = -(-(8 * dec_len) // k)
    perm = _deint_perm(enc_len)              # [8*enc_len] int32, static
    need = 8 * enc_len

    def device_fn(llr):
        flat = jnp.asarray(llr)
        if flat.shape[-1] < need:
            pad = [(0, 0)] * (flat.ndim - 1) + [(0, need - flat.shape[-1])]
            flat = jnp.pad(flat, pad)
        deint = flat[..., :need][..., jnp.asarray(perm)]
        # 8*enc_len may exceed ncw*n by the final byte's pad bits
        cw = deint[..., :ncw * n].reshape(deint.shape[:-1] + (ncw, n))
        scores = jnp.einsum("...cn,nm->...cm", cw, jnp.asarray(bip),
                            precision=lax.Precision.HIGHEST)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)

    def finish(msgs):
        msgs = np.asarray(msgs)
        if fec1 == "golay2412":
            buf = _golay_pack(msgs, dec_len)
        else:
            bits = ((msgs[..., None] >>
                     np.arange(k - 1, -1, -1)) & 1).astype(np.uint8)
            bits = bits.reshape(msgs.shape[:-1] + (ncw * k,))[..., :8 * dec_len]
            buf = np.packbits(bits, axis=-1)[..., :dec_len]
        payload = buf[..., :payload_len]
        nk = crc_sizeof_key(crc)
        flat = buf.reshape(-1, dec_len)
        ok = np.zeros(flat.shape[0], bool)
        for r in range(flat.shape[0]):
            key = 0
            for b in flat[r, payload_len:payload_len + nk]:
                key = (key << 8) | int(b)
            ok[r] = crc_validate_message(crc, flat[r, :payload_len], key)
        return payload, ok.reshape(buf.shape[:-1])

    return device_fn, finish


def qpacket_soft_decoder(payload_len: int, crc: str = "crc24",
                         fec0: str = "none", fec1: str = "golay2412",
                         ms: str = "qpsk"):
    """Build (device_fn, finish) for a qpacketmodem configuration whose
    outer code is a block scheme and inner code is none (the frame64 /
    default flexframe payload shape): the packetizer decoder above with
    the modem's exact max-log soft demodulator in front.

    device_fn(symbols [..., nsym_mod] complex) -> msgs [..., ncw] int32
      — fully jittable, batches over leading axes (channels, slots).
    finish(msgs numpy [..., ncw]) -> (payload [..., payload_len] uint8,
      crc_ok [...] bool) — host byte packing + CRC.
    """
    from ..modem.linear import constellation

    llr_fn, finish = packetizer_soft_decoder(payload_len, crc, fec0, fec1)
    # complex64 cast: constellation() can promote to complex128 under
    # NEP-50 and a c128 device_put is UNIMPLEMENTED on the axon tunnel
    table = np.asarray(constellation(ms), np.complex64)

    def device_fn(symbols):
        from ..modem.linear import demodulate_soft
        llr = demodulate_soft(jnp.asarray(table), symbols)  # [.., T, bps]
        return llr_fn(llr.reshape(llr.shape[:-2] + (-1,)))

    return device_fn, finish
