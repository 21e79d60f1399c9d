"""qpacketmodem: packetizer + modem combo (bytes <-> modulated symbols)
and qpilotgen/qpilotsync (pilot insertion / carrier recovery).

Reference analogs (studied, not copied):
  * qpacketmodem — src/framing/src/qpacketmodem.c:38-300: packetizer
    (CRC + FEC stages) -> MSB-first bit stream -> modem symbols.
  * qpilotgen    — src/framing/src/qpilotgen.c:40-140: one pilot every
    `spacing` symbols; pilots are QPSK points from a default m-sequence.
  * qpilotsync   — src/framing/src/qpilotsync.c:104-243: FFT of
    pilot-derotated sequence -> quadratic-interpolated peak -> carrier
    frequency/phase/gain estimates; derotates the payload.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fec.packetizer import (packetizer_encode, packetizer_decode,
                              packetizer_compute_enc_msg_len)
from ..fec.block import unpack_bits, pack_bits
from ..modem import (constellation, bits_per_symbol, modulate, demodulate,
                     demodulate_soft)
from ..utils.sequence import MSequence

__all__ = [
    "qpacketmodem_decode_soft","qpacketmodem_frame_len", "qpacketmodem_encode",
           "qpacketmodem_decode", "qpilot_pilots", "qpilot_frame_len",
           "qpilotgen", "qpilotsync"]


def qpacketmodem_frame_len(payload_len: int, crc: str, fec0: str,
                           fec1: str, ms: str) -> int:
    """Number of modulated symbols for a payload (reference
    qpacketmodem.c:144-160)."""
    enc_len = packetizer_compute_enc_msg_len(payload_len, crc, fec0, fec1)
    bps = bits_per_symbol(ms)
    return -(-(8 * enc_len) // bps)


def qpacketmodem_encode(payload, crc: str = "crc24", fec0: str = "none",
                        fec1: str = "golay2412", ms: str = "qpsk"):
    """bytes -> complex symbols (reference qpacketmodem_encode)."""
    enc = packetizer_encode(np.asarray(payload, np.uint8), crc, fec0, fec1)
    bps = bits_per_symbol(ms)
    bits = unpack_bits(enc)
    nsym = -(-len(bits) // bps)
    bits = np.concatenate([bits, np.zeros(nsym * bps - len(bits), np.uint8)])
    syms = bits.reshape(nsym, bps) @ (1 << np.arange(bps - 1, -1, -1))
    return modulate(constellation(ms), jnp.asarray(syms))


def qpacketmodem_decode_soft(symbols, payload_len: int,
                             crc: str = "crc24", fec0: str = "none",
                             fec1: str = "golay2412", ms: str = "qpsk"):
    """Soft-decision decode: per-bit LLRs from the modem's exact max-log
    demodulator feed the packetizer's soft path (soft Viterbi or
    max-correlation block decode for the outer FEC; reference
    qpacketmodem_decode_soft, qpacketmodem.c:297-316).
    Returns (payload bytes, crc_ok)."""
    from ..modem import demodulate_soft
    from ..fec.packetizer import packetizer_decode_soft
    table = constellation(ms)
    bps = bits_per_symbol(ms)
    llrs = np.asarray(demodulate_soft(table, jnp.asarray(symbols)))
    bits = llrs.reshape(-1)  # [n_syms * bps], positive = 1
    enc_len = packetizer_compute_enc_msg_len(payload_len, crc, fec0, fec1)
    need = 8 * enc_len
    if len(bits) < need:
        bits = np.concatenate([bits, np.zeros(need - len(bits),
                                              np.float32)])
    return packetizer_decode_soft(bits[:need], payload_len, crc, fec0,
                                  fec1)


def qpacketmodem_decode(symbols, payload_len: int, crc: str = "crc24",
                        fec0: str = "none", fec1: str = "golay2412",
                        ms: str = "qpsk"):
    """complex symbols -> (payload bytes, crc_ok) (reference
    qpacketmodem_decode)."""
    table = constellation(ms)
    bps = bits_per_symbol(ms)
    s = np.asarray(demodulate(table, jnp.asarray(symbols)))
    bits = ((s[:, None] >> np.arange(bps - 1, -1, -1)) & 1).astype(np.uint8)
    enc_len = packetizer_compute_enc_msg_len(payload_len, crc, fec0, fec1)
    enc = pack_bits(bits.reshape(-1))[:enc_len]
    return packetizer_decode(enc, payload_len, crc, fec0, fec1)


# ---------------------------------------------------------------------------
# pilots


def _num_pilots(payload_len: int, spacing: int) -> int:
    q, r = divmod(payload_len, spacing - 1)
    return q + (1 if r else 0)


def qpilot_frame_len(payload_len: int, spacing: int) -> int:
    return payload_len + _num_pilots(payload_len, spacing)


def qpilot_pilots(payload_len: int, spacing: int) -> np.ndarray:
    """Pilot sequence: QPSK points from the default m-sequence of order
    nextpow2(num_pilots) (reference qpilotgen.c:96-112)."""
    npil = _num_pilots(payload_len, spacing)
    m = max(2, int(np.ceil(np.log2(npil))))
    seq = MSequence(m)
    s = np.asarray([seq.generate_symbol(2) for _ in range(npil)])
    theta = 2 * np.pi * s / 4.0 + np.pi / 4.0
    return np.exp(1j * theta).astype(np.complex64)


def qpilotgen(payload_syms, spacing: int = 21):
    """Insert pilots every `spacing` symbols (reference
    qpilotgen_execute)."""
    payload_syms = np.asarray(payload_syms)
    n = len(payload_syms)
    pilots = qpilot_pilots(n, spacing)
    frame_len = n + len(pilots)
    out = np.zeros(frame_len, np.complex64)
    mask = np.arange(frame_len) % spacing == 0
    out[mask] = pilots
    out[~mask] = payload_syms
    return out


def qpilotsync(frame_syms, payload_len: int, spacing: int = 21):
    """Estimate and remove carrier offset/phase/gain using the pilots;
    returns (payload_syms, dphi_hat, phi_hat, gain_hat)
    (reference qpilotsync_execute:175-243)."""
    frame_syms = np.asarray(frame_syms)
    frame_len = len(frame_syms)
    pilots = qpilot_pilots(payload_len, spacing)
    npil = len(pilots)
    mask = np.arange(frame_len) % spacing == 0
    rx_pilots = frame_syms[mask][:npil]
    v = rx_pilots * np.conj(pilots)
    nfft = 1 << int(np.ceil(np.log2(npil + (npil >> 1))))
    V = np.fft.fft(v, nfft)
    mag = np.abs(V)
    i0 = int(np.argmax(mag))
    y0 = mag[i0]
    ypos = mag[(i0 + 1) % nfft]
    yneg = mag[(i0 - 1) % nfft]
    a = 0.5 * (ypos + yneg) - y0
    b = 0.5 * (ypos - yneg)
    idx = -b / (2 * a) if a != 0 else 0.0
    index = i0 + idx
    if i0 > nfft / 2:
        index -= nfft
    dphi_hat = index * 2 * np.pi / (nfft * spacing)
    # phase/gain: de-rotate pilots and average (reference METHOD 2)
    metric = np.sum(v * np.exp(-1j * dphi_hat * np.arange(npil) * spacing))
    phi_hat = float(np.angle(metric))
    g_hat = float(np.abs(metric)) / npil
    i_all = np.arange(frame_len)
    corr = np.exp(-1j * (dphi_hat * i_all + phi_hat)) / g_hat
    payload = (frame_syms * corr)[~mask][:payload_len]
    return payload.astype(np.complex64), float(dphi_hat), phi_hat, g_hat
