"""Audio codec: continuously variable slope delta (CVSD) modulation.

Reference analog (studied, not copied): reference src/audio/src/cvsd.c —
1-bit delta modulator with adaptive step: if the last `num_bits` output
bits agree, multiply the step by zeta, else divide (delta clipped to
[0.01, 1.0]); tracker clipped to [-1, 1].  Signal conditioning is
enabled as in the reference build (cvsd.c:33): a pre-emphasis FIR
y[n] = x[n] - alpha x[n-1] before encoding, and a post-emphasis
DC-blocking IIR (b=[1,-1,0], a=[1,-(alpha+beta), alpha beta], beta=0.99)
after decoding.  The per-sample feedback is a lax.scan.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["cvsd_encode", "cvsd_decode"]

_BETA = 0.99  # post-filter DC-blocking parameter (reference cvsd.c:98)


def _params(num_bits: int, zeta: float):
    if num_bits < 1:
        raise ValueError("cvsd num_bits must be positive")
    if zeta <= 1.0:
        raise ValueError("cvsd zeta must be greater than 1")
    bitmask = (1 << num_bits) - 1
    return bitmask, 0.01, 0.01, 1.0  # mask, delta0, delta_min, delta_max


def cvsd_encode(audio, num_bits: int = 3, zeta: float = 1.5,
                alpha: float = 0.95):
    """Encode float samples [-1,1] -> bits [T] (reference cvsd_encode)."""
    bitmask, d0, dmin, dmax = _params(num_bits, zeta)
    x = jnp.asarray(audio, jnp.float32)
    # pre-emphasis FIR: y[n] = x[n] - alpha x[n-1]
    y = x - alpha * jnp.concatenate([jnp.zeros_like(x[..., :1]),
                                     x[..., :-1]], axis=-1)

    def step(c, yt):
        ref, delta, bitref = c
        bit = (ref <= yt).astype(jnp.int32)
        bitref = ((bitref << 1) | bit) & bitmask
        agree = (bitref == 0) | (bitref == bitmask)
        delta = jnp.where(agree, delta * zeta, delta / zeta)
        delta = jnp.clip(delta, dmin, dmax)
        ref = jnp.clip(ref + jnp.where(bit == 1, delta, -delta), -1.0, 1.0)
        return (ref, delta, bitref), bit

    init = (jnp.float32(0.0), jnp.float32(d0), jnp.int32(0))
    _, bits = lax.scan(step, init, y)
    return np.asarray(bits, np.uint8)


def cvsd_decode(bits, num_bits: int = 3, zeta: float = 1.5,
                alpha: float = 0.95):
    """Decode bits -> float samples (reference cvsd_decode)."""
    bitmask, d0, dmin, dmax = _params(num_bits, zeta)
    b = jnp.asarray(np.asarray(bits, np.int32))

    def step(c, bit):
        ref, delta, bitref = c
        bitref = ((bitref << 1) | bit) & bitmask
        agree = (bitref == 0) | (bitref == bitmask)
        delta = jnp.where(agree, delta * zeta, delta / zeta)
        delta = jnp.clip(delta, dmin, dmax)
        ref = jnp.clip(ref + jnp.where(bit == 1, delta, -delta), -1.0, 1.0)
        return (ref, delta, bitref), ref

    init = (jnp.float32(0.0), jnp.float32(d0), jnp.int32(0))
    _, ref = lax.scan(step, init, b)
    # post-emphasis IIR (DF2T): b=[1,-1,0], a=[1,-(alpha+beta), alpha*beta]
    a1 = -(alpha + _BETA)
    a2 = alpha * _BETA

    def pstep(c, xt):
        v0, v1 = c
        yt = xt + v0
        v0n = -xt - a1 * yt + v1
        v1n = -a2 * yt
        return (v0n, v1n), yt

    _, audio = lax.scan(pstep, (jnp.float32(0), jnp.float32(0)), ref)
    return np.asarray(audio, np.float32)
