"""Audio codec: continuously variable slope delta (CVSD) modulation.

Reference analog (studied, not copied): reference src/audio/src/cvsd.c —
1-bit delta modulator with adaptive step: if the last `num_bits` output
bits agree, multiply the step by zeta, else divide; reference tracker
clipped to [-1, 1] (cvsd_encode, cvsd.c).  The per-sample feedback is a
lax.scan.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["cvsd_encode", "cvsd_decode"]


def _params(num_bits: int, zeta: float):
    if num_bits < 2:
        raise ValueError("cvsd num_bits must be at least 2")
    if zeta <= 1.0:
        raise ValueError("cvsd zeta must be greater than 1")
    bitmask = (1 << num_bits) - 1
    delta0 = 0.01
    return bitmask, delta0, 0.001, 0.5  # mask, delta, delta_min, delta_max


def cvsd_encode(audio, num_bits: int = 3, zeta: float = 1.5):
    """Encode float samples [-1,1] -> bits [T] (reference cvsd_encode)."""
    bitmask, d0, dmin, dmax = _params(num_bits, zeta)
    x = jnp.asarray(audio, jnp.float32)

    def step(c, xt):
        ref, delta, bitref = c
        bit = (ref <= xt).astype(jnp.int32)
        bitref = ((bitref << 1) | bit) & bitmask
        agree = (bitref == 0) | (bitref == bitmask)
        delta = jnp.where(agree, delta * zeta, delta / zeta)
        delta = jnp.clip(delta, dmin, dmax)
        ref = jnp.clip(ref + jnp.where(bit == 1, delta, -delta), -1.0, 1.0)
        return (ref, delta, bitref), bit

    init = (jnp.float32(0.0), jnp.float32(d0), jnp.int32(0))
    _, bits = lax.scan(step, init, x)
    return np.asarray(bits, np.uint8)


def cvsd_decode(bits, num_bits: int = 3, zeta: float = 1.5):
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
    _, audio = lax.scan(step, init, b)
    return np.asarray(audio, np.float32)
