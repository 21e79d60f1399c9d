"""Quantization: mu-law companding and fixed-point ADC/DAC.

Reference analog (studied, not copied): reference src/quantization/src/
compand.c:35-60 (mu-law compress/expand, complex variant) and
quantizer.c (quantize_adc/dac with b-bit resolution).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["compress_mulaw", "expand_mulaw", "compress_cf_mulaw",
           "expand_cf_mulaw", "quantize_adc", "quantize_dac"]


def compress_mulaw(x, mu: float = 255.0):
    """y = sign(x) log(1+mu|x|)/log(1+mu) (reference compand.c:35)."""
    if mu <= 0:
        raise ValueError("mu must be positive")
    x = jnp.asarray(x)
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / np.log1p(mu)


def expand_mulaw(y, mu: float = 255.0):
    """Inverse companding (reference compand.c:47)."""
    if mu <= 0:
        raise ValueError("mu must be positive")
    y = jnp.asarray(y)
    return jnp.sign(y) * ((1 + mu) ** jnp.abs(y) - 1) / mu


def compress_cf_mulaw(x, mu: float = 255.0):
    """Complex variant: compand the magnitude (reference compand.c:59)."""
    x = jnp.asarray(x)
    r = jnp.abs(x)
    return jnp.where(r > 0, x / jnp.maximum(r, 1e-30) *
                     compress_mulaw(r, mu), 0.0)


def expand_cf_mulaw(y, mu: float = 255.0):
    y = jnp.asarray(y)
    r = jnp.abs(y)
    return jnp.where(r > 0, y / jnp.maximum(r, 1e-30) *
                     expand_mulaw(r, mu), 0.0)


def quantize_adc(x, bits: int):
    """Quantize x in [-1,1) to signed b-bit integers (reference
    quantizer.c quantize_adc)."""
    if not (1 <= bits <= 32):
        raise ValueError("bits must be in [1, 32]")
    scale = 1 << (bits - 1)
    q = jnp.clip(jnp.floor(jnp.asarray(x) * scale),
                 -scale, scale - 1)
    return q.astype(jnp.int32)


def quantize_dac(q, bits: int):
    """Inverse: integers -> midpoint float values."""
    if not (1 <= bits <= 32):
        raise ValueError("bits must be in [1, 32]")
    scale = 1 << (bits - 1)
    return (jnp.asarray(q).astype(jnp.float32) + 0.5) / scale
