"""Random distributions and data scrambler.

Reference analogs (studied, not copied): reference src/random/src/
(randf/randnf/randexpf/randweibf/randgammaf/randnakmf/randricekf with
pdf/cdf helpers; API include/liquid.h:6296-6348) and scramble.c:33-59
(fixed 4-byte xor mask cycle).

Distributions are exposed two ways: numpy samplers (host-side test/data
generation) and jax.random samplers (in-graph impairment models).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "randnf", "crandnf", "randexpf", "randweibf", "randgammaf",
    "randnakmf", "randricekf",
    "randnf_pdf", "randexpf_pdf", "randweibf_pdf",
    "scramble_data", "unscramble_data",
    "jax_awgn", "jax_crandn",
]

_MASKS = np.asarray([0xB4, 0x6A, 0x8B, 0xC5], np.uint8)  # scramble.c masks


def scramble_data(data) -> np.ndarray:
    """XOR with the cyclic 4-byte mask (reference scramble_data)."""
    data = np.asarray(data, np.uint8)
    mask = np.resize(_MASKS, data.shape)
    return data ^ mask


def unscramble_data(data) -> np.ndarray:
    """Self-inverse (reference unscramble_data calls scramble_data)."""
    return scramble_data(data)


# --- numpy samplers (Box-Muller etc., matching reference definitions) ---


def randnf(rng=None, size=None):
    rng = rng or np.random.default_rng()
    return rng.standard_normal(size).astype(np.float32)


def crandnf(rng=None, size=None):
    rng = rng or np.random.default_rng()
    return (rng.standard_normal(size) + 1j * rng.standard_normal(size)
            ).astype(np.complex64)


def randexpf(lam: float, rng=None, size=None):
    """Exponential(lambda) (reference randexpf: -ln(1-u)/lambda)."""
    if lam <= 0:
        raise ValueError("exponential rate must be positive")
    rng = rng or np.random.default_rng()
    return (-np.log(1 - rng.uniform(size=size)) / lam).astype(np.float32)


def randweibf(alpha: float, beta: float, gamma: float = 0.0,
              rng=None, size=None):
    """Weibull (reference randweibf parameterization)."""
    rng = rng or np.random.default_rng()
    u = rng.uniform(size=size)
    return (gamma + beta * (-np.log(1 - u)) ** (1.0 / alpha)
            ).astype(np.float32)


def randgammaf(alpha: float, beta: float, rng=None, size=None):
    rng = rng or np.random.default_rng()
    return (rng.gamma(alpha, beta, size=size)).astype(np.float32)


def randnakmf(m: float, omega: float, rng=None, size=None):
    """Nakagami-m (reference randnakmf: sqrt of gamma variate)."""
    rng = rng or np.random.default_rng()
    g = rng.gamma(m, omega / m, size=size)
    return np.sqrt(g).astype(np.float32)


def randricekf(K: float, omega: float, rng=None, size=None):
    """Rice-K fading amplitude (reference randricekf)."""
    rng = rng or np.random.default_rng()
    s = np.sqrt(K * omega / (K + 1))
    sig = np.sqrt(0.5 * omega / (K + 1))
    x = sig * rng.standard_normal(size) + s
    y = sig * rng.standard_normal(size)
    return np.sqrt(x * x + y * y).astype(np.float32)


def randnf_pdf(x, eta=0.0, sig=1.0):
    return (np.exp(-((x - eta) ** 2) / (2 * sig ** 2)) /
            (sig * np.sqrt(2 * np.pi)))


def randexpf_pdf(x, lam):
    x = np.asarray(x)
    return np.where(x < 0, 0.0, lam * np.exp(-lam * x))


def randweibf_pdf(x, alpha, beta, gamma=0.0):
    x = np.asarray(x)
    t = x - gamma
    return np.where(
        t < 0, 0.0,
        (alpha / beta) * (t / beta) ** (alpha - 1) *
        np.exp(-((t / beta) ** alpha)))


# --- jax samplers for in-graph channel models ---


def jax_crandn(key, shape):
    kr, ki = jax.random.split(key)
    return (jax.random.normal(kr, shape) +
            1j * jax.random.normal(ki, shape)).astype(jnp.complex64)


def jax_awgn(key, x, nstd: float):
    return x + (nstd / np.sqrt(2)) * jax_crandn(key, x.shape)
