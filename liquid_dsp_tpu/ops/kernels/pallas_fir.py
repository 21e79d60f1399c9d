"""Pallas TPU kernel: FIR filtering as banded MXU matmuls.

The reference's hot loop is the SIMD dot product (reference
src/dotprod/src/dotprod_crcf.mmx.c:171-196); the TPU-native equivalent
maps the FIR onto the 128x128 systolic array (SURVEY.md §2.1 "TPU
mapping"): each 128-sample output tile is one [1, TILE+L-1] x
[TILE+L-1, TILE] matmul against a banded tap matrix
    Hband[i, t] = h[t + L - 1 - i],
so the whole filter runs at MXU speed with no gather in the inner loop.
Complex data is processed as separate real/imag planes (real taps filter
each plane independently; complex taps use the 3-matmul split).

The kernel is grid-parallel over (row-block, time-tile); inputs are
pre-overlapped windows prepared by one XLA slice pass (1 + L/TILE data
expansion), keeping the Pallas side free of halo DMA logic.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fir_pallas_real", "fir_apply_pallas", "make_banded_taps"]

TILE = 128      # output samples per MXU matmul
ROWS = 8        # row-block (sublane) granularity


def make_banded_taps(h: np.ndarray) -> np.ndarray:
    """Banded matrix [L+TILE-1, TILE] with Hband[i, t] = h[t+L-1-i]."""
    h = np.asarray(h, np.float32)
    L = len(h)
    K = L + TILE - 1
    Hb = np.zeros((K, TILE), np.float32)
    for t in range(TILE):
        Hb[t: t + L, t] = h[::-1]
    return Hb


def _fir_kernel(x_ref, h_ref, o_ref):
    # x_ref: [ROWS, K] window rows; h_ref: [K, TILE]; o_ref: [ROWS, TILE]
    o_ref[:] = jnp.dot(x_ref[:], h_ref[:],
                       preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fir_pallas_real(xp, Hb, interpret: bool = False):
    """Filter real rows: xp [R, T + L - 1] (pre-padded with the carry
    prefix), Hb [K, TILE] banded taps.  Returns y [R, T].

    R and T must be multiples of ROWS and TILE (pad upstream).
    """
    R, Text = xp.shape
    K = Hb.shape[0]
    T = Text - (K - TILE)
    n_tiles = T // TILE
    # pre-overlapped windows: [R, n_tiles, K]
    idx = (jnp.arange(n_tiles) * TILE)[:, None] + jnp.arange(K)[None, :]
    win = jnp.take(xp, idx, axis=-1)              # [R, n_tiles, K]
    win = jnp.swapaxes(win, 0, 1)                 # [n_tiles, R, K]

    grid = (n_tiles, R // ROWS)
    y = pl.pallas_call(
        _fir_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, R, TILE), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ROWS, K), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TILE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS, TILE), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(win, Hb)
    # [n_tiles, R, TILE] -> [R, T]
    return jnp.swapaxes(y, 0, 1).reshape(R, T)


def fir_apply_pallas(h: np.ndarray, carry, x, interpret: bool = False):
    """Drop-in FIR block step for complex input with real taps.

    x: [..., T]; carry: [..., L-1] input tail.  Returns (y, carry') with
    identical semantics to ops.fir.fir_apply (stride 1).
    """
    h = np.asarray(h, np.float32)
    L = len(h)
    Hb = jnp.asarray(make_banded_taps(h))
    xp = jnp.concatenate([carry.astype(x.dtype), x], axis=-1)
    lead = xp.shape[:-1]
    T = x.shape[-1]
    R0 = int(np.prod(lead)) if lead else 1
    flat = xp.reshape(R0, xp.shape[-1])
    # real/imag planes stacked as rows
    planes = jnp.concatenate([flat.real, flat.imag], axis=0)  # [2R0, T+L-1]
    R = planes.shape[0]
    # pad rows to ROWS multiple and T to TILE multiple
    Rp = -(-R // ROWS) * ROWS
    Tp = -(-T // TILE) * TILE
    pad_t = Tp - T
    planes = jnp.pad(planes, ((0, Rp - R), (0, pad_t)))
    y = fir_pallas_real(planes, Hb, interpret=interpret)
    y = y[:R, :T]
    yr, yi = y[:R0], y[R0:]
    out = (yr + 1j * yi).astype(jnp.complex64).reshape(*lead, T)
    new_carry = xp[..., xp.shape[-1] - (L - 1):] if L > 1 else carry
    return out, new_carry
