"""Pallas TPU kernel: fused codebook-correlation + argmax soft decode.

The device block-FEC decoder scores every candidate codeword against the
received soft bits (max-log ML: scores = cw @ codebook, argmax — the
reference decodes per byte on the CPU, fec_golay2412.c) and the XLA
formulation materializes the scores tensor [..., ncw, 2^k] in HBM:
16 KB of score traffic per 12 decoded bits for Golay(24,12), which caps
the decoder at ~350 Mbit/s on chip — BELOW one C thread's soft decoder
(tests/baseline_perop.json fecsoft_golay2412_dec ~500 Mbit/s).

This kernel keeps the scores in VMEM: per 128-codeword tile it runs the
[128, n] x [n, K] MXU matmul and reduces to (argmax) indices in-kernel,
so HBM sees only the soft-bit windows in (~n floats/cw) and one int32
out — ~170x less traffic than the XLA schedule for K=4096.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["codebook_argmax"]

TM = 128      # codewords per matmul chunk (scores chunk [TM, K] in VMEM)
SUB = 8       # chunks per grid step -> (SUB, TM) int32 output block


def _kernel(cw_ref, bip_ref, idx_ref):
    # cw_ref [SUB*TM, n], bip_ref [n, K] -> idx_ref [SUB, TM] int32
    for r in range(SUB):     # static unroll; scores stay in VMEM
        s = jnp.dot(cw_ref[r * TM:(r + 1) * TM, :], bip_ref[:],
                    preferred_element_type=jnp.float32)   # [TM, K]
        idx_ref[r, :] = jnp.argmax(s, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(cwf, bip, interpret: bool = False):
    M, n = cwf.shape
    K = bip.shape[1]
    G = SUB * TM
    grid = (M // G,)
    idx = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((M // TM, TM), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, TM), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cwf, bip)
    return idx.reshape(M)


def codebook_argmax(cw, bip, interpret: bool = False):
    """argmax(cw @ bip, axis=-1) without materializing scores in HBM.

    cw: [..., ncw, n] float32 soft bits (+1/-1 LLR signs x magnitudes);
    bip: [n, K] float32 +-1 codebook (K = 2^k candidates).
    Returns [..., ncw] int32 — identical to the einsum+argmax result
    (same f32 scores, same first-index tie-breaking).
    """
    cw = jnp.asarray(cw)
    bip = jnp.asarray(bip)
    lead = cw.shape[:-1]
    n = cw.shape[-1]
    M = 1
    for d in lead:
        M = M * d
    cwf = cw.reshape(M, n)
    Mp = -(-M // (SUB * TM)) * (SUB * TM)
    if Mp != M:
        cwf = jnp.pad(cwf, ((0, Mp - M), (0, 0)))
    idx = _call(cwf, bip, interpret=interpret)
    return idx[:M].reshape(lead)
