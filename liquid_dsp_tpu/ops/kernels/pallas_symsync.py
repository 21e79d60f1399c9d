"""Pallas TPU kernel: the symsync timing loop as ONE in-VMEM scan.

The hoisted-MF symsync (ops/symsync.py) reduced the lax.scan body to
the timing-loop arithmetic plus a one-hot read of precomputed branch
outputs — but XLA still dispatches ~40 small VPU ops per scan step, and
that per-step overhead IS the sequential family's throughput wall
(PERF.md r4/r5).  This kernel runs the whole loop inside one Pallas
program: state lives in VMEM scratch across a sequential time-tile
grid, each step is straight-line VPU code, and the branch outputs
stream through VMEM tiles.

Layout: batch B on sublanes, the 2*G*npfb branch-output channels on
lanes (G=2 planes for complex input -> 128 lanes at npfb=32 — exactly
one vreg row).  The one-hot selection is four masked lane reductions.

Equivalence: same update expressions as ops/symsync._timing_update
(the round-half-even branch quantizer is emulated exactly);
tests/test_symsync_misc.py asserts kernel == scan on CPU (interpret)
and tools/check_onchip_goldens.py replays it on hardware.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["symsync_scan_pallas"]

TS = 32          # time steps per grid tile


def _round_half_even(x):
    """jnp.round (round-half-to-even) from floor — Mosaic-safe."""
    f = jnp.floor(x)
    r = x - f
    odd = jnp.mod(f, 2.0) >= 1.0
    up = (r > 0.5) | ((r == 0.5) & odd)
    return f + up.astype(x.dtype)


def _make_kernel(npfb: int, G: int, max_out: int, k: int, k_out: int,
                 bw: float, locked: bool, B: int, L: int, ng: int):
    C_B0 = 0.22 * bw
    C_A0 = 1.0 - 0.5 * (1.0 - bw)
    C_A1 = -0.495 * (1.0 - bw)
    rate_adj = 0.5 * bw
    cplx = G == 4

    def kernel(ma_ref, fs_ref, is_ref, yre_ref, yim_ref, val_ref,
               fso_ref, iso_ref, fscr, iscr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            fscr[:] = fs_ref[:]
            iscr[:] = is_ref[:]

        lane = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        branch = jnp.mod(lane, npfb)
        group = lane // npfb

        def step(t, _):
            ma = ma_ref[t]                       # [B, L]
            tau = fscr[0]
            rate = fscr[1]
            dl = fscr[2]
            v0 = fscr[3]
            bf = fscr[4]
            b = iscr[0]
            decim = iscr[1]
            for e in range(max_out):
                active = b < npfb
                bc = jnp.clip(b, 0, npfb - 1)
                oh = (branch == bc[:, None]).astype(jnp.float32) * ma
                sel = [jnp.sum(jnp.where(group == g, oh, 0.0), axis=1)
                       for g in range(G)]
                if cplx:
                    mf_re, dmf_re, mf_im, dmf_im = sel
                    q_raw = mf_re * dmf_re + mf_im * dmf_im
                else:
                    mf_re, dmf_re = sel
                    mf_im = jnp.zeros_like(mf_re)
                    q_raw = mf_re * dmf_re
                run = (decim == k_out) & active & (not locked)
                q = jnp.clip(q_raw, -1.0, 1.0)
                q_hat = (C_B0 / C_A0) * q + v0
                v0n = -(C_A1 / C_A0) * q_hat
                rn = rate + rate_adj * q_hat
                dn = rn + q_hat
                runf = run.astype(jnp.float32)
                actf = active.astype(jnp.float32)
                # SAME where-forms as ops/symsync._timing_update so the
                # kernel is bit-identical to the scan formulation
                tau = tau + jnp.where(active, dl, 0.0)
                rate = jnp.where(run, rn, rate)
                dl = jnp.where(run, dn, dl)
                v0 = jnp.where(run, v0n, v0)
                decim = jnp.where(
                    active, jnp.where(decim == k_out, 1, decim + 1),
                    decim)
                bf = tau * npfb
                b = _round_half_even(bf).astype(jnp.int32)
                yre_ref[t, :, e] = jnp.where(active, mf_re / k, 0.0)
                yim_ref[t, :, e] = jnp.where(active, mf_im / k, 0.0)
                val_ref[t, :, e] = actf
                fscr[5] = jnp.maximum(fscr[5], runf)   # ran-any flag
            fscr[0] = tau - 1.0
            fscr[1] = rate
            fscr[2] = dl
            fscr[3] = v0
            fscr[4] = bf - npfb
            iscr[0] = b - npfb
            iscr[1] = decim
            return 0

        jax.lax.fori_loop(0, TS, step, 0)

        @pl.when(i == ng - 1)
        def _():
            fso_ref[:] = fscr[:]
            iso_ref[:] = iscr[:]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "npfb", "G", "max_out", "k", "k_out", "bw", "locked", "interpret"))
def symsync_scan_pallas(ma, fstate, istate, *, npfb: int, G: int,
                        max_out: int, k: int, k_out: int, bw: float,
                        locked: bool, interpret: bool = False):
    """Run the symsync timing loop over precomputed branch outputs.

    ma: [T, B, G*npfb] f32 (per step: G groups of npfb branch outputs —
    mf_re | dmf_re [| mf_im | dmf_im]); fstate [6, B] f32 (tau, rate,
    del, v0, bf, ran-any); istate [2, B] i32 (b, decim).  T % 32 == 0.
    Returns (y_re, y_im, valid [T, B, max_out] f32, fstate', istate').
    """
    T, B, L = ma.shape
    assert T % TS == 0, "pad the block to a multiple of 32 steps"
    ng = T // TS
    kern = _make_kernel(npfb, G, max_out, k, k_out, bw, locked, B, L, ng)
    out_shapes = (
        jax.ShapeDtypeStruct((T, B, max_out), jnp.float32),
        jax.ShapeDtypeStruct((T, B, max_out), jnp.float32),
        jax.ShapeDtypeStruct((T, B, max_out), jnp.float32),
        jax.ShapeDtypeStruct((6, B), jnp.float32),
        jax.ShapeDtypeStruct((2, B), jnp.int32),
    )
    grid = (ng,)
    yre, yim, val, fso, iso = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TS, B, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TS, B, max_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, B, max_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, B, max_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((6, B), jnp.float32),
            pltpu.VMEM((2, B), jnp.int32),
        ],
        interpret=interpret,
    )(ma, fstate, istate)
    return yre, yim, val, fso, iso
