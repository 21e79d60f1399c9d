"""Pallas TPU kernel: mixer + fused FIR + decimation in ONE pass.

The fused planar headline chain (fuse.py + planar.py) is HBM-bound in
XLA: the mixer output, the halo-padded stream, and the banded im2col
frames each round-trip HBM between kernels (~36 B/sample, PERF.md).
This kernel performs the whole chain per tile inside VMEM:

  * reads each input plane exactly ONCE: the inter-tile filter halo
    rides in VMEM scratch across the (sequential) grid steps, and the
    first tile reads the streaming carry instead,
  * mixes with a precomputed cos/sin ramp plus a per-tile phase scalar
    (angle addition — T + nt transcendentals instead of T*nt),
  * builds the banded windows with static in-VMEM slices and runs the
    [B*nsub, WK] @ [WK, SUB/down] banded matmul on the MXU,
  * strides the outputs and writes [B, tile/down] planes,

for ~12 B/sample of HBM traffic (8 in + 4 out at down=2), measured
3.1x the XLA planar schedule of the same chain (PERF.md).  The tile is
SUB*nsub input samples with nsub picked per block length
(`_pick_nsub`: 16 when 4096 | T, else 8; 32 measured slower — the
matmul exceeds the sweet spot).  Reference analog: none — this is the
freedom of re-architecting the cascade (the reference asserts exact
implementations are interchangeable, examples/fftfilt_crcf_example.c);
the composed-taps algebra is identical to `fuse.fused_fir`.

Constraints: real taps with L <= SUB+1, block length a multiple of
TILE (2048), batch a multiple of 8 (f32 sublane), shared scalar NCO
phase across the batch.  `pallas_mix_fir_supported` checks them.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["SUB", "NSUB", "TILE", "WK", "make_band", "fold_offset",
           "mix_fir_decim", "pallas_mix_fir_supported"]

SUB = 256          # full-rate outputs per matmul column block
NSUB = 8           # sub-tiles folded into the matmul M dimension
TILE = SUB * NSUB  # input samples consumed per grid step (2048)
WK = 2 * SUB       # banded K dimension (512); requires L <= SUB + 1


def fold_offset(h: np.ndarray, d: int) -> np.ndarray:
    """Fold the strided-output offset d into the taps:
    y[i] = sum_j h[j] x[down*i + d - j] = sum_j h'[j] x[down*i - j]."""
    h = np.asarray(h)
    return np.concatenate([h[d:], np.zeros(d, h.dtype)]) if d else h


def make_band(h: np.ndarray, down: int) -> np.ndarray:
    """Band [WK, SUB//down]: y[o] = sum_m w[k*SUB + m] * band[m, o] with
    w[q] = x[q - (L-1)] (halo-prefixed stream), offset pre-folded."""
    h = np.asarray(h, np.float32)
    L = len(h)
    if L > SUB + 1:
        raise ValueError(f"taps too long for the banded kernel: {L}")
    no = SUB // down
    band = np.zeros((WK, no), np.float32)
    for o in range(no):
        of = down * o
        for m in range(of, min(WK, of + L)):
            j = of - m + (L - 1)
            if 0 <= j < L:
                band[m, o] = h[j]
    return band


def pallas_mix_fir_supported(h_np, down: int, batch: int, T: int,
                             theta_shape=()) -> bool:
    """Static eligibility for the fused kernel (see module docstring)."""
    return (not np.iscomplexobj(h_np)
            and len(np.atleast_1d(h_np)) <= SUB + 1
            and T % TILE == 0
            and batch % 8 == 0
            and theta_shape == ())


def _kernel(ci_ref, si_ref, xr_ref, xi_ref,
            ct_ref, st_ref, band_ref, cr_ref, cri_ref,
            or_ref, oi_ref, hr_ref, hi_ref, *, L, down, sgn, nsub):
    i = pl.program_id(0)
    tile = SUB * nsub
    halo = L - 1
    pad = WK - SUB - halo
    B = xr_ref.shape[0]
    first = i == 0
    out_dtype = or_ref.dtype

    # TPU grids execute sequentially, so VMEM scratch (hr/hi) carries
    # the inter-tile filter halo — the previous tile is NOT re-read
    # from HBM (that halved this kernel's input traffic).  Input planes
    # may be bfloat16 (halves HBM read traffic; exact for 8-bit SDR
    # captures — see mix_fir_decim docstring): the cast to f32 happens
    # in VMEM, all arithmetic stays f32.
    def wbuf(cur_ref, scratch_ref, carry_ref):
        cur = cur_ref[:].astype(jnp.float32)
        tail = jnp.where(first, carry_ref[:, SUB - halo:],
                         scratch_ref[:, SUB - halo:])
        w = jnp.concatenate(
            [tail, cur, jnp.zeros((B, pad), jnp.float32)], axis=-1)
        scratch_ref[:] = cur[:, tile - SUB:]       # next tile's halo
        return w

    wr = wbuf(xr_ref, hr_ref, cr_ref)
    wi = wbuf(xi_ref, hi_ref, cri_ref)

    # mix on the window: angle addition with the per-tile phase scalar
    # (the SMEM refs hold ALL nt per-tile phases; Pallas TPU requires
    # SMEM blocks to equal the array shape, so index by program_id)
    cb, sb = ci_ref[i, 0], si_ref[i, 0]
    ct = ct_ref[0, :tile + SUB]        # ramp is built at the max tile
    st = st_ref[0, :tile + SUB]
    c = cb * ct - sb * st
    s = sb * ct + cb * st
    if sgn < 0:
        s = -s
    mr = wr * c - wi * s
    mi = wr * s + wi * c

    # banded matmul: fold sub-tiles into M
    def fir(m):
        W = jnp.concatenate(
            [m[:, k * SUB: k * SUB + WK] for k in range(nsub)], axis=0)
        return jnp.dot(W, band_ref[:], preferred_element_type=jnp.float32)

    yr = fir(mr).astype(out_dtype)     # [B*nsub, SUB//down]
    yi = fir(mi).astype(out_dtype)
    no = SUB // down
    for k in range(nsub):
        or_ref[:, k * no:(k + 1) * no] = yr[k * B:(k + 1) * B]
        oi_ref[:, k * no:(k + 1) * no] = yi[k * B:(k + 1) * B]


NSUB_MAX = 16      # largest tile the ramp is built for (SUB*NSUB_MAX)


def _pick_nsub(T: int) -> int:
    """Largest supported sub-tile count whose tile divides T."""
    for nsub in (NSUB_MAX, 8):
        if T % (SUB * nsub) == 0:
            return nsub
    raise ValueError(f"block length {T} not a multiple of {TILE}")


@functools.partial(jax.jit,
                   static_argnames=("L", "down", "sgn", "dphi", "interpret",
                                    "out_dtype"))
def mix_fir_decim(xr, xi, carry_r, carry_i, theta, ramp_c, ramp_s, band,
                  *, L, down, sgn, dphi, interpret=False,
                  out_dtype=jnp.float32):
    """One streaming block through the fused kernel.

    xr/xi [B, T] float32 OR bfloat16 input planes; carry_[ri] [B, SUB]
    float32: the last SUB pre-mix input samples of the previous block
    (zeros initially); theta: scalar NCO phase at the first sample;
    ramp_c/s [1, SUB*NSUB_MAX+SUB]: cos/sin of dphi*(k - (L-1))
    (make_ramp); band [WK, SUB//down] from make_band.

    bfloat16 planes halve the kernel's HBM read traffic (the binding
    constraint, PERF.md) and are EXACT for 8-bit IQ captures: cu8
    sample levels k - 127.5 are half-integers of magnitude <= 127.5,
    which bf16's 8 significand bits represent without rounding, so the
    dominant SDR capture format loses nothing.  All arithmetic (mix,
    MXU accumulation) stays float32 in VMEM; only the HBM layout
    narrows.  out_dtype=jnp.bfloat16 additionally halves the write
    traffic (output then carries bf16 quantization, ~-48 dB).

    Returns (yr, yi) [B, T//down] out_dtype.  The caller advances theta
    by dphi*T (wrapped) and keeps x[..., -SUB:] as the next carry.
    """
    B, T = xr.shape
    nsub = _pick_nsub(T)
    tile = SUB * nsub
    nt = T // tile
    no = SUB // down
    # per-tile phase offsets (computed with jnp so theta can be traced)
    step = np.float32(np.mod(dphi * tile, 2 * np.pi))
    ph = theta + step * jnp.arange(nt, dtype=jnp.float32)
    ph = jnp.mod(ph + np.pi, 2 * np.pi) - np.pi
    tile_c = jnp.cos(ph)[:, None]
    tile_s = jnp.sin(ph)[:, None]

    kern = functools.partial(_kernel, L=L, down=down, sgn=sgn, nsub=nsub)
    spec_cur = pl.BlockSpec((B, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def spec_const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    spec_smem = pl.BlockSpec((nt, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    ramp_len = ramp_c.shape[-1]
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, T // down), out_dtype),
                   jax.ShapeDtypeStruct((B, T // down), out_dtype)),
        grid=(nt,),
        in_specs=[
            spec_smem, spec_smem,
            spec_cur, spec_cur,
            spec_const((1, ramp_len)), spec_const((1, ramp_len)),
            spec_const((WK, no)),
            spec_const((B, SUB)), spec_const((B, SUB)),
        ],
        out_specs=(pl.BlockSpec((B, no * nsub), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((B, no * nsub), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((B, SUB), jnp.float32),
                        pltpu.VMEM((B, SUB), jnp.float32)],
        interpret=interpret,
    )(tile_c, tile_s, xr, xi, ramp_c, ramp_s, band,
      carry_r, carry_i)


def make_ramp(h_len: int, dphi: float):
    """Host (f64) mixer ramp for the window coordinate system, sized
    for the largest tile (smaller tiles slice it statically)."""
    k = np.arange(SUB * NSUB_MAX + SUB) - (h_len - 1)
    ramp = dphi * np.asarray(k, np.float64)
    return (np.cos(ramp).astype(np.float32)[None],
            np.sin(ramp).astype(np.float32)[None])
