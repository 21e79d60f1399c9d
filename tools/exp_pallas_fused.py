#!/usr/bin/env python
"""Experiment: ONE Pallas kernel for the whole fused headline chain
(mix -> 148-tap FIR -> 2:1 decim) on float planes.

Hypothesis: the XLA planar path (bench.py, ~5 Gsps) is HBM-bound at
~36 B/sample — mixer output, padded stream, and banded frames all
round-trip HBM between kernels.  A single Pallas kernel that
  * reads each input plane once (cur block + prev-block halo),
  * mixes in VMEM with a precomputed ramp + per-tile phase scalars,
  * builds the banded im2col windows in VMEM (8 static slices),
  * runs the [128, 512] @ [512, 128] banded matmul on the MXU,
  * decimates and writes [B, TILE/2] planes
moves ~20 B/sample of HBM traffic -> ceiling ~49 Gsps.

Usage:
  JAX_PLATFORMS=cpu python tools/exp_pallas_fused.py --check   (interpret)
  python tools/exp_pallas_fused.py --bench                     (real TPU)
"""
import functools
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

if "--check" in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

SUB = 256          # full-rate outputs per matmul column block
NSUB = 8           # sub-tiles folded into the matmul M dimension
TILE = SUB * NSUB  # input samples consumed per grid step (2048)
WK = 2 * SUB       # banded K dimension (512), requires L <= SUB + 1


def make_band(h: np.ndarray, down: int) -> np.ndarray:
    """Band [WK, SUB//down]: y[o] = sum_m w[k*SUB + m] * band[m, o] with
    w[q] = x[q - (L-1)] (halo-prefixed stream) and the d offset folded
    into h by the caller."""
    h = np.asarray(h, np.float32)
    L = len(h)
    assert L <= SUB + 1
    no = SUB // down
    band = np.zeros((WK, no), np.float32)
    for o in range(no):
        of = down * o
        for m in range(of, min(WK, of + L)):
            j = of - m + (L - 1)
            if 0 <= j < L:
                band[m, o] = h[j]
    return band


def _kernel(ci_ref, si_ref, xr_ref, xrp_ref, xi_ref, xip_ref,
            ct_ref, st_ref, band_ref, cr_ref, cri_ref,
            or_ref, oi_ref, *, L, down, sgn):
    i = pl.program_id(0)
    halo = L - 1
    pad = WK - SUB - halo
    B = xr_ref.shape[0]
    first = i == 0

    def wbuf(cur_ref, prev_ref, carry_ref):
        tail = jnp.where(first, carry_ref[:, SUB - halo:],
                         prev_ref[:, TILE - halo:])
        return jnp.concatenate(
            [tail, cur_ref[:], jnp.zeros((B, pad), jnp.float32)], axis=-1)

    wr = wbuf(xr_ref, xrp_ref, cr_ref)
    wi = wbuf(xi_ref, xip_ref, cri_ref)

    # mix on the window: angle addition with the per-tile phase scalar
    cb, sb = ci_ref[0, 0], si_ref[0, 0]
    c = cb * ct_ref[0, :] - sb * st_ref[0, :]
    s = sb * ct_ref[0, :] + cb * st_ref[0, :]
    if sgn < 0:
        s = -s
    mr = wr * c - wi * s
    mi = wr * s + wi * c

    # banded matmul: fold sub-tiles into M
    def fir(m):
        W = jnp.concatenate(
            [m[:, k * SUB: k * SUB + WK] for k in range(NSUB)], axis=0)
        return jnp.dot(W, band_ref[:], preferred_element_type=jnp.float32)

    yr = fir(mr)                       # [B*NSUB, SUB//down]
    yi = fir(mi)
    no = SUB // down
    for k in range(NSUB):
        or_ref[:, k * no:(k + 1) * no] = yr[k * B:(k + 1) * B]
        oi_ref[:, k * no:(k + 1) * no] = yi[k * B:(k + 1) * B]


@functools.partial(jax.jit, static_argnames=("L", "down", "sgn", "interpret"))
def mix_fir_decim(xr, xi, carry_r, carry_i, tile_c, tile_s, ramp_c, ramp_s,
                  band, *, L, down, sgn, interpret=False):
    """xr/xi [B, T] -> ([B, T//down], [B, T//down]) mixed+filtered+decimated.

    carry_[ri] [B, SUB]: last SUB pre-mix input samples of the previous
    block (zeros for a fresh stream).  tile_c/s [ntiles, 1]: cos/sin of
    the per-tile phase offset; ramp_c/s [1, TILE+WK]: cos/sin of
    dphi*(k - (L-1)) in window coordinates.
    """
    B, T = xr.shape
    assert T % TILE == 0
    nt = T // TILE
    no = SUB // down
    kern = functools.partial(_kernel, L=L, down=down, sgn=sgn)
    spec_cur = pl.BlockSpec((B, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    spec_prev = pl.BlockSpec((B, TILE), lambda i: (0, jnp.maximum(i - 1, 0)),
                             memory_space=pltpu.VMEM)

    def spec_const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    spec_smem = pl.BlockSpec((1, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM)
    yr, yi = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, T // down), jnp.float32),
                   jax.ShapeDtypeStruct((B, T // down), jnp.float32)),
        grid=(nt,),
        in_specs=[
            spec_smem, spec_smem,
            spec_cur, spec_prev, spec_cur, spec_prev,
            spec_const((1, TILE + WK - SUB)), spec_const((1, TILE + WK - SUB)),
            spec_const((WK, no)),
            spec_const((B, SUB)), spec_const((B, SUB)),
        ],
        out_specs=(pl.BlockSpec((B, no * NSUB), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((B, no * NSUB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(tile_c, tile_s, xr, xr, xi, xi, ramp_c, ramp_s, band,
      carry_r, carry_i)
    return yr, yi


def prep_consts(h, dphi, theta0, T, down):
    """Host-side (f64) constants for a block of T samples starting at
    absolute phase theta0."""
    L = len(h)
    nt = T // TILE
    k = np.arange(TILE + WK - SUB) - (L - 1)
    ramp = dphi * k
    tile_ph = np.mod(theta0 + dphi * TILE * np.arange(nt), 2 * np.pi)
    return (np.cos(tile_ph).astype(np.float32)[:, None],
            np.sin(tile_ph).astype(np.float32)[:, None],
            np.cos(ramp).astype(np.float32)[None],
            np.sin(ramp).astype(np.float32)[None],
            make_band(h, down))


def build_ref_chain():
    from liquid_dsp_tpu import fuse, chain
    from liquid_dsp_tpu.design.firdes import firdes_kaiser
    from liquid_dsp_tpu.ops.fir import firfilt
    from liquid_dsp_tpu.ops.nco import nco
    from liquid_dsp_tpu.ops.resample import msresamp
    p = chain(nco(dphi=0.125, direction="down"),
              firfilt(firdes_kaiser(64, 0.2, 60.0), backend="matmul"),
              firfilt(firdes_kaiser(57, 0.3, 60.0), backend="matmul"),
              msresamp(0.5, 60.0))
    return fuse(p)


def fold_offset(h, d):
    """Fold the strided-output offset d into the taps: y[i] =
    sum_j h[j] x[down*i + d - j] = sum_j h'[j] x[down*i - j]."""
    h = np.asarray(h)
    return np.concatenate([h[d:], np.zeros(d, h.dtype)]) if d else h


def run_planar_ref(fused, x):
    from liquid_dsp_tpu import planar
    pl_chain = planar(fused)
    params = jax.tree.map(np.asarray, pl_chain.params)
    carry = jax.jit(lambda: pl_chain.init(batch_shape=(x.shape[0],)))()
    (yr, yi), _ = jax.jit(lambda c, r, i: pl_chain.apply(params, c, (r, i))
                          )(carry, jnp.asarray(x.real.copy()),
                            jnp.asarray(x.imag.copy()))
    return np.asarray(yr) + 1j * np.asarray(yi)


def check():
    fused = build_ref_chain()
    lti = fused.children[1].lti
    h, down, d = np.asarray(lti.taps), lti.down, lti.d
    print(f"fused taps L={len(h)} down={down} d={d}")
    hp = fold_offset(h, d)
    dphi, theta0 = 0.125, 0.0
    B, T = 8, 4 * TILE
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((B, T)) + 1j * rng.standard_normal((B, T))
         ).astype(np.complex64)
    yref = run_planar_ref(fused, x)

    tc, ts, rc, rs, band = prep_consts(hp, dphi, theta0, T, down)
    yr, yi = mix_fir_decim(
        jnp.asarray(x.real.copy()), jnp.asarray(x.imag.copy()),
        jnp.zeros((B, SUB), jnp.float32), jnp.zeros((B, SUB), jnp.float32),
        jnp.asarray(tc), jnp.asarray(ts), jnp.asarray(rc), jnp.asarray(rs),
        jnp.asarray(band), L=len(hp), down=down, sgn=-1,
        interpret=jax.default_backend() == "cpu")
    y = np.asarray(yr) + 1j * np.asarray(yi)
    rms = np.sqrt(np.mean(np.abs(yref) ** 2))
    err = np.abs(y - yref).max() / rms
    print(f"shape {y.shape} vs {yref.shape}; rel err {err:.3e}")
    assert y.shape == yref.shape
    assert err < 2e-4, err
    print("CHECK OK")


def bench():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod",
        pathlib.Path(__file__).resolve().parent.parent / "bench.py")
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)

    fused = build_ref_chain()
    lti = fused.children[1].lti
    h, down, d = np.asarray(lti.taps), lti.down, lti.d
    hp = fold_offset(h, d)
    B, T = 16, 1 << 17
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    tc, ts, rc, rs, band = prep_consts(hp, 0.125, 0.0, T, down)
    cz = np.zeros((B, SUB), np.float32)
    consts = tuple(np.asarray(a) for a in (tc, ts, rc, rs, band))

    @jax.jit
    def step(r, i, chk):
        yr, yi = mix_fir_decim(r, i, cz, cz, *consts,
                               L=len(hp), down=down, sgn=-1)
        return chk + jnp.sum(yr * yr + yi * yi)

    chk = step(xr, xi, jnp.float32(0))
    print("warm checksum", float(np.asarray(chk)))

    def run_trials(n):
        t0 = time.perf_counter()
        chk = jnp.float32(0)
        for _ in range(n):
            chk = step(xr, xi, chk)
        float(np.asarray(chk))
        return time.perf_counter() - t0

    msps = bm.timed_throughput(run_trials, B * T) / 1e6
    print(f"fused pallas kernel: {msps:.1f} Msps")


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    else:
        bench()
