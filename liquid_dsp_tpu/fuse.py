"""LTI chain fusion: collapse adjacent FIR/decimator stages into ONE
strided FIR.

The reference treats a filter cascade as a sequence of opaque objects and
asserts only that exact implementations are interchangeable (reference
examples/fftfilt_crcf_example.c: firfilt == fftfilt).  On TPU the dominant
cost of a cascade is HBM traffic — each stage streams the whole block
through the MXU again — so the TPU-native move is algebraic: adjacent LTI
stages

    y[i] = sum_j h[j] * x[down*i + d - j]

compose into a single stage with

    taps' = conv(h1, upsample(h2, down1))
    down' = down1 * down2
    d'    = d1 + down1 * d2

(d' < down' holds inductively when each stage satisfies d < down).  The
fused stage runs as one banded-tap matmul pass (ops/fir.py) at full rate
followed by a strided slice — measured 2.3x the unfused chain on the
headline benchmark (PERF.md).  Output is the same samples up to fp32
rounding (one accumulation instead of a cascade; relative error ~1e-4).

Stages advertise their LTI description via Proc.lti (core.py); anything
without it (NCO mixers, AGC, nonlinear ops) is left in place and only
maximal LTI runs between them are fused.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .core import LTI, Proc, chain

__all__ = ["fuse", "fused_fir"]


def _flatten(proc: Proc):
    if proc.children is None:
        return [proc]
    out = []
    for c in proc.children:
        out.extend(_flatten(c))
    return out


def _upsample(h: np.ndarray, k: int) -> np.ndarray:
    if k == 1 or h.shape[-1] == 1:
        return h
    z = np.zeros((h.shape[-1] - 1) * k + 1, dtype=h.dtype)
    z[::k] = h
    return z


def _compose(a: LTI, b: LTI) -> LTI:
    """LTI composition: stage a THEN stage b."""
    ha = np.atleast_1d(np.asarray(a.taps, dtype=np.complex128 if
                                  (np.iscomplexobj(a.taps) or
                                   np.iscomplexobj(b.taps)) else np.float64))
    hb = np.atleast_1d(np.asarray(b.taps, dtype=ha.dtype))
    taps = np.convolve(ha, _upsample(hb, a.down))
    return LTI(taps=taps, down=a.down * b.down, d=a.d + a.down * b.d)


def fused_fir(meta: LTI, name: str = "fused_fir") -> Proc:
    """A Proc computing ``y[i] = sum_j taps[j] x[down*i + d - j]`` as one
    pass: banded-tap matmul at full rate + strided slice on accelerators
    (the slice is free next to the HBM savings of skipping a cascade),
    strided lax.conv on CPU.  Carry: last L-1 raw input samples, so the
    stage time-shards via the standard halo exchange."""
    from .ops.fir import _coerce, _np_taps, fir_apply_matmul
    from .ops.dotprod import conv1d

    h_np = _np_taps(np.asarray(meta.taps))
    down, d = int(meta.down), int(meta.d)
    if d < 0 or d >= down:
        raise ValueError(f"fused offset d={d} must satisfy 0 <= d < down")
    L = int(h_np.shape[-1])
    hj = jnp.asarray(h_np)

    def init(batch_shape=(), dtype=jnp.complex64):
        return jnp.zeros(batch_shape + (L - 1,), dtype=dtype)

    def _apply_one(h, c, x):
        import jax as _jax
        if _jax.default_backend() != "cpu":
            yf, c2 = fir_apply_matmul(h, c, x, tile=256)
            y = yf[..., d::down] if (down > 1 or d) else yf
            return y, c2
        xp = jnp.concatenate([c, x], axis=-1) if L > 1 else x
        c2 = xp[..., xp.shape[-1] - (L - 1):] if L > 1 else c
        y = conv1d(xp[..., d:] if d else xp, h, stride=down)
        return y, c2

    def apply(params, carry, x):
        return _apply_one(params["h"], _coerce(carry, x.dtype), x)

    planar_apply = planar_init = None
    if not np.iscomplexobj(h_np):
        # real taps filter each plane independently: two unit-stride
        # float passes instead of one interleaved complex pass (planar.py)
        def planar_init(batch_shape=(), dtype=jnp.float32):
            z = jnp.zeros(batch_shape + (L - 1,), dtype)
            return (z, z)

        def planar_apply(params, carry, x):
            h = params["h"]
            (r, i), (cr, ci) = x, carry
            yr, cr2 = _apply_one(h, cr.astype(r.dtype), r)
            yi, ci2 = _apply_one(h, ci.astype(i.dtype), i)
            return (yr, yi), (cr2, ci2)

    return Proc(params={"h": hj}, init=init, apply=apply, rate=(1, down),
                name=name, halo=L - 1, lti=LTI(h_np, down, d),
                planar_apply=planar_apply, planar_init=planar_init)


def fuse(proc: Proc, min_run: int = 2) -> Proc:
    """Return an equivalent Proc with maximal runs of adjacent LTI stages
    collapsed into single strided FIRs.

    Nested chains are flattened first (composition is associative); the
    returned Proc has a FRESH carry structure — fuse before `init`, not
    mid-stream.  Stages without `Proc.lti` are kept verbatim.  A run
    shorter than `min_run` is left alone (nothing to gain)."""
    stages = _flatten(proc)
    if not any(s.lti is not None for s in stages):
        return proc
    out = []
    run = []

    def close_run():
        if len(run) >= min_run:
            meta = run[0].lti
            for s in run[1:]:
                meta = _compose(meta, s.lti)
            out.append(fused_fir(
                meta, name="fused(" + "+".join(s.name for s in run) + ")"))
        else:
            out.extend(run)
        run.clear()

    for s in stages:
        if s.lti is not None and np.asarray(s.lti.taps).ndim == 1:
            run.append(s)
        else:
            close_run()
            out.append(s)
    close_run()
    if len(out) == 1:
        return out[0]
    return chain(*out, name=proc.name + "_fused")
