#!/usr/bin/env python
"""Bisect _detect_refine (the streaming receivers' detection front end)
on real hardware, K iterations chained inside one jit.

Stages (frame64 geometry, 16 rows, T=32768, hist=1536):
  frame     static segment framing [n_seg, 512]
  matmul    + the 4 banded correlation matmuls + magnitude + scale
  argmax    + per-segment peak/arg + local-max + threshold
  suppress  + unrolled suppression scan + slot selection
  refine    + per-candidate align FFTs + quad peaks (full function)
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from liquid_dsp_tpu.framing.frame64 import _detector_template
    from liquid_dsp_tpu.framing import stream_rx as sr

    B, T = 16, 32768
    H = sr.STREAM_HIST + T
    P = 24
    span = 1440 - 8
    dc = sr._detect_consts(_detector_template())
    n_seg = (H - sr._DET_NFFT) // sr._DET_HOP + 1
    starts = (np.arange(n_seg) * sr._DET_HOP).astype(np.int32)
    K = 8
    rng = np.random.default_rng(0)
    bufr = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * .05)
    bufi = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * .05)
    last0 = jnp.full((B,), -(1 << 30), jnp.int32)

    NF, HOP = sr._DET_NFFT, sr._DET_HOP
    seg_idx = starts[:, None] + np.arange(NF)[None, :]
    Br = jnp.asarray(dc["band_re"])
    Bi = jnp.asarray(dc["band_im"])
    s_len, s2_sum = dc["s_len"], dc["s2_sum"]

    def fr_stage(br, bi):
        Fr = br[:, jnp.asarray(seg_idx)]          # [B, n_seg, NF]
        Fi = bi[:, jnp.asarray(seg_idx)]
        return Fr, Fi

    def mm_stage(br, bi):
        Fr, Fi = fr_stage(br, bi)
        Rr = Fr @ Br + Fi @ Bi
        Ri = Fi @ Br - Fr @ Bi
        x2 = jnp.sum(Fr ** 2 + Fi ** 2, axis=-1)
        g0 = jnp.sqrt(jnp.maximum(x2, 1e-20) * (s_len / NF))
        g = 1.0 / (g0 * np.sqrt(s2_sum))
        rxy = jnp.sqrt(Rr ** 2 + Ri ** 2) * g[..., None]
        return rxy

    def am_stage(br, bi):
        rxy = mm_stage(br, bi)
        seg_arg = jnp.argmax(rxy, axis=-1)
        seg_peak = jnp.take_along_axis(rxy, seg_arg[..., None],
                                       axis=-1)[..., 0]
        return seg_peak, seg_arg

    def full_stage(br, bi):
        def one(b1r, b1i, le):
            det = sr._detect_refine(lax.complex(b1r, b1i), le, dc, 0.5,
                                    P, T, starts, span)
            return det["peak"], det["dphi"], det["tau"]
        pk, dphi, tau = jax.vmap(one)(br, bi, last0)
        return jnp.sum(pk) + jnp.sum(dphi) + jnp.sum(tau)

    def chain(fn, reduce_fn):
        @jax.jit
        def stepK(br, bi):
            def body(c, _):
                v = reduce_fn(fn(br + c * 1e-20, bi))
                return v * 1e-20 + c * 0.5, None
            c, _ = lax.scan(body, jnp.float32(0), None, length=K)
            return c
        return stepK

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod",
        pathlib.Path(__file__).resolve().parent.parent / "bench.py")
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)

    def timer(fn):
        def run(n):
            t0 = time.perf_counter()
            chk = None
            for _ in range(n):
                chk = fn(bufr, bufi)
            np.asarray(jax.device_get(chk))
            return time.perf_counter() - t0
        return run

    cases = [
        ("frame", chain(fr_stage, lambda o: jnp.sum(o[0]) + jnp.sum(o[1]))),
        ("matmul", chain(mm_stage, jnp.sum)),
        ("argmax", chain(am_stage,
                         lambda o: jnp.sum(o[0]) + jnp.sum(o[1]))),
        ("full", chain(full_stage, lambda v: v)),
    ]
    for name, fn in cases:
        fn(bufr, bufi)
        sps = bm.timed_throughput(timer(fn), K)
        print(f"{name:8s} {1e6 / sps:9.1f} us/iter")
    return 0


if __name__ == "__main__":
    sys.exit(main())
