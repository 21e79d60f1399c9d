#!/usr/bin/env python
"""Headline chain with bfloat16 HBM planes vs float32 (real chip).

The fused Pallas chain kernel is HBM-bound at 12 B/sample f32 (8 in +
4 out at down=2, PERF.md).  bf16 input planes halve the read traffic
(8 B/sample ceiling ~123 Gsps); bf16 output additionally halves the
write (6 B/sample, ~164 Gsps).  bf16 input is EXACT for 8-bit IQ
captures (cu8 levels k-127.5 fit bf16's 8 significand bits); all
arithmetic stays f32 in VMEM (ops/kernels/pallas_chain.py).

Methodology identical to bench.py planar_main: params closed over as
numpy constants, K=16 blocks chained in-jit with flowing carry,
nonlinear checksum readback inside the timed region, two-point
calibration.  Usage: python tools/bench_bf16_chain.py [batch T]
"""
import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(batch=64, T=262144):
    import jax
    import jax.numpy as jnp

    from bench import build_chain, timed_throughput
    from liquid_dsp_tpu import kernel_fuse, planar

    # out_dtype="input": this tool measures the fully-narrow layout
    # (bf16 read AND write) — an explicit opt-in, kernel_fuse default
    # keeps f32 output.
    kproc = planar(kernel_fuse(build_chain(), out_dtype="input"))
    rng = np.random.default_rng(0)
    xr32 = rng.standard_normal((batch, T)).astype(np.float32)
    xi32 = rng.standard_normal((batch, T)).astype(np.float32)
    params = jax.tree.map(np.asarray, kproc.params)
    K = 16

    def measure(in_dtype):
        xr = jnp.asarray(xr32).astype(in_dtype)
        xi = jnp.asarray(xi32).astype(in_dtype)
        carry0 = jax.jit(lambda: kproc.init(batch_shape=(batch,)))()

        @jax.jit
        def step(c, r, i):
            def body(cc, _):
                c_in, acc = cc
                (yr, yi), c2 = kproc.apply(params, c_in, (r, i))
                yr32 = yr.astype(jnp.float32)
                yi32 = yi.astype(jnp.float32)
                return (c2, acc + jnp.sum(yr32 * yr32 + yi32 * yi32)), None
            (c2, chk), _ = jax.lax.scan(
                body, (c, jnp.float32(0)), None, length=K)
            return c2, chk

        c, chk = step(carry0, xr, xi)
        float(np.asarray(chk))

        def run_trials(n):
            t0 = time.perf_counter()
            c, chk = carry0, None
            for _ in range(n):
                c, chk = step(c, xr, xi)
            float(np.asarray(chk))
            return time.perf_counter() - t0

        return timed_throughput(run_trials, K * batch * T) / 1e6

    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        msps = measure(dt)
        print(f"{name} planes: {msps:.1f} Msamples/s")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
