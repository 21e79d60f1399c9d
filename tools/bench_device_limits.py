#!/usr/bin/env python
"""Measure this device's achievable speed-of-light: HBM streaming
bandwidth (saxpy) and MXU matmul throughput (f32 and bf16).

These calibrate the roofline percentages quoted in PERF.md: the axon
tunnel chip is throttled relative to a production part, so "percent of
datasheet" understates kernel quality — percent of *achievable* is the
honest denominator.

Methodology matches bench.py: chained trials, checksum value readback
inside the timed region, two-point dt(2n)-dt(n) calibration.

Prints one JSON line:
  {"saxpy_gbs": ..., "matmul_f32_tflops": ..., "matmul_bf16_tflops": ...}
"""
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _timed(run_trials, work_per_trial, max_trials=4096):
    n = 1
    dt1 = run_trials(n)
    while dt1 < 0.5 and n < max_trials:
        n = min(2 * n, max_trials)
        dt1 = run_trials(n)
    dt2 = run_trials(2 * n)
    if dt2 - dt1 > 0.25 * dt1:
        return work_per_trial * n / (dt2 - dt1)
    return work_per_trial * 2 * n / dt2


def main():
    import os
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.devices()[0].platform}", file=sys.stderr)
    rng = np.random.default_rng(0)

    # --- HBM: y = a*x + y (read x, read y, write y: 3 arrays x 4 B per
    # element per iteration), K iterations chained INSIDE one jit (a
    # host-looped step pays per-dispatch tunnel overhead per iteration,
    # which the two-point calibration cannot cancel).  Achievable rate
    # is strongly LAYOUT-dependent on this chip (r3 sweep: 395-972 GB/s
    # across 1-D/2-D shapes and sizes), so sweep representative shapes
    # and take the MAX as the achievable streaming rate — the roofline
    # denominator — and report the spread alongside. ---
    K = 16 if jax.default_backend() != "cpu" else 2
    rates = {}
    for shape, tag in (((1 << 25,), "1d-128MiB"),
                       ((64, 1 << 18), "2d-64MiB"),
                       ((64, 1 << 19), "2d-128MiB")):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

        @jax.jit
        def saxpy_step(y, chk, x=x):
            def body(c, _):
                y_, acc = c
                y_ = 1.0001 * x + y_
                return (y_, acc + y_.ravel()[0] + y_.ravel()[-1]), None
            (y2, chk2), _ = jax.lax.scan(body, (y, chk), None, length=K)
            return y2, chk2

        y0 = jnp.zeros(shape, jnp.float32)
        y, chk = saxpy_step(y0, jnp.float32(0))
        float(np.asarray(chk))

        def run_saxpy(n, step=saxpy_step, y0=y0):
            t0 = time.perf_counter()
            y, chk = y0, jnp.float32(0)
            for _ in range(n):
                y, chk = step(y, chk)
            float(np.asarray(chk))
            return time.perf_counter() - t0

        n_el = int(np.prod(shape))
        rates[tag] = _timed(run_saxpy, 3 * 4 * n_el * K) / 1e9
    gbs = max(rates.values())
    print(f"saxpy by layout: " + ", ".join(
        f"{t}={v:.0f}" for t, v in rates.items()), file=sys.stderr)

    # --- MXU: chained 4096^3 matmul (2*M*N*K flops per trial) ---
    M = 4096
    a32 = jnp.asarray(rng.standard_normal((M, M)).astype(np.float32) * 0.01)

    def matmul_rate(a):
        @jax.jit
        def mm_step(b, chk):
            b = a @ b
            # renormalize so values neither explode nor denormalize
            b = b * (1.0 / jnp.maximum(jnp.max(jnp.abs(b)), 1e-30))
            return b, chk + b[0, 0]

        b0 = jnp.asarray(np.eye(M, dtype=np.asarray(a).dtype))
        b, chk = mm_step(b0, jnp.zeros((), b0.dtype))
        float(np.asarray(chk))

        def run(n):
            t0 = time.perf_counter()
            b, chk = b0, jnp.zeros((), b0.dtype)
            for _ in range(n):
                b, chk = mm_step(b, chk)
            float(np.asarray(chk))
            return time.perf_counter() - t0

        return _timed(run, 2 * M ** 3) / 1e12

    tf32 = matmul_rate(a32)
    tbf16 = matmul_rate(a32.astype(jnp.bfloat16))

    print(json.dumps({"saxpy_gbs": round(gbs, 1),
                      "matmul_f32_tflops": round(tf32, 2),
                      "matmul_bf16_tflops": round(tbf16, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
