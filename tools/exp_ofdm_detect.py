#!/usr/bin/env python
"""Stage experiment for the OFDM streaming detector: where does the
time go, and do MXU box sums beat the cumsum formulation?

Variants (per 16x32768 block, value-verified two-point timing):
  metric-cumsum    current formulation: two cumsums -> windowed sums
  metric-matmul    box sums as banded-tap matmuls (ones taps, MXU)
  full-step        the shipping ofdm_detector_stream apply
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from liquid_dsp_tpu.multichannel.ofdm import ofdm_detector_stream, ofdm_params
    from liquid_dsp_tpu.ops.fir import fir_apply_matmul

    batch, T = 16, 32768
    params = ofdm_params(64, 16)
    M, cp = params.M, params.cp_len
    M2 = M // 2
    hist = 1536
    CH = 256
    n_chunk = (hist + T - M) // CH
    Lm = n_chunk * CH

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((batch, hist + T)) +
         1j * rng.standard_normal((batch, hist + T))).astype(np.complex64)
    xr = jnp.asarray(x.real.copy())
    xi = jnp.asarray(x.imag.copy())

    def metric_cumsum(buf):
        prod = buf[:, M2:] * jnp.conj(buf[:, :-M2])
        z = jnp.zeros((batch, 1), prod.dtype)
        c = jnp.cumsum(jnp.concatenate([z, prod], axis=-1), axis=-1)
        Pm = c[:, M2:] - c[:, :-M2]
        zf = jnp.zeros((batch, 1), jnp.float32)
        e = jnp.cumsum(jnp.concatenate(
            [zf, jnp.abs(buf).astype(jnp.float32) ** 2], axis=-1), axis=-1)
        R = e[:, M:] - e[:, :-M]
        metric = jnp.abs(Pm[:, :Lm]) / jnp.maximum(R[:, :Lm], 1e-12) * 2.0
        return metric, Pm

    ones_m2 = np.ones(M2, np.float32)
    ones_m = np.ones(M, np.float32)

    def metric_matmul(buf):
        # prod[n] = buf[n+M2] * conj(buf[n]); window sum of width M2
        prod = buf[:, M2:] * jnp.conj(buf[:, :-M2])
        # Pm[k] = sum_{i<M2} prod[k+i]  (forward window): feed reversed?
        # fir_apply_matmul computes y[n] = sum h[i] xp[n + i] with xp
        # carrying L-1 history; here we want a forward window, so pass
        # carry = first M2-1 samples? Simpler: causal window sum then
        # shift: y[n] = sum_{i<M2} prod[n - i]; forward sum F[k] =
        # y[k + M2 - 1].
        pr, _ = fir_apply_matmul(
            jnp.asarray(ones_m2), jnp.zeros((batch, M2 - 1), prod.dtype),
            prod)
        Pm = jnp.concatenate(
            [pr[:, M2 - 1:], jnp.zeros((batch, M2 - 1), prod.dtype)],
            axis=-1)
        en = jnp.abs(buf).astype(jnp.float32) ** 2
        er, _ = fir_apply_matmul(
            jnp.asarray(ones_m), jnp.zeros((batch, M - 1), jnp.float32), en)
        R = er[:, M - 1:]
        metric = jnp.abs(Pm[:, :Lm]) / jnp.maximum(R[:, :Lm], 1e-12) * 2.0
        return metric, Pm

    @jax.jit
    def step_cs(r, i):
        m, Pm = metric_cumsum(jax.lax.complex(r, i))
        return jnp.sum(m), jnp.sum(jnp.abs(Pm))

    @jax.jit
    def step_mm(r, i):
        m, Pm = metric_matmul(jax.lax.complex(r, i))
        return jnp.sum(m), jnp.sum(jnp.abs(Pm))

    # correctness
    a = np.asarray(jax.device_get(step_cs(xr, xi)))
    b = np.asarray(jax.device_get(step_mm(xr, xi)))
    print("checksums", a, b, file=sys.stderr)

    proc = ofdm_detector_stream(T, params)
    carry0 = jax.jit(lambda: proc.init(batch_shape=(batch,)))()

    @jax.jit
    def step_full(c, r, i):
        out, c2 = proc.apply((), c, jax.lax.complex(r, i)[:, :T])
        valid, idx, cfo, peak = out
        return c2, jnp.sum(peak) + jnp.sum(cfo) + jnp.sum(idx)

    def timer(fn):
        def run(n):
            t0 = time.perf_counter()
            chk = None
            for _ in range(n):
                chk = fn()
            np.asarray(jax.device_get(chk))
            return time.perf_counter() - t0
        return run

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod",
        pathlib.Path(__file__).resolve().parent.parent / "bench.py")
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)

    def msps(run):
        return bm.timed_throughput(run, batch * T) / 1e6

    r1 = msps(timer(lambda: step_cs(xr, xi)[0]))
    print(f"metric-cumsum   {r1:9.1f} Msps")
    r2 = msps(timer(lambda: step_mm(xr, xi)[0]))
    print(f"metric-matmul   {r2:9.1f} Msps")

    # metric + chunk-max + local-max (no suppression scan / selection)
    from jax import lax

    @jax.jit
    def step_sel(r, i):
        m, Pm = metric_matmul(jax.lax.complex(r, i))
        mc = m.reshape(batch, n_chunk, CH)
        pk = jnp.max(mc, axis=-1)
        pos = jnp.asarray(np.arange(n_chunk) * CH, jnp.int32)[None] + \
            jnp.argmax(mc, axis=-1).astype(jnp.int32)
        neg = jnp.full((batch, 1), -jnp.inf, pk.dtype)
        local = (pk > jnp.concatenate([neg, pk[:, :-1]], axis=-1)) & \
            (pk >= jnp.concatenate([pk[:, 1:], neg], axis=-1))
        cand = (pk > 0.7) & (pos < T) & local
        return jnp.sum(jnp.where(cand, pos, 0)) + jnp.sum(pk)
    r4 = msps(timer(lambda: step_sel(xr, xi)))
    print(f"+chunkmax+local {r4:9.1f} Msps")

    state = {"c": carry0}

    def full_once():
        state["c"], chk = step_full(state["c"], xr[:, :T], xi[:, :T])
        return chk
    r3 = msps(timer(full_once))
    print(f"full-step       {r3:9.1f} Msps")
    return 0


if __name__ == "__main__":
    sys.exit(main())


def micro():
    """Isolate the chunk-max stage: max vs argmax vs where-iota."""
    import jax
    import jax.numpy as jnp
    batch, T = 16, 32768
    hist, CH, M = 1536, 256, 64
    n_chunk = (hist + T - M) // CH
    Lm = n_chunk * CH
    rng = np.random.default_rng(0)
    m_np = rng.standard_normal((batch, Lm)).astype(np.float32)
    m = jnp.asarray(m_np)

    @jax.jit
    def f_max(m):
        mc = m.reshape(batch, n_chunk, CH)
        return jnp.sum(jnp.max(mc, axis=-1))

    @jax.jit
    def f_argmax(m):
        mc = m.reshape(batch, n_chunk, CH)
        return jnp.sum(jnp.max(mc, -1)) + jnp.sum(jnp.argmax(mc, -1))

    @jax.jit
    def f_iota(m):
        mc = m.reshape(batch, n_chunk, CH)
        pk = jnp.max(mc, -1)
        iota = jnp.arange(CH, dtype=jnp.int32)
        idx = jnp.min(jnp.where(mc == pk[..., None], iota, CH), -1)
        return jnp.sum(pk) + jnp.sum(idx)

    import importlib.util, pathlib, time
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
                chk = fn()
            np.asarray(jax.device_get(chk))
            return time.perf_counter() - t0
        return run

    for name, fn in [("max-only", f_max), ("max+argmax", f_argmax),
                     ("max+where-iota", f_iota)]:
        r = bm.timed_throughput(timer(lambda: fn(m)), batch * T) / 1e6
        print(f"{name:16s} {r:9.1f} Msps")
