#!/usr/bin/env python
"""Bisect the preamble_stream receiver's post-detect cost on real
hardware with K iterations chained INSIDE one jit (per-call dispatch on
the tunnel is +-5x noise; chaining amortizes it away).

Stages (frame64 geometry, batch 16 rows x 24 candidate slots):
  spans     vmapped dynamic_slice of [P, span] windows from the buffer
  mix       spans * factored cexp ramp
  conv      grouped matched-filter conv + symbol scale
  pilot     pilot-sync FFT + quad peak + region correction
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
    from liquid_dsp_tpu.framing.stream_rx import cexp_ramp, quad_peak

    B, P, n_sym, Lb, k = 16, 24, 708, 57, 2
    span = k * (n_sym - 1) + Lb
    H = 1536 + 32768
    K = 8
    rng = np.random.default_rng(0)
    bufr = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    bufi = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    n0_np = rng.integers(0, 32768, (B, P)).astype(np.int32)
    n0_j = jnp.asarray(n0_np)
    bank = jnp.asarray(rng.standard_normal((64, Lb)).astype(np.float32))
    dphi0 = jnp.asarray(rng.standard_normal((B, P)).astype(np.float32) * .01)
    phi0 = jnp.asarray(rng.standard_normal((B, P)).astype(np.float32))

    def spans_of(buf, n0):                         # [B,H],[B,P] -> [B,P,span]
        def one(b1, s1):
            return jax.vmap(
                lambda s: lax.dynamic_slice(b1, (s,), (span,)))(s1)
        return jax.vmap(one)(buf, n0)

    def chain(fn):
        @jax.jit
        def stepK(n0, dphi, phi):
            def body(c, _):
                v = fn(n0 + (c.astype(jnp.int32) % 2), dphi, phi)
                return v * 1e-20 + c * 0.5, None
            c, _ = lax.scan(body, jnp.float32(0), None, length=K)
            return c
        return stepK

    def f_spans(n0, dphi, phi):
        sr = spans_of(bufr, n0)
        si = spans_of(bufi, n0)
        return jnp.sum(sr) + jnp.sum(si)

    def f_mix(n0, dphi, phi):
        sr = spans_of(bufr, n0)
        si = spans_of(bufi, n0)
        mr, mi = jax.vmap(lambda d, p: cexp_ramp(d, p, span))(dphi, phi)
        return jnp.sum(sr * mr - si * mi) + jnp.sum(sr * mi + si * mr)

    dn = ("NCH", "OIH", "NCH")

    def f_conv(n0, dphi, phi):
        sr = spans_of(bufr, n0)
        si = spans_of(bufi, n0)
        mr, mi = jax.vmap(lambda d, p: cexp_ramp(d, p, span))(dphi, phi)
        vr, vi = sr * mr - si * mi, sr * mi + si * mr
        taps = bank[jnp.abs(n0) % 64]              # [B, P, Lb]

        def one(xr, xi, t):
            x = jnp.stack([xr, xi])
            y = lax.conv_general_dilated(
                x, t[:, None, :], window_strides=(k,), padding="VALID",
                dimension_numbers=dn, feature_group_count=P)
            return y
        y = jax.vmap(one)(vr, vi, taps)            # [B, 2, P, n_sym]
        return jnp.sum(y ** 2)

    def f_pilot(n0, dphi, phi):
        # stand-in synced region: reuse conv output
        sr = spans_of(bufr, n0)
        si = spans_of(bufi, n0)
        mr, mi = jax.vmap(lambda d, p: cexp_ramp(d, p, span))(dphi, phi)
        vr, vi = sr * mr - si * mi, sr * mi + si * mr
        taps = bank[jnp.abs(n0) % 64]

        def one(xr, xi, t):
            x = jnp.stack([xr, xi])
            return lax.conv_general_dilated(
                x, t[:, None, :], window_strides=(k,), padding="VALID",
                dimension_numbers=dn, feature_group_count=P)
        y = jax.vmap(one)(vr, vi, taps)
        region = lax.complex(y[:, 0, :, 78:], y[:, 1, :, 78:])  # [B,P,630]
        pil_idx = np.arange(0, 630, 21)[:30].astype(np.int32)
        v = region[:, :, jnp.asarray(pil_idx)]
        V = jnp.fft.fft(v, 64, axis=-1)
        Vm = jnp.abs(V)
        j0 = jnp.argmax(Vm, axis=-1)
        u0 = jnp.take_along_axis(Vm, j0[..., None], axis=-1)[..., 0]
        um1 = jnp.take_along_axis(Vm, ((j0 - 1) % 64)[..., None],
                                  axis=-1)[..., 0]
        up1 = jnp.take_along_axis(Vm, ((j0 + 1) % 64)[..., None],
                                  axis=-1)[..., 0]
        frac2, _ = quad_peak(um1, u0, up1)
        jdx = j0 + frac2 - jnp.where(j0 > 32, 64, 0)
        dphi2 = jdx * (2 * np.pi / (64 * 21))
        c2 = jax.vmap(lambda d, p: cexp_ramp(d, p, 630))(
            dphi2, jnp.zeros_like(dphi2))
        out = region * lax.complex(c2[0], c2[1])
        return jnp.sum(jnp.real(out) ** 2)

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
                chk = fn(n0_j, dphi0, phi0)
            np.asarray(jax.device_get(chk))
            return time.perf_counter() - t0
        return run

    for name, fn in [("spans", f_spans), ("mix", f_mix),
                     ("conv", f_conv), ("pilot", f_pilot)]:
        sfn = chain(fn)
        sfn(n0_j, dphi0, phi0)  # compile
        sps = bm.timed_throughput(timer(sfn), K)
        print(f"{name:8s} {1e6 / sps:9.1f} us/iter")
    return 0


if __name__ == "__main__":
    sys.exit(main())


def extraction():
    """Window-extraction formulations only."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    import importlib.util, time

    B, P, n_sym, Lb, k = 16, 24, 708, 57, 2
    span = k * (n_sym - 1) + Lb
    H = 1536 + 32768
    K = 8
    rng = np.random.default_rng(0)
    bufr = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    bufi = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    n0_np = rng.integers(0, 32768, (B, P)).astype(np.int32)
    n0_j = jnp.asarray(n0_np)

    def chain(fn):
        @jax.jit
        def stepK(n0):
            def body(c, _):
                v = fn(n0 + (c.astype(jnp.int32) % 2))
                return v * 1e-20 + c * 0.5, None
            c, _ = lax.scan(body, jnp.float32(0), None, length=K)
            return c
        return stepK

    def f_ds(n0):
        def one(b1, s1):
            return jax.vmap(
                lambda s: lax.dynamic_slice(b1, (s,), (span,)))(s1)
        return jnp.sum(jax.vmap(one)(bufr, n0)) + \
            jnp.sum(jax.vmap(one)(bufi, n0))

    def f_ds_aligned(n0):
        c64 = (n0 // 64) * 64
        def one(b1, s1):
            return jax.vmap(
                lambda s: lax.dynamic_slice(b1, (s,), (span + 64,)))(s1)
        return jnp.sum(jax.vmap(one)(bufr, c64)) + \
            jnp.sum(jax.vmap(one)(bufi, c64))

    def onehot_extract(Q):
        nf = H // Q
        wl = span + Q                       # coarse window length
        # static frame index [nf, wl] (overlapping rows, stride Q)
        fidx = (np.arange(nf)[:, None] * Q +
                np.arange(wl)[None, :]).clip(0, H - 1)

        def f(n0):
            c = n0 // Q                      # [B, P]
            oh = jax.nn.one_hot(c, nf, dtype=jnp.float32)  # [B, P, nf]
            Fr = bufr[:, jnp.asarray(fidx)]  # [B, nf, wl] static gather
            Fi = bufi[:, jnp.asarray(fidx)]
            wr = jnp.einsum("bpf,bfw->bpw", oh, Fr)
            wi = jnp.einsum("bpf,bfw->bpw", oh, Fi)
            return jnp.sum(wr) + jnp.sum(wi)
        return f

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
                chk = fn(n0_j)
            np.asarray(jax.device_get(chk))
            return time.perf_counter() - t0
        return run

    for name, fn in [("dyn-slice", f_ds),
                     ("dyn-slice-64aligned", f_ds_aligned),
                     ("onehot-Q64", onehot_extract(64)),
                     ("onehot-Q256", onehot_extract(256)),
                     ("onehot-Q512", onehot_extract(512))]:
        sfn = chain(fn)
        sfn(n0_j)
        sps = bm.timed_throughput(timer(sfn), K)
        print(f"{name:20s} {1e6 / sps:9.1f} us/iter")
