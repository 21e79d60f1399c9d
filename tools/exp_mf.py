#!/usr/bin/env python
"""Matched-filter symbol-stage formulations, timed on real hardware.

The shipping mf_symbol_gather uses a feature-grouped strided conv
(one group per candidate, ONE output channel per group — a matvec per
group, never MXU-shaped).  Candidates:
  conv      shipping depthwise strided conv
  winred    static-index windowing [P, n_sym, Lb] + multiply-reduce
  winred-pl same, on float planes end to end
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

    batch, P, n_sym, Lb, k = 16, 24, 708, 57, 2
    span = k * (n_sym - 1) + Lb
    rng = np.random.default_rng(0)
    spans_np = (rng.standard_normal((batch, P, span)) +
                1j * rng.standard_normal((batch, P, span))).astype(np.complex64)
    taps_np = rng.standard_normal((batch, P, Lb)).astype(np.float32)
    sr = jnp.asarray(spans_np.real.copy())
    si = jnp.asarray(spans_np.imag.copy())
    tp = jnp.asarray(taps_np)

    dn = ("NCH", "OIH", "NCH")

    @jax.jit
    def f_conv(sr, si, tp):
        def one(vr, vi, taps):
            def dwconv(x):
                y = lax.conv_general_dilated(
                    x[None], taps[:, None, :], window_strides=(k,),
                    padding="VALID", dimension_numbers=dn,
                    feature_group_count=P)
                return y[0]
            return dwconv(vr), dwconv(vi)
        yr, yi = jax.vmap(one)(sr, si, tp)
        return jnp.sum(yr ** 2) + jnp.sum(yi ** 2)

    idx = (np.arange(n_sym)[:, None] * k + np.arange(Lb)[None, :])

    @jax.jit
    def f_winred(sr, si, tp):
        Wr = sr[:, :, idx]                       # [B, P, n_sym, Lb]
        Wi = si[:, :, idx]
        yr = jnp.einsum("bpnl,bpl->bpn", Wr, tp)
        yi = jnp.einsum("bpnl,bpl->bpn", Wi, tp)
        return jnp.sum(yr ** 2) + jnp.sum(yi ** 2)

    a = float(np.asarray(f_conv(sr, si, tp)))
    b = float(np.asarray(f_winred(sr, si, tp)))
    print("checksums", a, b, file=sys.stderr)

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
                chk = fn()
            np.asarray(jax.device_get(chk))
            return time.perf_counter() - t0
        return run

    # report us per call (the unit that matters inside the receiver)
    for name, fn in [("conv", lambda: f_conv(sr, si, tp)),
                     ("winred", lambda: f_winred(sr, si, tp)),
                     ("conv2", lambda: f_conv(sr, si, tp)),
                     ("winred2", lambda: f_winred(sr, si, tp))]:
        sps = bm.timed_throughput(timer(fn), 1)
        print(f"{name:10s} {1e6 / sps:9.1f} us/call")
    return 0


if __name__ == "__main__":
    sys.exit(main())


def variant2():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import importlib.util, time
    batch, P, n_sym, Lb, k = 16, 24, 708, 57, 2
    span = k * (n_sym - 1) + Lb
    rng = np.random.default_rng(0)
    spans_np = (rng.standard_normal((batch, P, span)) +
                1j * rng.standard_normal((batch, P, span))).astype(np.complex64)
    taps_np = rng.standard_normal((batch, P, Lb)).astype(np.float32)
    sr = jnp.asarray(spans_np.real.copy())
    si = jnp.asarray(spans_np.imag.copy())
    tp = jnp.asarray(taps_np)
    dn = ("NCH", "OIH", "NCH")
    G = batch * P

    @jax.jit
    def f_onecall(sr, si, tp):
        # both planes as a batch of 2, all B*P candidates as groups
        x = jnp.stack([sr.reshape(G, span), si.reshape(G, span)])  # [2,G,span]
        t = tp.reshape(G, 1, Lb)
        y = lax.conv_general_dilated(
            x, t, window_strides=(k,), padding="VALID",
            dimension_numbers=dn, feature_group_count=G)   # [2, G, n_sym]
        return jnp.sum(y ** 2)

    @jax.jit
    def f_mxu(sr, si, tp):
        # windows via ONE im2col conv against a static identity band
        # (taps-independent), then the per-candidate matvec as einsum on
        # the [.., Lb] minor axis: W[b,p,n,l] = spans[b,p,2n+l]
        eye = jnp.eye(Lb, dtype=sr.dtype).reshape(Lb, 1, Lb)
        x = jnp.stack([sr.reshape(G, span), si.reshape(G, span)])
        W = lax.conv_general_dilated(
            x.reshape(2 * G, 1, span), eye, window_strides=(k,),
            padding="VALID", dimension_numbers=dn)  # [2G, Lb, n_sym]
        W = W.reshape(2, batch, P, Lb, n_sym)
        y = jnp.einsum("sbpln,bpl->sbpn", W, tp)
        return jnp.sum(y ** 2)

    a = float(np.asarray(f_onecall(sr, si, tp)))
    b = float(np.asarray(f_mxu(sr, si, tp)))
    print("checksums", a, b, file=sys.stderr)

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

    for name, fn in [("onecall", lambda: f_onecall(sr, si, tp)),
                     ("im2col+einsum", lambda: f_mxu(sr, si, tp)),
                     ("onecall2", lambda: f_onecall(sr, si, tp)),
                     ("im2col2", lambda: f_mxu(sr, si, tp))]:
        sps = bm.timed_throughput(timer(fn), 1)
        print(f"{name:14s} {1e6 / sps:9.1f} us/call")
