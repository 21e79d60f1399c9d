#!/usr/bin/env python
"""Device-time comparison of candidate-window extraction formulations
(the streaming receivers' dominant cost: vmapped dynamic_slice lowers
to a sequential while loop on TPU — tools/profile_device.py finding).

Extract [B, P, span] windows at traced starts from [B, H] planes.
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from profile_device import profile  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    B, P, span = 16, 24, 1477
    H = 1536 + 32768
    rng = np.random.default_rng(0)
    bufr = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    bufi = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    n0 = jnp.asarray(rng.integers(0, 32768, (B, P)).astype(np.int32))

    def reduce2(sr, si):
        return jnp.sum(sr * 1.000001) + jnp.sum(si * 0.999999)

    # A: vmapped dynamic_slice (shipping)
    @jax.jit
    def f_ds(buf_r, buf_i, starts):
        def one(b1, s1):
            return jax.vmap(
                lambda s: lax.dynamic_slice(b1, (s,), (span,)))(s1)
        return reduce2(jax.vmap(one)(buf_r, starts),
                       jax.vmap(one)(buf_i, starts))

    # B: per-element static-offset gather (jnp.take of start+arange)
    @jax.jit
    def f_take(buf_r, buf_i, starts):
        idx = starts[..., None] + np.arange(span)[None, None, :]
        sr = jnp.take_along_axis(buf_r[:, None, :],
                                 jnp.broadcast_to(idx, (B, P, span)), axis=-1)
        si = jnp.take_along_axis(buf_i[:, None, :],
                                 jnp.broadcast_to(idx, (B, P, span)), axis=-1)
        return reduce2(sr, si)

    # C: one-hot MXU matmul against a statically-framed buffer (Q=256)
    Q = 256
    nf = H // Q
    wl = span + Q
    fidx = (np.arange(nf)[:, None] * Q +
            np.arange(wl)[None, :]).clip(0, H - 1)

    @jax.jit
    def f_onehot(buf_r, buf_i, starts):
        c = starts // Q
        oh = jax.nn.one_hot(c, nf, dtype=jnp.float32)     # [B, P, nf]
        Fr = buf_r[:, jnp.asarray(fidx)]                  # [B, nf, wl]
        Fi = buf_i[:, jnp.asarray(fidx)]
        wr = jnp.einsum("bpf,bfw->bpw", oh, Fr)
        wi = jnp.einsum("bpf,bfw->bpw", oh, Fi)
        # residual shift r in [0, Q) left to the consumer
        return reduce2(wr, wi)

    # D: both planes through ONE vmapped dynamic_slice (stack planes)
    @jax.jit
    def f_ds_stacked(buf_r, buf_i, starts):
        bs = jnp.stack([buf_r, buf_i], axis=1)            # [B, 2, H]
        def one(b2, s1):
            return jax.vmap(lambda s: lax.dynamic_slice(
                b2, (0, s), (2, span)))(s1)               # [P, 2, span]
        out = jax.vmap(one)(bs, starts)
        return reduce2(out[:, :, 0], out[:, :, 1])

    for name, fn in [("dyn-slice", f_ds), ("take-windows", f_take),
                     ("onehot-mxu-Q256", f_onehot),
                     ("dyn-slice-stacked", f_ds_stacked)]:
        rows = profile(lambda: fn(bufr, bufi, n0), iters=5, top=4)
        top = rows[0]
        print(f"{name:18s} {top[1]/5:9.1f} us/iter   ({top[0][:40]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())


def more():
    """Unrolled-candidate and fused-union-window variants."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    B, P, span = 16, 24, 1477
    H = 1536 + 32768
    rng = np.random.default_rng(0)
    bufr = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    bufi = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    n0 = jnp.asarray(rng.integers(0, 32768, (B, P)).astype(np.int32))

    def reduce2(sr, si):
        return jnp.sum(sr * 1.000001) + jnp.sum(si * 0.999999)

    @jax.jit
    def f_stacked(buf_r, buf_i, starts):
        bs = jnp.stack([buf_r, buf_i], axis=1)
        def one(b2, s1):
            return jax.vmap(lambda s: lax.dynamic_slice(
                b2, (0, s), (2, span)))(s1)
        out = jax.vmap(one)(bs, starts)
        return reduce2(out[:, :, 0], out[:, :, 1])

    @jax.jit
    def f_unrolled(buf_r, buf_i, starts):
        bs = jnp.stack([buf_r, buf_i], axis=1)          # [B, 2, H]
        outs = []
        for p in range(P):
            o = jax.vmap(lambda b2, s: lax.dynamic_slice(
                b2, (0, s), (2, span)))(bs, starts[:, p])
            outs.append(o)
        out = jnp.stack(outs, axis=1)                   # [B, P, 2, span]
        return reduce2(out[:, :, 0], out[:, :, 1])

    @jax.jit
    def f_unrolled_bp(buf_r, buf_i, starts):
        # fully unrolled: one dynamic_slice per (b, p) — no vmap at all
        bs = jnp.stack([buf_r, buf_i], axis=1)
        acc_r = jnp.float32(0)
        acc_i = jnp.float32(0)
        for p in range(P):
            for b in range(B):
                w = lax.dynamic_slice(bs[b], (0, starts[b, p]), (2, span))
                acc_r += jnp.sum(w[0] * 1.000001)
                acc_i += jnp.sum(w[1] * 0.999999)
        return acc_r + acc_i

    for name, fn in [("stacked (base)", f_stacked),
                     ("unrolled-P", f_unrolled),
                     ("unrolled-BP", f_unrolled_bp)]:
        rows = profile(lambda: fn(bufr, bufi, n0), iters=5, top=3)
        print(f"{name:16s} {rows[0][1]/5:9.1f} us/iter")


def pallas_variant():
    """Pallas DMA gather: per-(b,p) async copy of [2, U] windows."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools

    B, P, span = 16, 24, 1536
    H = 1536 + 32768
    U = span
    rng = np.random.default_rng(0)
    bufr = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    bufi = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    n0 = jnp.asarray(rng.integers(0, 32768, (B, P)).astype(np.int32))

    def kern(starts_ref, buf_ref, out_ref, sem0, sem1):
        b = pl.program_id(0)
        p = pl.program_id(1)
        s = starts_ref[b * P + p]
        cp0 = pltpu.make_async_copy(
            buf_ref.at[b, 0, pl.ds(s, U)], out_ref.at[0, 0, 0], sem0)
        cp1 = pltpu.make_async_copy(
            buf_ref.at[b, 1, pl.ds(s, U)], out_ref.at[0, 0, 1], sem1)
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()

    @jax.jit
    def f_pallas(buf_r, buf_i, starts):
        bs = jnp.stack([buf_r, buf_i], axis=1)           # [B, 2, H]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, P),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 1, 2, U), lambda b, p, _: (b, p, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, P, 2, U), jnp.float32),
        )(starts.reshape(-1), bs)
        return jnp.sum(out[:, :, 0] * 1.000001) + \
            jnp.sum(out[:, :, 1] * 0.999999)

    @jax.jit
    def f_stacked(buf_r, buf_i, starts):
        bs = jnp.stack([buf_r, buf_i], axis=1)
        def one(b2, s1):
            return jax.vmap(lambda s: lax.dynamic_slice(
                b2, (0, s), (2, U)))(s1)
        out = jax.vmap(one)(bs, starts)
        return jnp.sum(out[:, :, 0] * 1.000001) + \
            jnp.sum(out[:, :, 1] * 0.999999)

    a = float(np.asarray(f_stacked(bufr, bufi, n0)))
    try:
        b = float(np.asarray(f_pallas(bufr, bufi, n0)))
        print("checksums", a, b)
    except Exception as e:
        print("pallas failed:", type(e).__name__, str(e)[:300])
        return
    for name, fn in [("stacked", f_stacked), ("pallas-dma", f_pallas)]:
        rows = profile(lambda: fn(bufr, bufi, n0), iters=5, top=3)
        print(f"{name:12s} {rows[0][1]/5:9.1f} us/iter")
