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
