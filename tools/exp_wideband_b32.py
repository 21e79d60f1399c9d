#!/usr/bin/env python
"""Isolate the wideband scanner's residual B=32 regression and the
HIGH/HIGHEST ~12% delta (VERDICT r4 item 8): measure the ANALYZER
alone, the RECEIVER alone, and the COMBINED program at B in {16, 32}
and both matmul precisions, same methodology as bench_wideband.py.

If the combined number at B=32 drops more than the worse of its two
stages, the gap is cross-stage scheduling (MXU contention); if one
stage alone reproduces it, it is that stage's shape regression.
"""
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import os
    import jax
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import jax.lax as _lax
    import bench as bm
    from liquid_dsp_tpu.multichannel import firpfbch2_analyzer
    from liquid_dsp_tpu.framing.frame64 import framesync64_stream

    M, Tw = 64, 65536
    Tc = 2 * Tw // M
    K = 8
    rng = np.random.default_rng(0)
    results = {}

    def timed(stepfn, carries, args, samples):
        out = stepfn(*carries, *args)
        float(np.asarray(out[-1]))

        def run(n):
            t0 = time.perf_counter()
            chk = None
            cs = carries
            for _ in range(n):
                out = stepfn(*cs, *args)
                cs = out[:-1]
                chk = out[-1]
            float(np.asarray(chk))
            return time.perf_counter() - t0

        return bm.timed_throughput(run, samples) / 1e6

    for B in (16, 32):
        xr = jnp.asarray(rng.standard_normal((B, Tw)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((B, Tw)).astype(np.float32))
        sr = jnp.asarray(0.01 * rng.standard_normal(
            (B, M, Tc)).astype(np.float32))
        si = jnp.asarray(0.01 * rng.standard_normal(
            (B, M, Tc)).astype(np.float32))
        for prec, pname in ((_lax.Precision.HIGH, "HIGH"),
                            (_lax.Precision.HIGHEST, "HIGHEST")):
            ana = firpfbch2_analyzer(M, precision=prec)
            ca0 = jax.jit(lambda a=ana, B=B: a.init(batch_shape=(B,)))()

            @jax.jit
            def astep(ca, xr, xi, a=ana):
                def body(cc, _):
                    ca_in, acc = cc
                    y, ca2 = a.apply(a.params, ca_in,
                                     jax.lax.complex(xr, xi))
                    return (ca2, acc + jnp.sum(jnp.real(y[..., :2]))), None
                (ca2, chk), _ = jax.lax.scan(
                    body, (ca, jnp.float32(0)), None, length=K)
                return ca2, chk

            results[f"analyzer_B{B}_{pname}"] = round(timed(
                astep, (ca0,), (xr, xi), K * B * Tw), 1)

        # receiver alone (precision fixed inside its own kernels)
        rx = framesync64_stream(Tc)
        cr0 = jax.jit(lambda r=rx, B=B: r.init(batch_shape=(B, M)))()

        @jax.jit
        def rstep(cr, sr, si, r=rx):
            def body(cc, _):
                cr_in, acc = cc
                out, cr2 = r.apply((), cr_in, jax.lax.complex(sr, si))
                return (cr2, acc + jnp.sum(out.rxy)), None
            (cr2, chk), _ = jax.lax.scan(
                body, (cr, jnp.float32(0)), None, length=K)
            return cr2, chk

        results[f"receiver_B{B}"] = round(timed(
            rstep, (cr0,), (sr, si), K * B * Tw), 1)

        # combined at both precisions
        for prec, pname in ((_lax.Precision.HIGH, "HIGH"),
                            (_lax.Precision.HIGHEST, "HIGHEST")):
            ana = firpfbch2_analyzer(M, precision=prec)
            ca0 = jax.jit(lambda a=ana, B=B: a.init(batch_shape=(B,)))()

            @jax.jit
            def cstep(ca, cr, xr, xi, a=ana, r=rx):
                def body(cc, _):
                    ca_in, cr_in, acc = cc
                    y, ca2 = a.apply(a.params, ca_in,
                                     jax.lax.complex(xr, xi))
                    out, cr2 = r.apply((), cr_in, y)
                    return (ca2, cr2, acc + jnp.sum(out.rxy)), None
                (ca2, cr2, chk), _ = jax.lax.scan(
                    body, (ca, cr, jnp.float32(0)), None, length=K)
                return ca2, cr2, chk

            results[f"combined_B{B}_{pname}"] = round(timed(
                cstep, (ca0, cr0), (xr, xi), K * B * Tw), 1)
        for k in sorted(results):
            if f"B{B}" in k:
                print(f"# {k}: {results[k]}", file=sys.stderr)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
