#!/usr/bin/env python
"""Block state-space IIR vs sequential scan on the current backend.

Sweeps the block length L for iirfilt_sos (butter order 7, the per-op
suite's config) at the suite shape [16, 131072] float32, single
dispatch per block, value-verified (bench_suite.bench methodology).
Prints one JSON line per row.  Reference analog: iirfilt.c per-sample
DF2T loop (the reference has no block formulation).
"""
import json
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from bench_suite import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from liquid_dsp_tpu.ops.iir import iirfilt_sos
    from liquid_dsp_tpu.design.iirdes import iirdes_sos

    print(f"backend: {jax.devices()[0].platform}", file=sys.stderr)
    B, A = iirdes_sos("butter", 7, 0.2)
    rng = np.random.default_rng(0)
    batch, T = 16, 1 << 17
    xr = jnp.asarray(rng.standard_normal((batch, T)).astype(np.float32))

    rows = [("scan", dict(backend="scan"))]
    for L in (64, 128, 256, 512, 1024):
        rows.append((f"block_L{L}", dict(backend="block", block_size=L)))
    for name, kw in rows:
        proc = iirfilt_sos(B, A, **kw)
        carry = jax.jit(lambda p=proc: p.init(batch_shape=(batch,),
                                              dtype=jnp.float32))()
        params = jax.jit(lambda p=proc: p.params)()
        msps = bench(jax.jit(proc.apply), params, carry, xr)
        print(json.dumps({"case": f"iirfilt_sos7_{name}",
                          "msps": round(msps, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
