#!/usr/bin/env python
"""Batched device LDPC BP decode rate on the current backend.

Regular-ish H (col weight 3), batch of noisy AWGN codewords, fixed
BP iterations (min-sum) in one jitted call; timing via
bench_suite.bench (two-point calibration + chained checksum readback).
Prints one JSON line per config with the decode rate in INFO kbit/s.
Reference analog: src/fec/src/sumproduct.c (one codeword at a time on
the CPU; no batched mode exists there).
"""
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from bench_suite import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from liquid_dsp_tpu.fec.ldpc import (make_regular_ldpc,
                                         ldpc_encode_systematic,
                                         ldpc_decoder_device)
    print(f"backend: {jax.devices()[0].platform}", file=sys.stderr)
    rng = np.random.default_rng(0)
    for (n, k, iters, B) in ((96, 48, 20, 256), (1024, 512, 20, 64),
                             (1024, 512, 20, 256)):
        H = make_regular_ldpc(n, k, col_weight=3, seed=0)
        dec = ldpc_decoder_device(H, max_iters=iters, min_sum=True)
        cws = []
        for _ in range(B):
            msg = rng.integers(0, 2, k).astype(np.uint8)
            cw, _ = ldpc_encode_systematic(H, msg)
            cws.append(cw)
        cw = np.stack(cws)
        y = 1.0 - 2.0 * cw + 0.7 * rng.standard_normal(cw.shape)
        llr = jnp.asarray((2 * y / 0.49).astype(np.float32))
        hard, ok = jax.jit(dec)(llr)
        frac = float(np.asarray(ok).mean())
        correct = float((np.asarray(hard) == cw).all(-1).mean())

        def step(params, carry, x):
            h2, ok2 = dec(x)
            return h2.astype(jnp.float32), carry

        msps = bench(jax.jit(step), (), (), llr)
        kbps = msps * 1e3 * k / n        # info bits per llr sample
        print(json.dumps({"case": f"ldpc_{n}_{k}_minsum_B{B}",
                          "iters": iters, "kbit_s": round(kbps, 1),
                          "decoded_ok": round(frac, 3),
                          "bit_correct": round(correct, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
