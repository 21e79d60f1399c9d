#!/usr/bin/env python
"""Throughput of the FULL fixed-config GMSK RX chain on device —
detect-everywhere + refine, per-candidate window extraction, batched
phase-derivative demodulation, descrambled header decode, payload
decode AND byte pack + CRC inside one jitted block step
(framing/gmskframe.gmskframe_rx_stream); only the callback is host.

Methodology matches bench_ofdmflex_rx.py: real frames in the stream,
K blocks chained in-jit with the streaming carry flowing, checksum of
decoded bytes folded through every trial, host value readback, two-
point calibration.  A correctness pass verifies every embedded frame
decodes (header fields + both CRCs, computed on device).

Prints one JSON line:
  {"metric": "gmskframe_full_rx", "msps": ..., ...}
"""
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

PAYLOAD_LEN = 64


def main():
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from liquid_dsp_tpu.framing.gmskframe import gmskframe_rx_stream

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    proc = gmskframe_rx_stream(T, PAYLOAD_LEN, fec1='golay2412')
    print(f"backend: {jax.devices()[0].platform}", file=sys.stderr)

    gen = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np, sys\n"
        "sys.path.insert(0, %r)\n"
        "from liquid_dsp_tpu.framing.gmskframe import gmskframegen\n"
        "K, batch, T, n = %d, %d, %d, %d\n"
        "rng = np.random.default_rng(0)\n"
        "x = np.zeros((K, batch, T), np.complex64)\n"
        "hdrs, pls = [], []\n"
        "for k in range(K):\n"
        "    for b in range(batch):\n"
        "        h = rng.integers(0, 256, 8).astype(np.uint8)\n"
        "        p = rng.integers(0, 256, n).astype(np.uint8)\n"
        "        f = gmskframegen(h, p, fec1='golay2412')\n"
        "        s0 = int(rng.integers(3000, T - len(f) - 64))\n"
        "        x[k, b, s0:s0 + len(f)] += f\n"
        "        hdrs.append(h); pls.append(p)\n"
        "x += (0.005 * (rng.standard_normal(x.shape) +\n"
        "               1j * rng.standard_normal(x.shape))).astype(np.complex64)\n"
        "np.savez(sys.argv[1], x=x, hdrs=np.stack(hdrs), pls=np.stack(pls))\n"
    ) % (str(pathlib.Path(__file__).resolve().parent.parent),
         K, batch, T, PAYLOAD_LEN)
    with tempfile.NamedTemporaryFile(suffix=".npz") as tf:
        subprocess.run([sys.executable, "-c", gen, tf.name], check=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
        z = np.load(tf.name)
        x, hdrs, pls = z["x"], z["hdrs"], z["pls"]

    xr = jnp.asarray(x.real.copy())
    xi = jnp.asarray(x.imag.copy())
    carry0 = jax.jit(lambda: proc.init(batch_shape=(batch,)))()

    # ---- correctness pass: every embedded frame must decode ----
    step1 = jax.jit(lambda c, r, i: proc.apply((), c, jax.lax.complex(r, i)))
    c = carry0
    got = {}
    zr = jnp.zeros_like(xr[0])
    for k in range(K + 1):      # +1 zero flush block (emit latency)
        out, c = (step1(c, xr[k], xi[k]) if k < K else step1(c, zr, zr))
        v = np.asarray(out.valid)
        hok = np.asarray(out.hdr_ok)
        pok = np.asarray(out.pay_ok)
        hb = np.asarray(out.hdr_bytes).astype(np.uint8)
        pb = np.asarray(out.pay_bytes).astype(np.uint8)
        for b in range(batch):
            for s in np.nonzero(v[b])[0]:
                if hok[b, s] and pok[b, s]:
                    got[(bytes(hb[b, s, :8]), bytes(pb[b, s]))] = True
    sent = {(bytes(hdrs[i]), bytes(pls[i])): True for i in range(len(hdrs))}
    decoded = sum(1 for key in sent if key in got)
    print(f"decoded {decoded}/{len(sent)} embedded frames",
          file=sys.stderr)

    # ---- timed path: K blocks chained in ONE jit via lax.scan ----
    @jax.jit
    def step(c, r, i):
        def body(cc, ri):
            out, c2 = proc.apply((), cc, jax.lax.complex(ri[0], ri[1]))
            s = (jnp.sum(out.hdr_bytes.astype(jnp.float32)) +
                 jnp.sum(out.pay_bytes.astype(jnp.float32)) +
                 jnp.sum(out.rxy))
            return c2, s
        c2, ss = jax.lax.scan(body, c, (r, i))
        return c2, jnp.sum(ss)

    c, chk = step(carry0, xr, xi)
    float(np.asarray(chk))

    def run_trials(n):
        t0 = time.perf_counter()
        c, chk = carry0, None
        for _ in range(n):
            c, chk = step(c, xr, xi)
        float(np.asarray(chk))
        return time.perf_counter() - t0

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod",
        pathlib.Path(__file__).resolve().parent.parent / "bench.py")
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)
    msps = bm.timed_throughput(run_trials, K * batch * T) / 1e6

    print(json.dumps({"metric": "gmskframe_full_rx",
                      "msps": round(msps, 2), "batch": batch, "block": T,
                      "k_blocks": K, "frames": len(sent),
                      "decoded": decoded}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
