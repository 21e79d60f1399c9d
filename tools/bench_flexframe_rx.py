#!/usr/bin/env python
"""Throughput of the flexframe streaming receiver's TPU-resident stage
(detect-everywhere + refine + header region extraction), batched over
independent channels — the second receiver family's number next to
tools/bench_frame64_rx.py.

Same methodology (planar host I/O, chained carries, checksum readback,
two-point calibration).  Prints one JSON line.
"""
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import os
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from liquid_dsp_tpu.framing.flexframe import flexframesync_stream

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    proc = flexframesync_stream(T)
    print(f"backend: {jax.devices()[0].platform}", file=sys.stderr)

    # capture with real flexframes (qpsk payload, golay header), built
    # in a CPU child process (complex transfers poison the tunnel)
    import subprocess
    import tempfile
    gen = (
        "import os; os.environ['JAX_PLATFORMS']='cpu';\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np, sys\n"
        "sys.path.insert(0, %r)\n"
        "from liquid_dsp_tpu.framing.flexframe import flexframegen\n"
        "batch, T = %d, %d\n"
        "rng = np.random.default_rng(0)\n"
        "x = np.zeros((batch, T), np.complex64)\n"
        "for b in range(batch):\n"
        "    pos = 100\n"
        "    while True:\n"
        "        h = rng.integers(0, 256, 14).astype(np.uint8)\n"
        "        p = rng.integers(0, 256, 80).astype(np.uint8)\n"
        "        f = flexframegen(h, p, ms='qpsk')\n"
        "        if pos + len(f) + 100 > T: break\n"
        "        x[b, pos:pos + len(f)] = f\n"
        "        pos += len(f) + int(rng.integers(600, 1800))\n"
        "x += (0.01 * (rng.standard_normal(x.shape) +\n"
        "              1j * rng.standard_normal(x.shape))).astype(np.complex64)\n"
        "np.save(sys.argv[1], x)\n"
    ) % (str(pathlib.Path(__file__).resolve().parent.parent), batch, T)
    with tempfile.NamedTemporaryFile(suffix=".npy") as tf:
        subprocess.run([sys.executable, "-c", gen, tf.name], check=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
        x = np.load(tf.name)

    xr = jnp.asarray(x.real.copy())
    xi = jnp.asarray(x.imag.copy())
    carry0 = jax.jit(lambda: proc.init(batch_shape=(batch,)))()

    @jax.jit
    def step(c, r, i):
        out, c2 = proc.apply((), c, jax.lax.complex(r, i))
        chk = (jnp.sum(jnp.real(out.region_syms) ** 2) +
               jnp.sum(out.rxy))
        return c2, chk, jnp.sum(out.valid)

    c, chk, nfr = step(carry0, xr, xi)
    float(np.asarray(chk))
    frames_per_block = int(np.asarray(nfr))

    def run_trials(n):
        t0 = time.perf_counter()
        c, chk = carry0, None
        for _ in range(n):
            c, chk, _ = step(c, xr, xi)
        float(np.asarray(chk))
        return time.perf_counter() - t0

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod",
        pathlib.Path(__file__).resolve().parent.parent / "bench.py")
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)
    msps = bm.timed_throughput(run_trials, batch * T) / 1e6

    print(json.dumps({"metric": "flexframesync_stream",
                      "msps": round(msps, 2), "batch": batch, "block": T,
                      "frames_per_block": frames_per_block}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
