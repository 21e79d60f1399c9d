#!/usr/bin/env python
"""Stage-level timing of the streaming framesync64 receiver on real
hardware: where do the 3.5 ms/block go?

Measures, with the same chained-checksum methodology as bench.py:
  A. detection front half only (detector_stream: segment FFTs +
     correlate + refine)
  B. the full preamble_stream (A + MF symbol gather + pilot sync)
  C. framesync64_stream (B + frame64 post-processing)
Differences isolate the matched-filter and pilot stages.

Usage: python tools/exp_rx_profile.py [batch] [block]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import importlib.util
    import os
    import subprocess
    import tempfile

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax
        jax.config.update("jax_platforms", "cpu")  # sitecustomize re-pins
    import jax
    import jax.numpy as jnp

    from liquid_dsp_tpu.framing.frame64 import (FRAME64_LEN,
                                                _detector_template,
                                                framesync64_stream)
    from liquid_dsp_tpu.framing.stream_rx import detector_stream

    spec = importlib.util.spec_from_file_location(
        "benchmod",
        pathlib.Path(__file__).resolve().parent.parent / "bench.py")
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

    # frame-bearing stream generated in a CPU child (eager complex jnp
    # ops would poison the tunnel — PERF.md backend caveats)
    gen = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np, sys\n"
        "sys.path.insert(0, %r)\n"
        "from liquid_dsp_tpu.framing.frame64 import FRAME64_LEN, framegen64\n"
        "batch, T = %d, %d\n"
        "rng = np.random.default_rng(0)\n"
        "x = np.zeros((batch, T), np.complex64)\n"
        "for b in range(batch):\n"
        "    s0 = int(rng.integers(0, T - FRAME64_LEN - 1))\n"
        "    x[b, s0:s0 + FRAME64_LEN] = framegen64(\n"
        "        rng.integers(0, 256, 8).astype(np.uint8),\n"
        "        rng.integers(0, 256, 64).astype(np.uint8))\n"
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

    def measure(label, proc, chk_fn):
        carry0 = jax.jit(lambda: proc.init(batch_shape=(batch,)))()

        @jax.jit
        def step(c, r, i):
            out, c2 = proc.apply((), c, jax.lax.complex(r, i))
            return c2, chk_fn(out)

        c, chk = step(carry0, xr, xi)
        float(np.asarray(chk))
        def run_trials(n):
            t0 = time.perf_counter()
            c, chk = carry0, None
            for _ in range(n):
                c, chk = step(c, xr, xi)
            float(np.asarray(chk))
            return time.perf_counter() - t0
        msps = bm.timed_throughput(run_trials, batch * T) / 1e6
        print(f"{label:30s} {msps:8.1f} Msps   "
              f"({batch * T / msps:7.1f} us/block-set)")
        return msps

    det = detector_stream(T, _detector_template(),
                          suppress_span=FRAME64_LEN - 8,
                          max_frames=T // FRAME64_LEN + 2)
    measure("A detect+refine only", det,
            lambda o: jnp.sum(o.rxy) + jnp.sum(o.dphi))
    from liquid_dsp_tpu.framing import frame64 as f64
    from liquid_dsp_tpu.framing.stream_rx import preamble_stream
    pre = preamble_stream(T, f64._stream_cfg(),
                          max_frames=T // FRAME64_LEN + 2)
    measure("B preamble_stream (A+MF+pilot)", pre,
            lambda o: jnp.sum(jnp.real(o.region_syms) ** 2) +
            jnp.sum(o.rxy))
    full = framesync64_stream(T)
    measure("C full framesync64 stream", full,
            lambda o: jnp.sum(jnp.real(o.symbols) ** 2) + jnp.sum(o.rxy))


if __name__ == "__main__":
    sys.exit(main())
