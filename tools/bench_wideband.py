"""Full-system wideband scanner throughput: 64-channel oversampled
polyphase analyzer feeding ONE batched streaming frame64 receiver over
every channel — the whole scanner is a single jitted step (the
examples/wideband_scanner_example.py pipeline, timed).

Value-verified (decoded-frame count + checksum read back inside the
timed region).  Usage: python tools/bench_wideband.py [B] [T_wideband]
Prints one JSON line with WIDEBAND Msamples/s (channel-domain rate is
2x that: the analyzer is 2x oversampled).
"""
import json
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import os
    import jax
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")   # sitecustomize re-pins
    import jax.numpy as jnp
    import bench as bm
    from liquid_dsp_tpu.multichannel import firpfbch2_analyzer
    from liquid_dsp_tpu.framing.frame64 import framesync64_stream

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    Tw = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    M = 64
    Tc = 2 * Tw // M                  # per-channel samples per block

    # --- build the wideband capture in a CPU child process: the tunnel
    # intermittently lacks complex transfers, and a failed one would
    # poison this process (PERF.md; same pattern as bench_frame64_rx) --
    cap = REPO / "tools" / "_wideband_cap.npy"
    gen = (
        "import sys, numpy as np, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "sys.path.insert(0, %r)\n"
        "import jax.numpy as jnp\n"
        "from liquid_dsp_tpu.multichannel import firpfbch2_synthesizer\n"
        "from liquid_dsp_tpu.framing.frame64 import FRAME64_LEN, framegen64\n"
        "B, M, Tc = %d, %d, %d\n"
        "rng = np.random.default_rng(0)\n"
        "chans = (0.002 * (rng.standard_normal((B, M, Tc)) +\n"
        "         1j * rng.standard_normal((B, M, Tc)))).astype(np.complex64)\n"
        "n = 0\n"
        "for b in range(B):\n"
        "    for ch in rng.choice(M, 6, replace=False):\n"
        "        pos = int(rng.integers(100, Tc - FRAME64_LEN - 100))\n"
        "        fr = framegen64(rng.integers(0, 256, 8).astype(np.uint8),\n"
        "                        rng.integers(0, 256, 64).astype(np.uint8))\n"
        "        chans[b, ch, pos:pos + FRAME64_LEN] += fr\n"
        "        n += 1\n"
        "wide, _ = firpfbch2_synthesizer(M)(jnp.asarray(chans),\n"
        "                                   batch_shape=(B,))\n"
        "np.save(sys.argv[1], np.asarray(wide))\n"
        "print(n)\n"
    ) % (str(REPO), B, M, Tc)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", gen, str(cap)],
                       capture_output=True, text=True, env=env,
                       timeout=540)
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        return 1
    n_frames = int(r.stdout.strip().splitlines()[-1])
    wide_np = np.load(cap)            # [B, Tw]
    cap.unlink()

    # HIGH matmul precision: 1.3e-5 on-chip error (golden tolerance is
    # 2e-4) at 1.4x the HIGHEST-precision throughput — right tradeoff
    # for a detection front-end (channelizer.py docstring)
    import jax.lax as _lax
    ana = firpfbch2_analyzer(M, precision=_lax.Precision.HIGH)
    rx = framesync64_stream(Tc)

    # K blocks chained inside one jit (carries flow block to block,
    # StreamRunner's execution shape) to amortize per-dispatch tunnel
    # overhead — see bench.py headline note / tools/profile_device.py
    K = 8 if jax.default_backend() != "cpu" else 1

    @jax.jit
    def step(ca, cr, xr, xi):
        def body(cc, _):
            ca_in, cr_in, acc = cc
            x = jax.lax.complex(xr, xi)
            streams, ca2 = ana.apply(ana.params, ca_in, x)   # [B, M, Tc]
            out, cr2 = rx.apply((), cr_in, streams)
            acc = acc + (jnp.sum(out.valid) +
                         jnp.sum(jnp.where(out.valid, out.rxy, 0.0)))
            return (ca2, cr2, acc), None
        (ca2, cr2, chk), _ = jax.lax.scan(
            body, (ca, cr, jnp.float32(0)), None, length=K)
        return ca2, cr2, chk

    carry_a = jax.jit(lambda: ana.init(batch_shape=(B,)))()
    carry_r = jax.jit(lambda: rx.init(batch_shape=(B, M)))()
    xr = jnp.asarray(wide_np.real.copy())
    xi = jnp.asarray(wide_np.imag.copy())

    ca, cr, chk = step(carry_a, carry_r, xr, xi)
    n_dec = float(np.asarray(jnp.sum(
        step(carry_a, carry_r, xr, xi)[2])))  # warm + sanity
    print(f"# frames in capture: {n_frames}, first-pass chk {n_dec:.1f}",
          file=sys.stderr)

    def run(n):
        t0 = time.perf_counter()
        ca, cr, chk = carry_a, carry_r, None
        for _ in range(n):
            ca, cr, chk = step(ca, cr, xr, xi)
        float(np.asarray(chk))
        return time.perf_counter() - t0

    msps = bm.timed_throughput(run, K * B * Tw) / 1e6
    print(json.dumps({"metric": "wideband_scanner_64ch",
                      "wideband_msps": round(msps, 1),
                      "channel_msps": round(2 * msps, 1),
                      "batch": B, "wideband_block": Tw,
                      "frames": n_frames}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
