#!/usr/bin/env python
"""Device-time profiler for the axon tunnel.

Wall-clock timing through the tunnel carries +-5x RPC noise per call,
which made sub-millisecond stage comparisons meaningless
(tools/exp_rx_bisect.py history).  jax.profiler DOES capture device-side
events here, so this module runs a callable under a trace and aggregates
per-op device time — the only trustworthy per-op signal on this backend.

Usage as a library:
    from profile_device import profile
    rows = profile(lambda: fn(args), iters=5)   # list of (name, us, count)

CLI: profile one of the receiver steps
    python tools/profile_device.py frame64 [batch] [block]
    python tools/profile_device.py ofdm    [batch] [block]
"""
import collections
import gzip
import json
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def profile(fn, iters: int = 5, top: int = 30):
    """Run fn() `iters` times under a jax.profiler trace; return
    [(op_name, total_device_us, count)] sorted by time."""
    import jax
    fn()                                    # compile outside the trace
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            r = None
            for _ in range(iters):
                r = fn()
            jax.tree_util.tree_map(np.asarray, r)   # readback barrier
        files = sorted(pathlib.Path(td).rglob("*.trace.json.gz"))
        if not files:
            raise RuntimeError("no trace captured")
        with gzip.open(files[-1]) as f:
            tr = json.load(f)
    ev = tr.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pids.items() if n and "TPU" in n}
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            agg[e["name"]] += float(e.get("dur", 0))
            cnt[e["name"]] += 1
    rows = [(name, us, cnt[name]) for name, us in agg.most_common(top)]
    return rows


def report(rows, iters):
    total = max((us for name, us, _ in rows if name.startswith("jit_")),
                default=sum(us for _, us, _ in rows))
    print(f"{'device us/iter':>14s}  {'count':>5s}  op")
    for name, us, c in rows:
        print(f"{us / iters:14.1f}  {c:5d}  {name[:80]}")
    print(f"# top-level ~{total / iters:.0f} us/iter")


def _stream(kind, batch, T):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((batch, T)).astype(np.float32) * .05)
    xi = jnp.asarray(rng.standard_normal((batch, T)).astype(np.float32) * .05)
    if kind == "frame64":
        from liquid_dsp_tpu.framing.frame64 import framesync64_stream
        proc = framesync64_stream(T)

        def chk(out):
            return jnp.sum(jnp.real(out.symbols) ** 2) + jnp.sum(out.rxy)
    elif kind == "ofdm":
        from liquid_dsp_tpu.multichannel.ofdm import (ofdm_detector_stream,
                                                      ofdm_params)
        proc = ofdm_detector_stream(T, ofdm_params(64, 16))

        def chk(out):
            valid, idx, cfo, peak = out
            return jnp.sum(peak) + jnp.sum(cfo)
    else:
        raise SystemExit(f"unknown target {kind}")
    carry0 = jax.jit(lambda: proc.init(batch_shape=(batch,)))()

    @jax.jit
    def step(c, r, i):
        out, c2 = proc.apply((), c, jax.lax.complex(r, i))
        return c2, chk(out)

    state = {"c": carry0}

    def once():
        state["c"], v = step(state["c"], xr, xi)
        return v
    return once


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "frame64"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 32768
    iters = 5
    rows = profile(_stream(kind, batch, T), iters=iters)
    report(rows, iters)
    return 0


if __name__ == "__main__":
    sys.exit(main())
