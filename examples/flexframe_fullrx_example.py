"""Full-device fixed-config flexframe receiver: one jitted block step
runs detect-everywhere through byte pack + CRC (two-stage SECDED +
hamming header FEC as GF(2) matmuls on device).  The host only reads
the decoded bytes (reference analog: flexframesync.c runs the same
stages per-sample on the CPU)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import os
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import numpy as np
import jax.numpy as jnp
from liquid_dsp_tpu.framing.flexframe import (flexframegen,
                                              flexframe_rx_stream)

rng = np.random.default_rng(0)
T, PL = 2048, 40
proc = flexframe_rx_stream(T, PL)

# three frames at random offsets, CFO + noise
parts, sent, pos = [], [], 0
for gap in (900, 1500, 700):
    h = rng.integers(0, 256, 14).astype(np.uint8)
    p = rng.integers(0, 256, PL).astype(np.uint8)
    f = flexframegen(h, p)
    parts += [np.zeros(gap, np.complex64), f]
    sent.append((h, p))
    pos += gap + len(f)
parts.append(np.zeros(8 * T - pos % T, np.complex64))
x = np.concatenate(parts)
n = np.arange(len(x))
x = (x * np.exp(1j * (0.001 * n + 0.5))).astype(np.complex64)
x += (0.005 * (rng.standard_normal(len(x)) +
               1j * rng.standard_normal(len(x)))).astype(np.complex64)

c = proc.init()
step = jax.jit(proc.apply)
decoded = 0
for b in range(len(x) // T):
    out, c = step((), c, jnp.asarray(x[b * T:(b + 1) * T]))
    v = np.asarray(out.valid)
    for s in np.nonzero(v)[0]:
        hok = bool(np.asarray(out.hdr_ok[s]))
        pok = bool(np.asarray(out.pay_ok[s]))
        hdr = np.asarray(out.hdr_bytes[s][:14]).astype(np.uint8)
        pay = np.asarray(out.pay_bytes[s]).astype(np.uint8)
        h0, p0 = sent[decoded]
        assert hok and pok and (hdr == h0).all() and (pay == p0).all()
        decoded += 1
        print(f"frame {decoded}: header_ok={hok} payload_ok={pok} "
              f"bytes exact")
assert decoded == 3
print("all 3 frames decoded entirely on device")
