"""Kaiser-Bessel-derived window and its perfect-reconstruction property
(reference kbd_window_example.c)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.design.windows import kbd, kaiser, hamming

n, beta = 64, 10.0
w = np.asarray(kbd(n, beta), np.float64)
print(f"KBD window n={n} beta={beta}")

# Princen-Bradley condition for 50%-overlapped MDCT lapping:
# w[i]^2 + w[i+n/2]^2 == 1 for all i
pb = w[: n // 2] ** 2 + w[n // 2:] ** 2
print(f"  Princen-Bradley max deviation: {np.abs(pb - 1).max():.2e}")
assert np.abs(pb - 1).max() < 1e-6

# overlap-added squared windows give a flat analysis/synthesis gain
frames = 8
hop = n // 2
ola = np.zeros(hop * (frames + 1))
for f in range(frames):
    ola[f * hop: f * hop + n] += w ** 2
core = ola[hop: -hop]
print(f"  OLA(w^2) flatness over {frames} frames: "
      f"{core.min():.6f}..{core.max():.6f}")
assert np.allclose(core, 1.0, atol=1e-6)

for name, ww in (("kaiser", kaiser(n, beta)), ("hamming", hamming(n))):
    pb2 = ww[: n // 2] ** 2 + ww[n // 2:] ** 2
    print(f"  {name:8s} max PB deviation {np.abs(pb2 - 1).max():.3f} "
          f"(not a lapped-transform window)")
