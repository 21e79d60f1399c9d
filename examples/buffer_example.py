"""Host-side buffer objects: sliding window, circular buffer, delay line
(reference window_example.c / cbuffer_example.c / wdelay_example.c).
In streaming pipelines these live inside Proc carries; the standalone
objects serve host-side glue code."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.utils.buffer import Window, CBuffer, WDelay

w = Window(8)
for v in range(5):
    w.push(float(v))
print("window after 5 pushes :", w.read())

cb = CBuffer(6)
cb.write(np.arange(4, dtype=np.float32))
got = cb.read(2)
cb.release(2)
cb.write(np.array([9.0, 8.0], np.float32))
print("cbuffer read", got, "-> remaining", cb.read(cb.size()))

d = WDelay(3)
out = [d.push(float(v)) for v in range(6)]
print("wdelay(3) of 0..5     :", out)
