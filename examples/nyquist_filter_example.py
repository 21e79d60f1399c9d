"""Nyquist and root-Nyquist prototype comparison: ISI at symbol instants
(reference nyquist_filter_example.c)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.design.firdes import firdes_prototype

k, m, beta = 2, 9, 0.3
print(f"k={k} samples/symbol, m={m} delay, beta={beta}\n")
print("  type        ISI (dB)   note")
for ftype in ("kaiser", "rcos", "fexp", "fsech", "farcsech"):
    h = np.asarray(firdes_prototype(ftype, k, m, beta), np.float64)
    taps = h[m * k::k] / h[m * k]          # symbol-spaced samples, center=1
    isi = np.sqrt(np.mean(taps[1:] ** 2))
    print(f"  {ftype:9s}  {20 * np.log10(isi + 1e-30):8.1f}    Nyquist "
          f"(zero ISI by itself)")
    # the flipped-exponential family is Nyquist only asymptotically in
    # the filter length; -50 dB at 2km+1 taps matches the reference
    assert isi < 5e-3, (ftype, isi)

for ftype in ("rrcos", "rkaiser", "arkaiser", "hm3"):
    h = np.asarray(firdes_prototype(ftype, k, m, beta), np.float64)
    g = np.convolve(h, h)                  # TX*RX composite
    taps = g[2 * m * k::k] / g[2 * m * k]
    isi = np.sqrt(np.mean(taps[1:] ** 2))
    print(f"  {ftype:9s}  {20 * np.log10(isi + 1e-30):8.1f}    root-Nyquist "
          f"(zero ISI after matched filter)")
    assert isi < 0.02, (ftype, isi)
