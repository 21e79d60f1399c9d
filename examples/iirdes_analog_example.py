"""Analog filter prototypes: Butterworth/Chebyshev/elliptic/Bessel
pole-zero layouts before the bilinear transform
(reference iirdes_analog_example.c)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.design.iirdes import (
    butter_prototype, cheby1_prototype, cheby2_prototype,
    ellip_prototype, bessel_prototype)

n = 5
for name, proto in [
        ("butterworth", lambda: butter_prototype(n)),
        ("cheby1 (1 dB ripple)", lambda: cheby1_prototype(n, 1.0)),
        ("cheby2 (60 dB stop)", lambda: cheby2_prototype(n, 60.0)),
        ("elliptic (1/60 dB)", lambda: ellip_prototype(n, 1.0, 60.0)),
        ("bessel", lambda: bessel_prototype(n))]:
    z, p, k = proto()
    print(f"{name:22s}: {len(z)} zeros, {len(p)} poles, k={k:.4f}")
    for pi in sorted(p, key=lambda v: v.imag):
        print(f"    pole s = {pi.real:+.4f} {pi.imag:+.4f}j "
              f"(|p|={abs(pi):.4f})")
    # all analog prototypes must be stable: poles strictly in Re(s)<0
    assert all(pi.real < 0 for pi in p)
print("all prototypes stable (poles in the left half-plane)")
