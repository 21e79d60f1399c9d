"""Binary sequence correlation: m-sequence auto-correlation and
complementary-code cross-correlation (reference bsequence_example.c)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.utils.sequence import (
    msequence_bits, bsequence_correlate, bsequence_create_ccodes)

# m-sequence has two-valued autocorrelation: n at lag 0, -1 elsewhere
m = 7
bits = msequence_bits(m)
n = len(bits)
print(f"m-sequence m={m}, period n={n}")
for lag in [0, 1, 5, 31]:
    r = bsequence_correlate(bits, np.roll(bits, lag))
    print(f"  autocorrelation at lag {lag:3d}: {r:4d}")

# complementary (Golay) code pair: out-of-phase autocorrelations cancel
a, b = bsequence_create_ccodes(64)
ra = [bsequence_correlate(a, np.roll(a, k)) for k in range(1, 64)]
rb = [bsequence_correlate(b, np.roll(b, k)) for k in range(1, 64)]
s = np.asarray(ra) + np.asarray(rb)
print(f"complementary pair (64 bits): max |r_a(k)+r_b(k)| off-peak = "
      f"{int(np.abs(s).max())} (individual peaks up to "
      f"{int(np.abs(ra).max())})")
