"""M-sequence generation and its ideal autocorrelation
(reference msequence_example.c / bsequence_example.c)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.utils.sequence import (MSequence, msequence_bits,
                                           bsequence_correlate)

m = 7
n = (1 << m) - 1
bits = msequence_bits(m)
print(f"m={m}: length {len(bits)} sequence, "
      f"{int(bits.sum())} ones / {int((1 - bits).sum())} zeros")
assert len(bits) == n and abs(int(bits.sum()) - (n + 1) // 2) <= 1

# the periodic autocorrelation of a bipolar m-sequence is n at lag 0
# and exactly -1 at every other lag
s = 1.0 - 2.0 * bits.astype(np.float64)
ac = np.array([np.dot(s, np.roll(s, k)) for k in range(n)])
print(f"autocorrelation: lag0 {ac[0]:.0f}, off-peak "
      f"min {ac[1:].min():.0f} max {ac[1:].max():.0f}")
assert ac[0] == n and np.all(np.abs(ac[1:] + 1) < 1e-9)

# object API mirrors the reference msequence_advance
ms = MSequence(m)
first = [ms.advance() for _ in range(8)]
ms.reset()
again = [ms.advance() for _ in range(8)]
assert first == again
print("msequence_advance first 8 bits:", first)

# bsequence-style binary correlation of a sequence against itself
rxy = bsequence_correlate(bits, bits)
print(f"bsequence_correlate(seq, seq) = {rxy} / {n}")
assert rxy == n
