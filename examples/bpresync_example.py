"""Pre-demodulator synchronization: detect a BPSK preamble under
carrier offset with multiple frequency hypotheses
(reference bpresync_example.c)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.framing.bpacket import bpresync_detect
from liquid_dsp_tpu.utils.sequence import msequence_bits

rng = np.random.default_rng(8)
pre = (1.0 - 2.0 * msequence_bits(6).astype(np.float64)).astype(np.complex64)
n = len(pre)                       # 63-chip BPSK preamble

offset, dphi_true, snr_db = 200, 0.008, 6.0
x = (0.05 * (rng.standard_normal(512) + 1j * rng.standard_normal(512))
     ).astype(np.complex64)
nstd = 10 ** (-snr_db / 20)
x += nstd / np.sqrt(2) * (rng.standard_normal(512)
                          + 1j * rng.standard_normal(512))
t = np.arange(n)
x[offset:offset + n] += pre * np.exp(1j * (dphi_true * t + 0.7))

found, idx, dphi, rxy = bpresync_detect(x, pre, dphi_range=0.02, n_dphi=9,
                                        threshold=0.5)
print(f"injected preamble at {offset}, dphi {dphi_true:+.4f}, "
      f"{snr_db:.0f} dB SNR")
print(f"detected: found={found} index={idx} dphi_hat={dphi:+.4f} "
      f"rxy={rxy:.3f}")
assert found and abs(idx - offset) <= 1 and abs(dphi - dphi_true) < 0.005
