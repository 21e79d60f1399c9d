"""Window function gallery: sidelobe levels of each supported window
(reference window tests in src/math)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.design.windows import window

n, nfft = 64, 4096
for kind, arg in (("hamming", 0.0), ("hann", 0.0), ("blackmanharris", 0.0),
                  ("kaiser", 10.0), ("kbd", 10.0), ("rcostaper", 16)):
    w = window(kind, n, arg)
    W = np.abs(np.fft.fft(w, nfft))
    W /= W.max()
    # peak sidelobe: largest bin beyond the main lobe
    main = np.argmax(W[1:] < 1e-3) if (W[1:] < 1e-3).any() else nfft // n
    k0 = 4 * nfft // n
    psl = 20 * np.log10(W[k0 : nfft // 2].max())
    print(f"{kind:15s} arg={arg:5.1f}: peak sidelobe {psl:7.1f} dB")
