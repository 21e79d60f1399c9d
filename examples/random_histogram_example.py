"""Random distributions vs their analytic pdfs, text histogram
(reference random_histogram_example.c)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.utils.random import (
    randnf, randexpf, randweibf, randnf_pdf, randexpf_pdf, randweibf_pdf)

rng = np.random.default_rng(12)
N = 200_000
cases = [
    ("gauss",   randnf(rng, N),                lambda x: randnf_pdf(x),
     (-4, 4)),
    ("exp",     randexpf(1.3, rng, N),         lambda x: randexpf_pdf(x, 1.3),
     (0, 5)),
    ("weibull", randweibf(2.0, 1.0, 0.0, rng, N),
     lambda x: randweibf_pdf(x, 2.0, 1.0), (0, 3)),
]
for name, samples, pdf, (lo, hi) in cases:
    hist, edges = np.histogram(samples, bins=30, range=(lo, hi),
                               density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    expected = np.asarray(pdf(centers), np.float64)
    err = np.abs(hist - expected).max()
    print(f"\n{name}: max |hist - pdf| = {err:.4f}")
    peak = max(hist.max(), 1e-12)
    for c, hv in zip(centers[::3], hist[::3]):
        bar = "#" * int(40 * hv / peak)
        print(f"  {c:+6.2f} |{bar}")
    assert err < 0.05, (name, err)
