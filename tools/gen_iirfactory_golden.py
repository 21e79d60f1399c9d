#!/usr/bin/env python
"""Golden vectors for the filter factory constructors by running the
compiled reference (tools/refbuild.py cache): integrator,
differentiator, dc_blocker, pll, firfilt rect.

Writes tests/golden/iirfactory_golden.npz with the complex response of
each filter to a deterministic chirp-like input (128 samples) — the
autotest tol=1e-3 convention applies on the comparison side.
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import refbuild

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "tests/golden/iirfactory_golden.npz"

GEN_C = r"""
#include <stdio.h>
#include <math.h>
#include <complex.h>
#include "liquid.h"

static void run(const char* tag, iirfilt_crcf q,
                float complex* x, unsigned n) {
    printf("%s %u :", tag, n);
    for (unsigned i=0;i<n;i++) {
        float complex y;
        iirfilt_crcf_execute(q, x[i], &y);
        printf(" %.9e %.9e", crealf(y), cimagf(y));
    }
    printf("\n");
    iirfilt_crcf_destroy(q);
}

int main() {
    unsigned n = 128;
    float complex x[128];
    for (unsigned i=0;i<n;i++) {
        float ph = 0.02f*i + 0.001f*i*i/ (float)n;
        x[i] = cosf(2*M_PI*ph) + _Complex_I*sinf(2*M_PI*ph);
    }
    // NOTE: iirfilt_crcf_create_integrator/_differentiator are NOT
    // dumped: the reference's liquid_cplxpair (iirdes.c:60-101) uses an
    // ABSOLUTE 1e-6 tolerance to pair the Pintelon zeros (magnitudes
    // 3-5.5), fails to pair them under this compiler's float rounding,
    // and leaves the B coefficients uninitialized -> NaN output.  Those
    // two filters are covered by frequency-domain property tests
    // instead (test_iir_factory.py).
    run("dcblock", iirfilt_crcf_create_dc_blocker(0.05f), x, n);
    run("pll", iirfilt_crcf_create_pll(0.02f, 0.7071f, 1000.0f), x, n);
    {
        firfilt_crcf q = firfilt_crcf_create_rect(8);
        printf("rect %u :", n);
        for (unsigned i=0;i<n;i++) {
            float complex y;
            firfilt_crcf_push(q, x[i]);
            firfilt_crcf_execute(q, &y);
            printf(" %.9e %.9e", crealf(y), cimagf(y));
        }
        printf("\n");
        firfilt_crcf_destroy(q);
    }
    // the input itself, bit-exact as the C program computed it
    printf("input %u :", n);
    for (unsigned i=0;i<n;i++)
        printf(" %.9e %.9e", crealf(x[i]), cimagf(x[i]));
    printf("\n");
    return 0;
}
"""


def main() -> int:
    out = refbuild.compile_and_run(GEN_C, "iirfactory")
    data = {}
    for line in out.strip().splitlines():
        tag, n, _, *vals = line.split()
        v = np.array([float(t) for t in vals], np.float32)
        data[tag] = (v[0::2] + 1j * v[1::2]).astype(np.complex64)
    np.savez(OUT, **data)
    print(f"wrote {OUT} with {sorted(data)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
