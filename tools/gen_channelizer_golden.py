#!/usr/bin/env python
"""Generate channelizer golden vectors from the reference implementation
(firpfbch / firpfbch2 analysis+synthesis over a deterministic sequence)
into tests/golden/channelizer_golden.npz."""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from refbuild import compile_and_run  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "tests/golden/channelizer_golden.npz"

GEN_C = r"""
#include <stdio.h>
#include "liquid.internal.h"
static void dumpc(const char* tag, float complex* d, unsigned n) {
    printf("%s :", tag);
    for (unsigned i=0;i<n;i++) printf(" %.9e %.9e", crealf(d[i]), cimagf(d[i]));
    printf("\n");
}
static void runcase(unsigned M, unsigned m) {
    unsigned n = 32*M, i, j;
    float complex x[n], y[n], z[n];
    unsigned s=1, pp=524287, g=1031;
    for (i=0;i<n;i++) { s=(s*pp)%g; x[i] = (float)s/(float)g - 0.5f
        + _Complex_I*((float)((s*pp)%g)/(float)g - 0.5f); }
    char tag[64];
    sprintf(tag, "x_%u_%u", M, m); dumpc(tag, x, n);
    // oversampled
    firpfbch2_crcf qa = firpfbch2_crcf_create_kaiser(LIQUID_ANALYZER, M, m, 60.0f);
    firpfbch2_crcf qs = firpfbch2_crcf_create_kaiser(LIQUID_SYNTHESIZER, M, m, 60.0f);
    unsigned nf = n/(M/2);
    float complex Y[nf*M];
    for (i=0, j=0; i<n; i+=M/2, j++)
        firpfbch2_crcf_execute(qa, &x[i], &Y[j*M]);
    for (i=0, j=0; i<n; i+=M/2, j++)
        firpfbch2_crcf_execute(qs, &Y[j*M], &y[i]);
    sprintf(tag, "Y2_%u_%u", M, m); dumpc(tag, Y, nf*M);
    sprintf(tag, "y2_%u_%u", M, m); dumpc(tag, y, n);
    firpfbch2_crcf_destroy(qa); firpfbch2_crcf_destroy(qs);
    // maximally decimated
    firpfbch_crcf qa1 = firpfbch_crcf_create_kaiser(LIQUID_ANALYZER, M, m, 60.0f);
    firpfbch_crcf qs1 = firpfbch_crcf_create_kaiser(LIQUID_SYNTHESIZER, M, m, 60.0f);
    unsigned nb = n/M;
    float complex Z[nb*M];
    for (i=0, j=0; i<n; i+=M, j++)
        firpfbch_crcf_analyzer_execute(qa1, &x[i], &Z[j*M]);
    for (i=0, j=0; i<n; i+=M, j++)
        firpfbch_crcf_synthesizer_execute(qs1, &Z[j*M], &z[i]);
    sprintf(tag, "Z1_%u_%u", M, m); dumpc(tag, Z, nb*M);
    sprintf(tag, "z1_%u_%u", M, m); dumpc(tag, z, n);
    firpfbch_crcf_destroy(qa1); firpfbch_crcf_destroy(qs1);
}
int main() {
    runcase(8, 4);
    runcase(16, 5);
    runcase(64, 3);
    return 0;
}
"""


def main() -> int:
    out = compile_and_run(GEN_C, "channelizer")
    arrays = {}
    for line in out.splitlines():
        tag, _, body = line.partition(":")
        tag = tag.strip()
        vals = np.array([float(v) for v in body.split()])
        arrays[tag] = (vals[0::2] + 1j * vals[1::2]).astype(np.complex64)
    np.savez(OUT, **arrays)
    print(f"wrote {len(arrays)} arrays -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
