#!/usr/bin/env python
"""Generate modem constellation goldens: modem_modulate of every symbol
for all memoryless schemes, from the compiled reference library."""
import sys; import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
import numpy as np
from refbuild import compile_and_run

GEN = r"""
#include <stdio.h>
#include "liquid.h"
int main() {
    // enumerate all schemes via the modulation_types table
    unsigned int i, s;
    for (i = 1; i < LIQUID_MODEM_NUM_SCHEMES; i++) {
        modulation_scheme ms = (modulation_scheme)i;
        if (ms == LIQUID_MODEM_ARB) continue;
        modem q = modem_create(ms);
        unsigned int bps = modem_get_bps(q);
        unsigned int M = 1 << bps;
        printf("scheme %s %u :", modulation_types[i].name, M);
        float complex y;
        for (s = 0; s < M; s++) {
            modem_modulate(q, s, &y);
            printf(" %.9e %.9e", crealf(y), cimagf(y));
        }
        printf("\n");
        modem_destroy(q);
    }
    return 0;
}
"""
out = compile_and_run(GEN, "modemgold")
arrays = {}
for line in out.splitlines():
    parts = line.split(":")
    head = parts[0].split()
    name = head[1]
    vals = np.array([float(v) for v in parts[1].split()])
    arrays[name] = (vals[0::2] + 1j*vals[1::2]).astype(np.complex64)
np.savez("/root/repo/tests/golden/modem_golden.npz", **arrays)
print("saved", len(arrays), "schemes:", sorted(arrays)[:10], "...")
