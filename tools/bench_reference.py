#!/usr/bin/env python
"""Measure the reference C library's throughput on this host CPU for the
headline chain (mix -> 64-tap FIR -> 57-tap fftfilt -> msresamp 0.5) and
store it in tests/baseline_measured.json, giving bench.py's vs_baseline a
measured denominator (the reference publishes no absolute numbers —
BASELINE.md)."""
import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from refbuild import compile_and_run  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "tests/baseline_measured.json"

GEN_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <time.h>
#include "liquid.h"

static double now_s(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

int main() {
    unsigned int n = 1 << 14;  // block size
    float complex *x = malloc(n * sizeof(float complex));
    float complex *a = malloc(n * sizeof(float complex));
    float complex *b = malloc(n * sizeof(float complex));
    float complex *c = malloc((n + 64) * sizeof(float complex));
    unsigned int i;
    for (i = 0; i < n; i++)
        x[i] = 0.3f * cexpf(_Complex_I * 0.02f * i);

    // chain components matching bench.py
    nco_crcf mixer = nco_crcf_create(LIQUID_NCO);
    nco_crcf_set_frequency(mixer, 0.125f);

    float h1[64];
    liquid_firdes_kaiser(64, 0.2f, 60.0f, 0.0f, h1);
    firfilt_crcf f1 = firfilt_crcf_create(h1, 64);

    float h2[57];
    liquid_firdes_kaiser(57, 0.3f, 60.0f, 0.0f, h2);
    fftfilt_crcf f2 = fftfilt_crcf_create(h2, 57, n);

    msresamp_crcf rs = msresamp_crcf_create(0.5f, 60.0f);

    // warmup + calibrated timing (50-500 ms policy, bench/bench.c:85)
    unsigned int trials = 4;
    double dt = 0.0;
    unsigned int nw;
    while (1) {
        double t0 = now_s();
        unsigned int t;
        for (t = 0; t < trials; t++) {
            nco_crcf_mix_block_down(mixer, x, a, n);
            firfilt_crcf_execute_block(f1, a, n, b);
            fftfilt_crcf_execute(f2, b, a);
            msresamp_crcf_execute(rs, a, n, c, &nw);
        }
        dt = now_s() - t0;
        if (dt > 0.5 || trials >= (1u << 20)) break;
        trials *= 2;
    }
    double msps = (double)trials * n / dt / 1e6;
    printf("chain_msps %f\n", msps);

    // isolated stage benchmarks
    {
        double t0 = now_s();
        unsigned int t, T = trials * 4;
        for (t = 0; t < T; t++)
            firfilt_crcf_execute_block(f1, x, n, b);
        double d = now_s() - t0;
        printf("firfilt64_msps %f\n", (double)T * n / d / 1e6);
    }
    {
        double t0 = now_s();
        unsigned int t, T = trials * 4;
        for (t = 0; t < T; t++)
            fftfilt_crcf_execute(f2, x, b);
        double d = now_s() - t0;
        printf("fftfilt57_msps %f\n", (double)T * n / d / 1e6);
    }
    {
        firpfbch2_crcf qa = firpfbch2_crcf_create_kaiser(LIQUID_ANALYZER, 64, 4, 60.0f);
        float complex Y[64];
        double t0 = now_s();
        unsigned int t, T = trials * 2;
        for (t = 0; t < T; t++)
            for (i = 0; i + 32 <= n; i += 32)
                firpfbch2_crcf_execute(qa, &x[i], Y);
        double d = now_s() - t0;
        printf("firpfbch2_64_msps %f\n", (double)T * n / d / 1e6);
    }
    return 0;
}
"""


def main() -> int:
    out = compile_and_run(GEN_C, "benchref")
    vals = {}
    for line in out.splitlines():
        m = re.match(r"(\w+)\s+([\d.eE+-]+)", line)
        if m:
            vals[m.group(1)] = float(m.group(2))
    result = {
        "fir_fft_chain_msps_cpu": vals.get("chain_msps", 0.0),
        "firfilt64_msps_cpu": vals.get("firfilt64_msps", 0.0),
        "fftfilt57_msps_cpu": vals.get("fftfilt57_msps", 0.0),
        "firpfbch2_64_msps_cpu": vals.get("firpfbch2_64_msps", 0.0),
    }
    OUT.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
