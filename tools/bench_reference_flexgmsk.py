"""Measure the reference C library's flexframesync AND gmskframesync
full-RX throughput on this host (single thread, -O2) — the honest
baselines for the full-device streaming receivers' comparisons
(methodology identical to bench_reference_rx.py; configs mirror
tools/bench_flexframe_fullrx.py / bench_gmsk_fullrx.py: 64-byte
payload, crc32 + golay2412 outer, qpsk (flexframe), noise gaps).
Prints two lines: `flexframe_rx_msps ...` and `gmsk_rx_msps ...`.
"""
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import refbuild

SRC = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <complex.h>
#include "liquid.h"

static int n_frames = 0;
static int cb(unsigned char *h, int hv, unsigned char *p, unsigned int plen,
              int pv, framesyncstats_s s, void *ctx)
{ (void)h;(void)p;(void)plen;(void)s;(void)ctx; n_frames += hv && pv; return 0; }

static double run_capture(float complex *cap, unsigned int cap_len,
                          void (*exec)(void *, float complex *, unsigned int),
                          void (*rst)(void *), void *fs,
                          unsigned int trials)
{
    struct timespec t0, t1;
    unsigned int k;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    for (k = 0; k < trials; k++) { rst(fs); exec(fs, cap, cap_len); }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double dt = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
    return (double)cap_len * trials / dt / 1e6;
}

static void ff_exec(void *q, float complex *x, unsigned int n)
{ flexframesync_execute((flexframesync)q, x, n); }
static void ff_rst(void *q) { flexframesync_reset((flexframesync)q); }
static void gm_exec(void *q, float complex *x, unsigned int n)
{ gmskframesync_execute((gmskframesync)q, x, n); }
static void gm_rst(void *q) { gmskframesync_reset((gmskframesync)q); }

int main(void) {
    unsigned int payload_len = 64, gap = 2048, nrep = 16, trials = 8;
    unsigned char header14[14], header8[8], payload[64];
    unsigned int i, k;
    for (i = 0; i < 14; i++) header14[i] = i;
    for (i = 0; i < 8; i++)  header8[i]  = i;
    for (i = 0; i < payload_len; i++) payload[i] = (unsigned char)(i * 7);
    float nstd = 0.05f;

    /* ---- flexframe ---- */
    flexframegenprops_s props;
    flexframegenprops_init_default(&props);
    props.check = LIQUID_CRC_32;
    props.fec0  = LIQUID_FEC_NONE;
    props.fec1  = LIQUID_FEC_GOLAY2412;
    props.mod_scheme = LIQUID_MODEM_QPSK;
    flexframegen fg = flexframegen_create(&props);
    flexframegen_assemble(fg, header14, payload, payload_len);
    unsigned int flen = flexframegen_getframelen(fg);
    unsigned int cap_len = nrep * (flen + gap);
    float complex *cap = malloc(cap_len * sizeof(float complex));
    unsigned int pos = 0;
    for (k = 0; k < nrep; k++) {
        flexframegen_reset(fg);
        flexframegen_assemble(fg, header14, payload, payload_len);
        int done = 0;
        while (!done && pos + 2 <= cap_len)
            { done = flexframegen_write_samples(fg, cap + pos, 2); pos += 2; }
        for (i = 0; i < gap && pos < cap_len; i++)
            cap[pos++] = nstd * (randnf() + _Complex_I * randnf()) * 0.7071f;
    }
    cap_len = pos;
    flexframesync ffs = flexframesync_create(cb, NULL);
    n_frames = 0;
    flexframesync_execute(ffs, cap, cap_len);
    int dec1 = n_frames;
    double msps = run_capture(cap, cap_len, ff_exec, ff_rst, ffs, trials);
    printf("flexframe_rx_msps %f frames %d of %u\n", msps, dec1, nrep);
    free(cap);

    /* ---- gmskframe ---- */
    gmskframegen gg = gmskframegen_create();
    gmskframegen_assemble(gg, header8, payload, payload_len,
                          LIQUID_CRC_32, LIQUID_FEC_NONE,
                          LIQUID_FEC_GOLAY2412);
    unsigned int glen = gmskframegen_getframelen(gg) * 2;  /* k=2 */
    cap_len = nrep * (glen + gap) + 64;
    cap = malloc(cap_len * sizeof(float complex));
    pos = 0;
    for (k = 0; k < nrep; k++) {
        gmskframegen_reset(gg);
        gmskframegen_assemble(gg, header8, payload, payload_len,
                              LIQUID_CRC_32, LIQUID_FEC_NONE,
                              LIQUID_FEC_GOLAY2412);
        int done = 0;
        while (!done && pos + 2 <= cap_len)
            { done = gmskframegen_write_samples(gg, cap + pos); pos += 2; }
        for (i = 0; i < gap && pos < cap_len; i++)
            cap[pos++] = nstd * (randnf() + _Complex_I * randnf()) * 0.7071f;
    }
    cap_len = pos;
    gmskframesync gfs = gmskframesync_create(cb, NULL);
    n_frames = 0;
    gmskframesync_execute(gfs, cap, cap_len);
    dec1 = n_frames;
    msps = run_capture(cap, cap_len, gm_exec, gm_rst, gfs, trials);
    printf("gmsk_rx_msps %f frames %d of %u\n", msps, dec1, nrep);
    return 0;
}
"""


def main() -> int:
    lib = refbuild.build()
    work = refbuild.WORK
    c = work / "bench_flexgmsk_rx.c"
    exe = work / "bench_flexgmsk_rx"
    c.write_text(SRC)
    r = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), str(c),
         "-I", str(work / "include"), str(lib), "-lm"],
        capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        return 1
    out = subprocess.run([str(exe)], capture_output=True, text=True,
                         timeout=900)
    print(out.stdout.strip())
    return 0


if __name__ == "__main__":
    sys.exit(main())
