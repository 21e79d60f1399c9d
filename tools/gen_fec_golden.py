#!/usr/bin/env python
"""Generate FEC golden vectors by compiling and running the reference C
implementation (reference src/fec/) in a scratch directory.

Produces tests/golden/fec_golden.npz with:
  * byte-level encode goldens per scheme (deterministic message)
  * 1-bit-error decode goldens
  * CRC keys per scheme
  * interleaver in/out byte streams for several lengths
  * packetizer encode golden + 1-bit-error decode

The reference tree is copied to /tmp (read-only mount); nothing from it
enters this repository except numeric test vectors — same policy as
tools/extract_golden.py.
"""
import pathlib
import re
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path("/root/reference")
OUT = REPO / "tests/golden/fec_golden.npz"

GEN_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "liquid.internal.h"

static void dump(const char* tag, unsigned char* d, unsigned n) {
    printf("%s %u :", tag, n);
    for (unsigned i=0;i<n;i++) printf(" %u", d[i]);
    printf("\n");
}

int main() {
    unsigned int lens[] = {1, 5, 16, 33};
    int schemes[] = {LIQUID_FEC_REP3, LIQUID_FEC_REP5,
        LIQUID_FEC_HAMMING74, LIQUID_FEC_HAMMING84, LIQUID_FEC_HAMMING128,
        LIQUID_FEC_GOLAY2412, LIQUID_FEC_SECDED2216, LIQUID_FEC_SECDED3932,
        LIQUID_FEC_SECDED7264};
    const char* names[] = {"rep3","rep5","hamming74","hamming84","hamming128",
        "golay2412","secded2216","secded3932","secded7264"};
    for (unsigned t=0;t<4;t++) {
        unsigned int n = lens[t];
        unsigned char msg[64];
        for (unsigned i=0;i<n;i++) msg[i]=(unsigned char)(i*37+11);
        for (unsigned s=0;s<9;s++) {
            fec q = fec_create(schemes[s], NULL);
            unsigned int k = fec_get_enc_msg_length(schemes[s], n);
            unsigned char enc[1024], dec[64];
            fec_encode(q, n, msg, enc);
            printf("enc_%s_%u ", names[s], n); dump("", enc, k);
            unsigned char enc2[1024]; memcpy(enc2, enc, k);
            enc2[k/2] ^= 0x10;
            fec_decode(q, n, enc2, dec);
            printf("dec1_%s_%u ", names[s], n); dump("", dec, n);
            fec_destroy(q);
        }
    }
    {
        unsigned char msg[16];
        for (unsigned i=0;i<16;i++) msg[i]=(unsigned char)(i*37+11);
        printf("crckeys 5 : %u %u %u %u %u\n",
            crc_generate_key(LIQUID_CRC_CHECKSUM,msg,16),
            crc_generate_key(LIQUID_CRC_8,msg,16),
            crc_generate_key(LIQUID_CRC_16,msg,16),
            crc_generate_key(LIQUID_CRC_24,msg,16),
            crc_generate_key(LIQUID_CRC_32,msg,16));
    }
    unsigned int ns[5] = {4,8,16,64,100};
    for (unsigned t=0;t<5;t++) {
        unsigned int n = ns[t];
        interleaver q = interleaver_create(n);
        unsigned char x[256], y[256];
        for (unsigned i=0;i<n;i++) x[i]=(unsigned char)(i*29+3);
        interleaver_encode(q,x,y);
        printf("intlv_in_%u ", n); dump("", x, n);
        printf("intlv_out_%u ", n); dump("", y, n);
        interleaver_destroy(q);
    }
    {
        unsigned int n = 24;
        unsigned char msg[24], pkt[256], out[24];
        for (unsigned i=0;i<n;i++) msg[i]=(unsigned char)(i*53+7);
        packetizer p = packetizer_create(n, LIQUID_CRC_32,
            LIQUID_FEC_HAMMING128, LIQUID_FEC_NONE);
        unsigned int k = packetizer_compute_enc_msg_len(n, LIQUID_CRC_32,
            LIQUID_FEC_HAMMING128, LIQUID_FEC_NONE);
        packetizer_encode(p, msg, pkt);
        printf("pkt_msg "); dump("", msg, n);
        printf("pkt_enc "); dump("", pkt, k);
        pkt[5] ^= 0x04;
        int ok = packetizer_decode(p, pkt, out);
        printf("pkt_dec_ok 1 : %d\n", ok);
        printf("pkt_dec "); dump("", out, n);
        packetizer_destroy(p);
        // golay outer + secded inner
        packetizer p2 = packetizer_create(n, LIQUID_CRC_16,
            LIQUID_FEC_SECDED7264, LIQUID_FEC_GOLAY2412);
        unsigned int k2 = packetizer_compute_enc_msg_len(n, LIQUID_CRC_16,
            LIQUID_FEC_SECDED7264, LIQUID_FEC_GOLAY2412);
        packetizer_encode(p2, msg, pkt);
        printf("pkt2_enc "); dump("", pkt, k2);
        packetizer_destroy(p2);
    }
    return 0;
}
"""

CONFIG_H = """
#define HAVE_STDIO_H 1
#define HAVE_STDLIB_H 1
#define HAVE_COMPLEX_H 1
#define HAVE_STRING_H 1
#define HAVE_MATH_H 1
#define SIZEOF_INT 4
#define SIZEOF_UNSIGNED_INT 4
"""


def main() -> int:
    work = pathlib.Path(tempfile.mkdtemp(prefix="fecgolden"))
    (work / "gen.c").write_text(GEN_C)
    (work / "config.h").write_text(CONFIG_H)
    srcs = [str(p) for p in sorted(REF.glob("src/fec/src/*.c"))
            if "gentab" not in p.name or p.name == "fec_hamming128_gentab.c"
            if "sumproduct" not in p.name]
    srcs += [str(REF / "src/utility/src/bshift_array.c"),
             str(REF / "src/utility/src/byte_utilities.c"),
             str(REF / "src/utility/src/pack_bytes.c")]
    cmd = (["gcc", "-O1", "-I", str(work), "-I", str(REF / "include"),
            "-o", str(work / "gen"), str(work / "gen.c")] + srcs + ["-lm"])
    subprocess.run(cmd, check=True, capture_output=True)
    out = subprocess.run([str(work / "gen")], check=True,
                         capture_output=True, text=True).stdout

    arrays = {}
    for line in out.splitlines():
        m = re.match(r"(\S+)\s+\d*\s*:\s*(.*)", line.replace("  ", " "))
        if not m:
            continue
        tag, body = m.group(1), m.group(2)
        vals = [int(v) for v in body.split()]
        arrays[tag] = np.asarray(vals, np.int64)
    np.savez(OUT, **arrays)
    print(f"wrote {len(arrays)} arrays -> {OUT}")
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
