#!/usr/bin/env python
"""Generate flexframe interop goldens from the reference implementation:
qpacketmodem encode symbols, qpilotgen frames, and complete flexframegen
sample streams for several property sets -> tests/golden/
flexframe_golden.npz."""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from refbuild import compile_and_run  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "tests/golden/flexframe_golden.npz"

GEN_C = r"""
#include <stdio.h>
#include <string.h>
#include <math.h>
#include "liquid.h"
#ifndef M_SQRT1_2
#define M_SQRT1_2 0.70710678118654752440
#endif
static void dumpc(const char* tag, float complex* d, unsigned n) {
    printf("%s :", tag);
    for (unsigned i=0;i<n;i++) printf(" %.9e %.9e", crealf(d[i]), cimagf(d[i]));
    printf("\n");
}
static void fill(unsigned char* b, unsigned n, unsigned seed) {
    unsigned s = seed;
    for (unsigned i=0;i<n;i++) { s = (s*1103515245u + 12345u); b[i] = (s>>16)&0xff; }
}
static void qpm_case(const char* tag, unsigned len, crc_scheme c,
                     fec_scheme f0, fec_scheme f1, modulation_scheme ms,
                     unsigned seed) {
    unsigned char payload[len];
    fill(payload, len, seed);
    qpacketmodem q = qpacketmodem_create();
    qpacketmodem_configure(q, len, c, f0, f1, ms);
    unsigned n = qpacketmodem_get_frame_len(q);
    float complex sym[n];
    qpacketmodem_encode(q, payload, sym);
    printf("%s_len : %u\n", tag, n);
    dumpc(tag, sym, n);
    qpacketmodem_destroy(q);
}
static void ffg_case(const char* tag, unsigned len, crc_scheme c,
                     fec_scheme f0, fec_scheme f1, modulation_scheme ms,
                     unsigned seed) {
    flexframegenprops_s props;
    flexframegenprops_init_default(&props);
    props.check = c; props.fec0 = f0; props.fec1 = f1; props.mod_scheme = ms;
    flexframegen fg = flexframegen_create(&props);
    unsigned char header[14], payload[len];
    fill(header, 14, seed);
    fill(payload, len, seed+1);
    flexframegen_assemble(fg, header, payload, len);
    unsigned n = flexframegen_getframelen(fg);
    float complex buf[n+64];
    int done = 0; unsigned total = 0;
    while (!done && total < n+64) {
        done = flexframegen_write_samples(fg, &buf[total], 2);
        total += 2;
    }
    printf("%s_len : %u %u\n", tag, n, total);
    dumpc(tag, buf, total);
    flexframegen_destroy(fg);
}
static void ofdm_raw_case(unsigned M, unsigned cp, unsigned seed) {
    unsigned char p[M];
    ofdmframe_init_default_sctype(M, p);
    printf("ofdm_sct_%u :", M);
    for (unsigned i=0;i<M;i++) printf(" %u 0", p[i]);
    printf("\n");
    ofdmframegen fg = ofdmframegen_create(M, cp, 0, NULL);
    unsigned n = M + cp;
    float complex buf[n];
    ofdmframegen_write_S0a(fg, buf);
    char tag[48]; sprintf(tag, "ofdm_s0a_%u_%u", M, cp); dumpc(tag, buf, n);
    ofdmframegen_write_S0b(fg, buf);
    sprintf(tag, "ofdm_s0b_%u_%u", M, cp); dumpc(tag, buf, n);
    ofdmframegen_write_S1(fg, buf);
    sprintf(tag, "ofdm_s1_%u_%u", M, cp); dumpc(tag, buf, n);
    // three deterministic data symbols: LCG values on data subcarriers
    unsigned s = seed;
    float complex X[M];
    for (unsigned sym=0; sym<3; sym++) {
        for (unsigned i=0;i<M;i++) {
            if (p[i] == OFDMFRAME_SCTYPE_DATA) {
                s = s*1103515245u + 12345u;
                float re = ((float)((s>>16)&0xff))/127.5f - 1.0f;
                s = s*1103515245u + 12345u;
                float im = ((float)((s>>16)&0xff))/127.5f - 1.0f;
                X[i] = re + _Complex_I*im;
            } else X[i] = 0.0f;
        }
        ofdmframegen_writesymbol(fg, X, buf);
        sprintf(tag, "ofdm_d%u_%u_%u", sym, M, cp); dumpc(tag, buf, n);
    }
    ofdmframegen_destroy(fg);
}
static void offg_case(const char* tag, unsigned M, unsigned cp,
                      unsigned len, crc_scheme c, fec_scheme f0,
                      fec_scheme f1, modulation_scheme ms, unsigned seed) {
    ofdmflexframegenprops_s props;
    ofdmflexframegenprops_init_default(&props);
    props.check = c; props.fec0 = f0; props.fec1 = f1; props.mod_scheme = ms;
    ofdmflexframegen fg = ofdmflexframegen_create(M, cp, 0, NULL, &props);
    unsigned char header[8], payload[len];
    fill(header, 8, seed);
    fill(payload, len, seed+1);
    ofdmflexframegen_assemble(fg, header, payload, len);
    unsigned n = M + cp;
    unsigned total = 0, cap = 64*n;
    float complex buf[cap];
    int done = 0;
    while (!done && total + n <= cap) {
        done = ofdmflexframegen_writesymbol(fg, &buf[total]);
        total += n;
    }
    printf("%s_len : %u\n", tag, total);
    dumpc(tag, buf, total);
    ofdmflexframegen_destroy(fg);
}
static void gmsk_case(const char* tag, unsigned len, crc_scheme c,
                      fec_scheme f0, fec_scheme f1, unsigned seed) {
    gmskframegen fg = gmskframegen_create();
    unsigned char header[8], payload[len];
    fill(header, 8, seed);
    fill(payload, len, seed+1);
    gmskframegen_assemble(fg, header, payload, len, c, f0, f1);
    unsigned n = gmskframegen_getframelen(fg);
    float complex buf[n+8];
    int done = 0; unsigned total = 0;
    while (!done && total < n+8) {
        done = gmskframegen_write_samples(fg, &buf[total]);
        total += 2; // k=2 samples per call
    }
    printf("%s_len : %u %u\n", tag, n, total);
    dumpc(tag, buf, total);
    gmskframegen_destroy(fg);
}
int main() {
    // pilot sequences alone
    for (unsigned plen = 60; plen <= 124; plen += 32) {
        qpilotgen pg = qpilotgen_create(plen, 16);
        unsigned flen = qpilotgen_get_frame_len(pg);
        float complex in[plen], out[flen];
        for (unsigned i=0;i<plen;i++) in[i] = 0; // zeros: output = pilots at slots
        qpilotgen_execute(pg, in, out);
        char tag[32]; sprintf(tag, "pilots_%u_16", plen);
        printf("%s_len : %u\n", tag, flen);
        dumpc(tag, out, flen);
        qpilotgen_destroy(pg);
    }
    qpm_case("qpm_a", 40, LIQUID_CRC_32, LIQUID_FEC_NONE,
             LIQUID_FEC_GOLAY2412, LIQUID_MODEM_QPSK, 7);
    qpm_case("qpm_b", 72, LIQUID_CRC_16, LIQUID_FEC_HAMMING74,
             LIQUID_FEC_NONE, LIQUID_MODEM_QAM16, 11);
    qpm_case("qpm_hdr", 20, LIQUID_CRC_32, LIQUID_FEC_SECDED7264,
             LIQUID_FEC_HAMMING84, LIQUID_MODEM_QPSK, 3);
    ffg_case("ffg_a", 64, LIQUID_CRC_32, LIQUID_FEC_NONE,
             LIQUID_FEC_GOLAY2412, LIQUID_MODEM_QPSK, 21);
    ffg_case("ffg_b", 40, LIQUID_CRC_16, LIQUID_FEC_HAMMING128,
             LIQUID_FEC_NONE, LIQUID_MODEM_QAM16, 33);
    ffg_case("ffg_c", 100, LIQUID_CRC_32, LIQUID_FEC_SECDED7264,
             LIQUID_FEC_HAMMING84, LIQUID_MODEM_PSK8, 55);
    gmsk_case("gmsk_a", 40, LIQUID_CRC_32, LIQUID_FEC_NONE,
              LIQUID_FEC_NONE, 77);
    gmsk_case("gmsk_b", 64, LIQUID_CRC_16, LIQUID_FEC_HAMMING74,
              LIQUID_FEC_GOLAY2412, 91);
    // bpacket byte frames (deterministic): dump full encoded packets
    {
        unsigned lens[2] = {32, 50};
        crc_scheme cs[2] = {LIQUID_CRC_32, LIQUID_CRC_16};
        fec_scheme f0s[2] = {LIQUID_FEC_NONE, LIQUID_FEC_HAMMING74};
        fec_scheme f1s[2] = {LIQUID_FEC_NONE, LIQUID_FEC_REP3};
        for (unsigned ci=0; ci<2; ci++) {
            bpacketgen bg = bpacketgen_create(0, lens[ci], cs[ci], f0s[ci], f1s[ci]);
            unsigned n = bpacketgen_get_packet_len(bg);
            unsigned char payload[lens[ci]], pkt[n];
            fill(payload, lens[ci], 131+ci);
            bpacketgen_encode(bg, payload, pkt);
            printf("bpkt_%u_len : %u\n", ci, n);
            printf("bpkt_%u :", ci);
            for (unsigned i=0;i<n;i++) printf(" %u 0", pkt[i]);
            printf("\n");
            bpacketgen_destroy(bg);
        }
    }
    // symsync: RRC-shaped QPSK at 2 samples/symbol through the
    // polyphase symbol synchronizer (deterministic)
    {
        unsigned k=2, m=5, npfb=32, nsym=256;
        float beta=0.3f;
        firinterp_crcf interp = firinterp_crcf_create_prototype(
            LIQUID_FIRFILT_RRC, k, m, beta, 0);
        unsigned T = nsym*k;
        float complex x[T];
        unsigned s = 17;
        for (unsigned i=0;i<nsym;i++) {
            s = s*1103515245u + 12345u;
            float complex sym = (((s>>16)&1) ? M_SQRT1_2 : -M_SQRT1_2) +
                _Complex_I * (((s>>17)&1) ? M_SQRT1_2 : -M_SQRT1_2);
            firinterp_crcf_execute(interp, sym, &x[i*k]);
        }
        firinterp_crcf_destroy(interp);
        dumpc("symsync_x", x, T);
        symsync_crcf sync = symsync_crcf_create_rnyquist(
            LIQUID_FIRFILT_RRC, k, m, beta, npfb);
        float complex y[T];
        unsigned ny = 0;
        symsync_crcf_execute(sync, x, T, y, &ny);
        printf("symsync_y_len : %u\n", ny);
        dumpc("symsync_y", y, ny);
        symsync_crcf_destroy(sync);
    }
    // eqlms: trained adaptation over a known channel (deterministic)
    {
        unsigned L = 13, T = 200;
        eqlms_cccf eq = eqlms_cccf_create(NULL, L);
        eqlms_cccf_set_bw(eq, 0.3f);
        float complex x[T], d[T], yhat[T];
        unsigned s = 41;
        for (unsigned i=0;i<T;i++) {
            s = s*1103515245u + 12345u;
            d[i] = (((s>>16)&1) ? M_SQRT1_2 : -M_SQRT1_2) +
                _Complex_I*(((s>>17)&1) ? M_SQRT1_2 : -M_SQRT1_2);
            // simple 2-tap channel + bias
            x[i] = d[i] + (i ? 0.4f*d[i-1] : 0) + 0.05f;
        }
        for (unsigned i=0;i<T;i++) {
            eqlms_cccf_push(eq, x[i]);
            eqlms_cccf_execute(eq, &yhat[i]);
            eqlms_cccf_step(eq, d[i], yhat[i]);
        }
        dumpc("eqlms_x", x, T);
        dumpc("eqlms_d", d, T);
        dumpc("eqlms_y", yhat, T);
        float complex w[L];
        eqlms_cccf_get_weights(eq, w);
        dumpc("eqlms_w", w, L);
        eqlms_cccf_destroy(eq);
    }
    // cvsd codec: encode a deterministic tone+noise signal, decode back
    {
        unsigned T = 400;
        cvsd enc = cvsd_create(3, 1.5f, 0.95f);
        cvsd dec = cvsd_create(3, 1.5f, 0.95f);
        float x[T], xr[T];
        unsigned char bits[T];
        unsigned s = 59;
        for (unsigned i=0;i<T;i++) {
            s = s*1103515245u + 12345u;
            x[i] = 0.5f*sinf(2*M_PI*0.02f*i) +
                0.05f*(((float)((s>>16)&0xff))/127.5f - 1.0f);
        }
        for (unsigned i=0;i<T;i++) bits[i] = cvsd_encode(enc, x[i]);
        for (unsigned i=0;i<T;i++) xr[i] = cvsd_decode(dec, bits[i]);
        printf("cvsd_x :");
        for (unsigned i=0;i<T;i++) printf(" %.9e 0", x[i]);
        printf("\ncvsd_bits :");
        for (unsigned i=0;i<T;i++) printf(" %u 0", bits[i]);
        printf("\ncvsd_xr :");
        for (unsigned i=0;i<T;i++) printf(" %.9e 0", xr[i]);
        printf("\n");
        cvsd_destroy(enc); cvsd_destroy(dec);
    }
    // resamp: polyphase arbitrary resampler at rational rates
    {
        float rates[2] = {2.0f/3.0f, 1.25f};
        const char* names[2] = {"resamp_23", "resamp_54"};
        for (unsigned ci=0; ci<2; ci++) {
            unsigned T = 1200;
            resamp_crcf rs = resamp_crcf_create(rates[ci], 7, 0.25f,
                                                60.0f, 64);
            float complex x[T], y[2*T+8];
            unsigned s = 71+ci;
            for (unsigned i=0;i<T;i++) {
                s = s*1103515245u + 12345u;
                float re = ((float)((s>>16)&0xff))/127.5f - 1.0f;
                s = s*1103515245u + 12345u;
                float im = ((float)((s>>16)&0xff))/127.5f - 1.0f;
                x[i] = re + _Complex_I*im;
            }
            unsigned total=0, nw=0;
            for (unsigned i=0;i<T;i++) {
                resamp_crcf_execute(rs, x[i], &y[total], &nw);
                total += nw;
            }
            char tag[32];
            sprintf(tag, "%s_x", names[ci]); dumpc(tag, x, T);
            printf("%s_ny : %u\n", names[ci], total);
            sprintf(tag, "%s_y", names[ci]); dumpc(tag, y, total);
            resamp_crcf_destroy(rs);
        }
    }
    // freqmod/freqdem (16-bit LUT phase accumulator)
    {
        unsigned T = 300;
        float m[T]; float complex sfm[T]; float md[T];
        unsigned s = 83;
        for (unsigned i=0;i<T;i++) {
            s = s*1103515245u + 12345u;
            m[i] = ((float)((s>>16)&0xff))/127.5f - 1.0f;
        }
        freqmod fm = freqmod_create(0.1f);
        freqmod_modulate_block(fm, m, T, sfm);
        freqdem fd = freqdem_create(0.1f);
        freqdem_demodulate_block(fd, sfm, T, md);
        printf("freqmod_m :"); for (unsigned i=0;i<T;i++) printf(" %.9e 0", m[i]); printf("\n");
        dumpc("freqmod_s", sfm, T);
        printf("freqdem_m :"); for (unsigned i=0;i<T;i++) printf(" %.9e 0", md[i]); printf("\n");
        freqmod_destroy(fm); freqdem_destroy(fd);
    }
    // firfarrow fractional-delay taps + filtered output
    {
        firfarrow_crcf ff = firfarrow_crcf_create(19, 5, 0.45f, 60.0f);
        float mus[3] = {0.0f, 0.3f, -0.7f};
        for (unsigned ci=0; ci<3; ci++) {
            firfarrow_crcf_set_delay(ff, mus[ci]);
            float tap[19];
            firfarrow_crcf_get_coefficients(ff, tap);
            printf("farrow_h_%u :", ci);
            for (unsigned i=0;i<19;i++) printf(" %.9e 0", tap[i]);
            printf("\n");
        }
        firfarrow_crcf_destroy(ff);
    }
    // autocorr
    {
        unsigned T = 200, W = 32, D = 4;
        autocorr_cccf ac = autocorr_cccf_create(W, D);
        float complex x[T], r[T];
        unsigned s = 97;
        for (unsigned i=0;i<T;i++) {
            s = s*1103515245u + 12345u;
            float re = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            s = s*1103515245u + 12345u;
            float im = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            x[i] = re + _Complex_I*im;
        }
        for (unsigned i=0;i<T;i++) {
            autocorr_cccf_push(ac, x[i]);
            autocorr_cccf_execute(ac, &r[i]);
        }
        dumpc("autocorr_x", x, T);
        dumpc("autocorr_r", r, T);
        autocorr_cccf_destroy(ac);
    }
    // firhilb real->complex
    {
        unsigned T = 256, M = 5;
        firhilbf fh = firhilbf_create(M, 60.0f);
        float xr[2*T]; float complex yc[T];
        for (unsigned i=0;i<2*T;i++)
            xr[i] = cosf(2*M_PI*0.037f*i) + 0.5f*sinf(2*M_PI*0.181f*i);
        for (unsigned i=0;i<T;i++)
            firhilbf_decim_execute(fh, &xr[2*i], &yc[i]);
        printf("firhilb_x :"); for (unsigned i=0;i<2*T;i++) printf(" %.9e 0", xr[i]); printf("\n");
        dumpc("firhilb_y", yc, T);
        firhilbf_destroy(fh);
    }
    // fskmod: M-FSK with VCO phase accumulation
    {
        unsigned m = 2, k = 16, Ns = 64;
        fskmod fm = fskmod_create(m, k, 0.25f);
        float complex y[Ns*k];
        unsigned s = 151;
        unsigned char syms[Ns];
        for (unsigned i=0;i<Ns;i++) {
            s = s*1103515245u + 12345u;
            syms[i] = (s>>16) & 3;
        }
        for (unsigned i=0;i<Ns;i++)
            fskmod_modulate(fm, syms[i], &y[i*k]);
        printf("fsk_syms :"); for (unsigned i=0;i<Ns;i++) printf(" %u 0", syms[i]); printf("\n");
        dumpc("fsk_y", y, Ns*k);
        fskmod_destroy(fm);
    }
    // cpfskmod: continuous-phase FSK, square pulse
    {
        unsigned bps = 1, k = 8, mcp = 3, Ns = 80;
        cpfskmod cm = cpfskmod_create(bps, 0.5f, k, mcp, 0.25f,
                                      LIQUID_CPFSK_SQUARE);
        float complex y[Ns*k];
        unsigned s = 163;
        unsigned char syms[Ns];
        for (unsigned i=0;i<Ns;i++) {
            s = s*1103515245u + 12345u;
            syms[i] = (s>>16) & 1;
        }
        for (unsigned i=0;i<Ns;i++)
            cpfskmod_modulate(cm, syms[i], &y[i*k]);
        printf("cpfsk_syms :"); for (unsigned i=0;i<Ns;i++) printf(" %u 0", syms[i]); printf("\n");
        dumpc("cpfsk_y", y, Ns*k);
        cpfskmod_destroy(cm);
    }
    // ampmodem at fc=0 (nco table value at phase 0 is exactly 1)
    {
        unsigned T = 300;
        float x[T];
        for (unsigned i=0;i<T;i++)
            x[i] = 0.6f*cosf(2*M_PI*0.021f*i) + 0.2f*sinf(2*M_PI*0.0063f*i);
        printf("amp_x :"); for (unsigned i=0;i<T;i++) printf(" %.9e 0", x[i]); printf("\n");
        const char* names[3] = {"amp_dsb", "amp_usb", "amp_lsb"};
        liquid_ampmodem_type types[3] = {LIQUID_AMPMODEM_DSB,
                                         LIQUID_AMPMODEM_USB,
                                         LIQUID_AMPMODEM_LSB};
        for (unsigned ci=0; ci<3; ci++) {
            ampmodem am = ampmodem_create(0.1f, 0.0f, types[ci], ci==1);
            float complex y[T];
            for (unsigned i=0;i<T;i++) ampmodem_modulate(am, x[i], &y[i]);
            dumpc(names[ci], y, T);
            ampmodem_destroy(am);
        }
    }
    // nco mixing: VCO (exact sincos) and NCO (256-entry table) modes
    {
        unsigned T = 300;
        float complex x[T], yv[T], yn[T];
        unsigned s = 177;
        for (unsigned i=0;i<T;i++) {
            s = s*1103515245u + 12345u;
            float re = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            s = s*1103515245u + 12345u;
            float im = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            x[i] = re + _Complex_I*im;
        }
        dumpc("nco_x", x, T);
        nco_crcf v = nco_crcf_create(LIQUID_VCO);
        nco_crcf_set_frequency(v, 0.123f);
        nco_crcf_mix_block_up(v, x, yv, T);
        dumpc("nco_vco_y", yv, T);
        nco_crcf_destroy(v);
        nco_crcf n = nco_crcf_create(LIQUID_NCO);
        nco_crcf_set_frequency(n, 0.123f);
        nco_crcf_mix_block_up(n, x, yn, T);
        dumpc("nco_lut_y", yn, T);
        nco_crcf_destroy(n);
    }
    // spgram one-shot psd (kaiser window beta=10, wlen=128, nfft=256)
    {
        unsigned T = 300, nfft = 256, wlen = 128;
        spgramcf sp = spgramcf_create_kaiser(nfft, wlen, 10.0f);
        float complex x[T];
        unsigned s = 191;
        for (unsigned i=0;i<T;i++) {
            s = s*1103515245u + 12345u;
            float re = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            s = s*1103515245u + 12345u;
            float im = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            x[i] = re + _Complex_I*im;
        }
        spgramcf_write(sp, x, T);
        float psd[nfft];
        spgramcf_execute_psd(sp, psd);
        dumpc("spgram_x", x, T);
        printf("spgram_psd :"); for (unsigned i=0;i<nfft;i++) printf(" %.9e 0", psd[i]); printf("\n");
        spgramcf_destroy(sp);
    }
    // design layer: iirdes sos coefficients, firdespm, rnyquist taps
    {
        float B[15], A[15];
        liquid_iirdes(LIQUID_IIRDES_BUTTER, LIQUID_IIRDES_LOWPASS,
                      LIQUID_IIRDES_SOS, 5, 0.2f, 0.0f, 1.0f, 60.0f, B, A);
        printf("iirdes_butter5_B :"); for (unsigned i=0;i<9;i++) printf(" %.9e 0", B[i]); printf("\n");
        printf("iirdes_butter5_A :"); for (unsigned i=0;i<9;i++) printf(" %.9e 0", A[i]); printf("\n");
        liquid_iirdes(LIQUID_IIRDES_ELLIP, LIQUID_IIRDES_LOWPASS,
                      LIQUID_IIRDES_SOS, 5, 0.2f, 0.0f, 1.0f, 60.0f, B, A);
        printf("iirdes_ellip5_B :"); for (unsigned i=0;i<9;i++) printf(" %.9e 0", B[i]); printf("\n");
        printf("iirdes_ellip5_A :"); for (unsigned i=0;i<9;i++) printf(" %.9e 0", A[i]); printf("\n");
        liquid_iirdes(LIQUID_IIRDES_CHEBY2, LIQUID_IIRDES_LOWPASS,
                      LIQUID_IIRDES_SOS, 4, 0.15f, 0.0f, 1.0f, 50.0f, B, A);
        printf("iirdes_cheby24_B :"); for (unsigned i=0;i<6;i++) printf(" %.9e 0", B[i]); printf("\n");
        printf("iirdes_cheby24_A :"); for (unsigned i=0;i<6;i++) printf(" %.9e 0", A[i]); printf("\n");
    }
    {
        unsigned n = 51;
        float h[n];
        float bands[4] = {0.0f, 0.2f, 0.25f, 0.5f};
        float des[2] = {1.0f, 0.0f};
        float wts[2] = {1.0f, 1.0f};
        liquid_firdespm_btype btype = LIQUID_FIRDESPM_BANDPASS;
        liquid_firdespm_wtype wtype[2] = {LIQUID_FIRDESPM_FLATWEIGHT,
                                          LIQUID_FIRDESPM_FLATWEIGHT};
        firdespm_run(n, 2, bands, des, wts, wtype, btype, h);
        printf("firdespm_h :"); for (unsigned i=0;i<n;i++) printf(" %.9e 0", h[i]); printf("\n");
    }
    {
        float h[2*2*7+1];
        liquid_firdes_prototype(LIQUID_FIRFILT_RRC, 2, 7, 0.3f, 0.0f, h);
        printf("proto_rrc_h :"); for (unsigned i=0;i<29;i++) printf(" %.9e 0", h[i]); printf("\n");
        liquid_firdes_prototype(LIQUID_FIRFILT_hM3, 2, 7, 0.3f, 0.0f, h);
        printf("proto_hm3_h :"); for (unsigned i=0;i<29;i++) printf(" %.9e 0", h[i]); printf("\n");
    }
    // lpc + group delay
    {
        unsigned T = 128, P = 6;
        float xx[T];
        unsigned s = 199;
        float prev1 = 0, prev2 = 0;
        for (unsigned i=0;i<T;i++) {
            s = s*1103515245u + 12345u;
            float w = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            float v = w + 1.2f*prev1 - 0.5f*prev2;
            xx[i] = v; prev2 = prev1; prev1 = v;
        }
        float ac[P+1], lc[P+1], rc[P+1];
        liquid_lpc(xx, T, P, lc, rc);
        (void)ac;
        printf("lpc_x :"); for (unsigned i=0;i<T;i++) printf(" %.9e 0", xx[i]); printf("\n");
        printf("lpc_a :"); for (unsigned i=0;i<=P;i++) printf(" %.9e 0", lc[i]); printf("\n");
        printf("lpc_g :"); for (unsigned i=0;i<=P;i++) printf(" %.9e 0", rc[i]); printf("\n");
        float h[21];
        liquid_firdes_kaiser(21, 0.2f, 60.0f, 0.0f, h);
        float gd = fir_group_delay(h, 21, 0.1f);
        printf("gdelay_fir : %.9e 0\n", gd);
        float b3[3] = {0.2f, 0.4f, 0.2f}, a3[3] = {1.0f, -0.3f, 0.1f};
        float gdi = iir_group_delay(b3, 3, a3, 3, 0.1f);
        printf("gdelay_iir : %.9e 0\n", gdi);
    }
    // resamp2 halfband decim/interp
    {
        unsigned m = 7, T = 256;
        resamp2_crcf rd = resamp2_crcf_create(m, 0.0f, 60.0f);
        resamp2_crcf ri = resamp2_crcf_create(m, 0.0f, 60.0f);
        float complex x[T], yd[T/2], yi[2*T];
        unsigned s = 211;
        for (unsigned i=0;i<T;i++) {
            s = s*1103515245u + 12345u;
            float re = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            s = s*1103515245u + 12345u;
            float im = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            x[i] = re + _Complex_I*im;
        }
        for (unsigned i=0;i<T/2;i++)
            resamp2_crcf_decim_execute(rd, &x[2*i], &yd[i]);
        for (unsigned i=0;i<T;i++)
            resamp2_crcf_interp_execute(ri, x[i], &yi[2*i]);
        dumpc("r2_x", x, T);
        dumpc("r2_decim", yd, T/2);
        dumpc("r2_interp", yi, 2*T);
        resamp2_crcf_destroy(rd); resamp2_crcf_destroy(ri);
    }
    // resamp2 QMF analyzer/synthesizer
    {
        unsigned m = 5, T = 256;
        resamp2_crcf qa = resamp2_crcf_create(m, 0.0f, 60.0f);
        resamp2_crcf qs = resamp2_crcf_create(m, 0.0f, 60.0f);
        float complex x[T], ylo[T/2], yhi[T/2], z[T];
        unsigned s = 223;
        for (unsigned i=0;i<T;i++) {
            s = s*1103515245u + 12345u;
            float re = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            s = s*1103515245u + 12345u;
            float im = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            x[i] = re + _Complex_I*im;
        }
        for (unsigned i=0;i<T/2;i++) {
            float complex pair[2];
            resamp2_crcf_analyzer_execute(qa, &x[2*i], pair);
            ylo[i] = pair[0]; yhi[i] = pair[1];
        }
        for (unsigned i=0;i<T/2;i++) {
            float complex pair[2] = {ylo[i], yhi[i]};
            resamp2_crcf_synthesizer_execute(qs, pair, &z[2*i]);
        }
        dumpc("qmf_x", x, T);
        dumpc("qmf_lo", ylo, T/2);
        dumpc("qmf_hi", yhi, T/2);
        dumpc("qmf_z", z, T);
        resamp2_crcf_destroy(qa); resamp2_crcf_destroy(qs);
    }
    // iirdecim / iirinterp default butter prototypes
    {
        unsigned M = 2, T = 200;
        iirdecim_crcf qd = iirdecim_crcf_create_default(M, 4);
        iirinterp_crcf qi = iirinterp_crcf_create_default(M, 4);
        float complex x[T], yd[T/2], yi[2*T];
        unsigned s = 229;
        for (unsigned i=0;i<T;i++) {
            s = s*1103515245u + 12345u;
            float re = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            s = s*1103515245u + 12345u;
            float im = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            x[i] = re + _Complex_I*im;
        }
        iirdecim_crcf_execute_block(qd, x, T/M, yd);
        iirinterp_crcf_execute_block(qi, x, T, yi);
        dumpc("iird_x", x, T);
        dumpc("iird_y", yd, T/2);
        dumpc("iiri_y", yi, 2*T);
        iirdecim_crcf_destroy(qd); iirinterp_crcf_destroy(qi);
    }
    // msresamp2 2-stage cascade
    {
        unsigned T = 256, NS = 2;
        msresamp2_crcf qd = msresamp2_crcf_create(LIQUID_RESAMP_DECIM,
                                                  NS, 0.4f, 0.0f, 60.0f);
        msresamp2_crcf qi = msresamp2_crcf_create(LIQUID_RESAMP_INTERP,
                                                  NS, 0.4f, 0.0f, 60.0f);
        float complex x[T], yd[T/4], yi[4*T];
        unsigned s = 233;
        for (unsigned i=0;i<T;i++) {
            s = s*1103515245u + 12345u;
            float re = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            s = s*1103515245u + 12345u;
            float im = ((float)((s>>16)&0xff))/127.5f - 1.0f;
            x[i] = re + _Complex_I*im;
        }
        for (unsigned i=0;i<T/4;i++)
            msresamp2_crcf_execute(qd, &x[4*i], &yd[i]);
        for (unsigned i=0;i<T;i++)
            msresamp2_crcf_execute(qi, &x[i], &yi[4*i]);
        dumpc("ms2_x", x, T);
        dumpc("ms2_d", yd, T/4);
        dumpc("ms2_i", yi, 4*T);
        msresamp2_crcf_destroy(qd); msresamp2_crcf_destroy(qi);
    }
    // byte utilities
    {
        unsigned char in[6] = {0x12, 0x34, 0x56, 0x78, 0x9A, 0xBC};
        unsigned char out[20];
        unsigned int nw;
        liquid_repack_bytes(in, 8, 6, out, 3, 16, &nw);
        printf("repack_8to3 :"); for (unsigned i=0;i<nw;i++) printf(" %u 0", out[i]); printf("\n");
        liquid_repack_bytes(in, 8, 6, out, 5, 10, &nw);
        printf("repack_8to5 :"); for (unsigned i=0;i<nw;i++) printf(" %u 0", out[i]); printf("\n");
        unsigned char arr[4] = {0, 0, 0, 0};
        liquid_pack_array(arr, 4, 3, 5, 0x15);
        liquid_pack_array(arr, 4, 13, 7, 0x5A);
        printf("packarr :"); for (unsigned i=0;i<4;i++) printf(" %u 0", arr[i]); printf("\n");
        unsigned char shf[4] = {0x81, 0xC3, 0xE7, 0xFF};
        unsigned char tmp[4];
        memcpy(tmp, shf, 4); liquid_lbshift(tmp, 4, 5);
        printf("lbshift :"); for (unsigned i=0;i<4;i++) printf(" %u 0", tmp[i]); printf("\n");
        memcpy(tmp, shf, 4); liquid_rbcircshift(tmp, 4, 11);
        printf("rbcirc :"); for (unsigned i=0;i<4;i++) printf(" %u 0", tmp[i]); printf("\n");
    }
    ofdm_raw_case(64, 16, 123);
    offg_case("offg_a", 64, 16, 64, LIQUID_CRC_32, LIQUID_FEC_NONE,
              LIQUID_FEC_GOLAY2412, LIQUID_MODEM_QPSK, 101);
    offg_case("offg_b", 64, 16, 40, LIQUID_CRC_16, LIQUID_FEC_HAMMING128,
              LIQUID_FEC_NONE, LIQUID_MODEM_QAM16, 113);
    return 0;
}
"""


def main():
    text = compile_and_run(GEN_C, "flexframe_golden")
    arrays = {}
    for line in text.strip().splitlines():
        tag, _, rest = line.partition(" :")
        vals = rest.split()
        if tag.endswith("_len"):
            arrays[tag] = np.asarray([int(v) for v in vals], np.int64)
        else:
            v = np.asarray([float(x) for x in vals], np.float64)
            arrays[tag] = (v[0::2] + 1j * v[1::2]).astype(np.complex64)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez(OUT, **arrays)
    print(f"wrote {OUT} ({len(arrays)} arrays)")
    for k in sorted(arrays):
        print(f"  {k}: {arrays[k].shape}")


if __name__ == "__main__":
    main()
