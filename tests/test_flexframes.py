"""flexframe / ofdmflexframe / gmskframe loopback tests (reference
src/framing/tests autotest style: assemble, impair, recover; sweep
payload modulation and FEC properties)."""
import numpy as np
import pytest

from liquid_dsp_tpu.framing.flexframe import (flexframegen, flexframesync,
                                              FLEXFRAME_H_USER)
from liquid_dsp_tpu.framing.ofdmflexframe import (
    ofdmflexframegen, ofdmflexframesync, OFDMFLEXFRAME_H_USER)
from liquid_dsp_tpu.framing.gmskframe import (gmskframegen, gmskframesync,
                                              GMSKFRAME_H_USER)


def _impair(f, pad=120, gain=0.6, cfo=0.003, phase=0.9, snr_db=None,
            seed=1):
    x = np.concatenate([np.zeros(pad, np.complex64), f,
                        np.zeros(pad, np.complex64)])
    t = np.arange(len(x))
    x = gain * x * np.exp(1j * (cfo * t + phase))
    if snr_db is not None:
        rng = np.random.default_rng(seed)
        s = gain * 10 ** (-snr_db / 20) * np.sqrt(np.mean(np.abs(f) ** 2))
        x = x + s / np.sqrt(2) * (rng.standard_normal(len(x)) +
                                  1j * rng.standard_normal(len(x)))
    return x.astype(np.complex64)


class TestFlexFrame:
    @pytest.mark.parametrize("n,ms,fec1", [
        (40, "qpsk", "golay2412"),
        (100, "qam16", "hamming128"),
        (250, "psk8", "none"),
        (17, "qam64", "rep3"),
        (1, "bpsk", "none"),
    ])
    def test_loopback(self, n, ms, fec1):
        rng = np.random.default_rng(n)
        hdr = rng.integers(0, 256, FLEXFRAME_H_USER).astype(np.uint8)
        pl = rng.integers(0, 256, n).astype(np.uint8)
        f = flexframegen(hdr, pl, "crc32", "none", fec1, ms)
        r = flexframesync(_impair(f))
        assert r.detected and r.header_ok and r.crc_ok
        assert r.ms == ms and r.payload_len == n
        np.testing.assert_array_equal(r.header, hdr)
        np.testing.assert_array_equal(r.payload, pl)

    def test_noisy(self):
        rng = np.random.default_rng(9)
        hdr = rng.integers(0, 256, FLEXFRAME_H_USER).astype(np.uint8)
        pl = rng.integers(0, 256, 80).astype(np.uint8)
        f = flexframegen(hdr, pl, "crc32", "none", "golay2412", "qpsk")
        r = flexframesync(_impair(f, snr_db=15))
        assert r.crc_ok
        np.testing.assert_array_equal(r.payload, pl)

    def test_bad_header_size(self):
        with pytest.raises(ValueError):
            flexframegen(np.zeros(5, np.uint8), np.zeros(10, np.uint8))


class TestOFDMFlexFrame:
    @pytest.mark.parametrize("n,ms,fec1", [
        (64, "qpsk", "golay2412"),
        (200, "qam16", "hamming128"),
        (33, "psk8", "none"),
    ])
    def test_loopback(self, n, ms, fec1):
        rng = np.random.default_rng(n)
        hdr = rng.integers(0, 256, OFDMFLEXFRAME_H_USER).astype(np.uint8)
        pl = rng.integers(0, 256, n).astype(np.uint8)
        f = ofdmflexframegen(hdr, pl, ms=ms, fec1=fec1)
        r = ofdmflexframesync(_impair(f, cfo=0.004))
        assert r.detected and r.header_ok and r.crc_ok
        np.testing.assert_array_equal(r.header, hdr)
        np.testing.assert_array_equal(r.payload, pl)

    def test_noisy(self):
        rng = np.random.default_rng(11)
        hdr = rng.integers(0, 256, OFDMFLEXFRAME_H_USER).astype(np.uint8)
        pl = rng.integers(0, 256, 120).astype(np.uint8)
        f = ofdmflexframegen(hdr, pl, fec1="golay2412")
        r = ofdmflexframesync(_impair(f, snr_db=18, cfo=0.002))
        assert r.crc_ok
        np.testing.assert_array_equal(r.payload, pl)


class TestGMSKFrame:
    @pytest.mark.parametrize("n,fec1", [(40, "none"), (100, "golay2412"),
                                        (25, "hamming74")])
    def test_loopback(self, n, fec1):
        rng = np.random.default_rng(n)
        hdr = rng.integers(0, 256, GMSKFRAME_H_USER).astype(np.uint8)
        pl = rng.integers(0, 256, n).astype(np.uint8)
        f = gmskframegen(hdr, pl, fec1=fec1)
        r = gmskframesync(_impair(f, cfo=0.002))
        assert r.detected and r.header_ok and r.crc_ok
        np.testing.assert_array_equal(r.header, hdr)
        np.testing.assert_array_equal(r.payload, pl)

    def test_noisy(self):
        rng = np.random.default_rng(13)
        hdr = rng.integers(0, 256, GMSKFRAME_H_USER).astype(np.uint8)
        pl = rng.integers(0, 256, 60).astype(np.uint8)
        f = gmskframegen(hdr, pl, fec1="golay2412")
        r = gmskframesync(_impair(f, snr_db=20))
        assert r.crc_ok
        np.testing.assert_array_equal(r.payload, pl)
