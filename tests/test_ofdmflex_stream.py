"""Streaming multi-frame OFDM flexframe receiver (OFDMFlexFrameSync).

Mirrors the reference ofdmflexframesync callback contract: unbounded
stream in, one callback per decoded frame, automatic re-arm.
"""
import numpy as np
import pytest

from liquid_dsp_tpu.framing.ofdmflexframe import (ofdmflexframegen,
                                                  ofdmflexframesync,
                                                  OFDMFlexFrameSync)


def _mkframe(rng, n, ms="qpsk", fec1="golay2412"):
    h = rng.integers(0, 256, 8).astype(np.uint8)
    p = rng.integers(0, 256, n).astype(np.uint8)
    return h, p, ofdmflexframegen(h, p, ms=ms, fec1=fec1)


class TestMultiFrame:
    def test_k_frames_mixed_schemes_all_decode(self):
        rng = np.random.default_rng(1)
        cap = np.zeros(20000, np.complex64)
        sent = []
        for s0, (n, ms, fec1) in zip(
                (1000, 8000, 15000),
                ((40, "qpsk", "golay2412"), (120, "qam16", "hamming74"),
                 (20, "bpsk", "none"))):
            h, p, f = _mkframe(rng, n, ms, fec1)
            cap[s0:s0 + len(f)] += f
            sent.append((s0, h, p))
        cap = cap * np.exp(1j * 0.002 * np.arange(len(cap)))
        cap += (0.01 * (rng.standard_normal(len(cap)) +
                        1j * rng.standard_normal(len(cap)))
                ).astype(np.complex64)
        fired = []
        fs = OFDMFlexFrameSync(callback=lambda *a: fired.append(a),
                               block_len=4096)
        for i in range(0, len(cap), 6000):   # arbitrary chunking
            fs.execute(cap[i:i + 6000])
        fs.flush()
        assert len(fs.frames) == 3 and len(fired) == 3
        for (s0, h, p), fr in zip(sent, fs.frames):
            hh, hok, pp, pok, st = fr
            assert hok and pok
            np.testing.assert_array_equal(hh, h)
            np.testing.assert_array_equal(pp, p)
            assert abs(st["sample_index"] - s0) < 64
            assert st["evm_db"] < -20

    def test_frame_straddles_block_boundary(self):
        rng = np.random.default_rng(2)
        h, p, f = _mkframe(rng, 64)
        cap = np.zeros(12288, np.complex64)
        s0 = 4096 - len(f) // 2
        cap[s0:s0 + len(f)] += f
        fs = OFDMFlexFrameSync(block_len=4096)
        fs.execute(cap)
        fs.flush()
        assert len(fs.frames) == 1
        hh, hok, pp, pok, st = fs.frames[0]
        assert hok and pok
        np.testing.assert_array_equal(pp, p)

    def test_no_signal_no_frames(self):
        rng = np.random.default_rng(3)
        cap = (0.1 * (rng.standard_normal(16384) +
                      1j * rng.standard_normal(16384))).astype(np.complex64)
        fs = OFDMFlexFrameSync(block_len=4096)
        fs.execute(cap)
        fs.flush()
        assert fs.frames == []

    def test_matches_oneshot(self):
        rng = np.random.default_rng(4)
        h, p, f = _mkframe(rng, 50, "psk8", "hamming128")
        cap = np.zeros(8192, np.complex64)
        cap[700:700 + len(f)] += f
        cap = cap * np.exp(1j * 0.001 * np.arange(len(cap)))
        one = ofdmflexframesync(cap)
        fs = OFDMFlexFrameSync(block_len=4096)
        fs.execute(cap)
        fs.flush()
        assert one.crc_ok and len(fs.frames) == 1
        hh, hok, pp, pok, st = fs.frames[0]
        assert pok
        np.testing.assert_array_equal(pp, one.payload)
        np.testing.assert_array_equal(hh, one.header)
