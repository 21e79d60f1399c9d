"""Streaming multi-frame GMSK receiver (GMSKFrameSync).

Mirrors the reference gmskframesync callback contract (reference
src/framing/src/gmskframesync.c): unbounded stream in, one callback per
decoded frame, automatic re-arm.
"""
import numpy as np
import pytest

from liquid_dsp_tpu.framing.gmskframe import (gmskframegen, gmskframesync,
                                              GMSKFrameSync)


def _mkframe(rng, n, fec0="none"):
    h = rng.integers(0, 256, 8).astype(np.uint8)
    p = rng.integers(0, 256, n).astype(np.uint8)
    return h, p, gmskframegen(h, p, fec0=fec0)


class TestMultiFrame:
    def test_k_frames_all_decode(self):
        rng = np.random.default_rng(1)
        cap = np.zeros(30000, np.complex64)
        sent = []
        for s0, (n, fec0) in zip((1500, 11000, 21000),
                                 ((40, "none"), (100, "hamming74"),
                                  (25, "golay2412"))):
            h, p, f = _mkframe(rng, n, fec0)
            cap[s0:s0 + len(f)] += f
            sent.append((s0, h, p))
        t = np.arange(len(cap))
        cap = cap * np.exp(1j * (0.0008 * t + 0.5))
        cap += (0.02 / np.sqrt(2) * (rng.standard_normal(len(cap)) +
                                     1j * rng.standard_normal(len(cap)))
                ).astype(np.complex64)
        fired = []
        fs = GMSKFrameSync(callback=lambda *a: fired.append(a),
                           block_len=4096)
        # arbitrary chunking, as an SDR driver would deliver
        for i in range(0, len(cap), 5000):
            fs.execute(cap[i:i + 5000])
        fs.flush()
        assert len(fs.frames) == 3
        assert len(fired) == 3
        for (s0, h, p), fr in zip(sent, fs.frames):
            hh, hok, pp, pok, st = fr
            assert hok and pok
            np.testing.assert_array_equal(hh, h)
            np.testing.assert_array_equal(pp, p)
            assert abs(st["sample_index"] - s0) <= 2

    def test_frame_straddles_block_boundary(self):
        rng = np.random.default_rng(2)
        h, p, f = _mkframe(rng, 64, "hamming128")
        # place the frame right across the 4096 boundary
        cap = np.zeros(12288, np.complex64)
        s0 = 4096 - len(f) // 3
        cap[s0:s0 + len(f)] += f
        fs = GMSKFrameSync(block_len=4096)
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
        fs = GMSKFrameSync(block_len=4096)
        fs.execute(cap)
        fs.flush()
        assert fs.frames == []

    def test_matches_oneshot(self):
        """Streaming decode agrees with the one-shot gmskframesync."""
        rng = np.random.default_rng(4)
        h, p, f = _mkframe(rng, 50, "none")
        cap = np.zeros(8192, np.complex64)
        cap[700:700 + len(f)] += f
        cap = cap * np.exp(1j * 0.001 * np.arange(len(cap)))
        one = gmskframesync(cap)
        fs = GMSKFrameSync(block_len=4096)
        fs.execute(cap)
        fs.flush()
        assert one.crc_ok and len(fs.frames) == 1
        hh, hok, pp, pok, st = fs.frames[0]
        assert pok
        np.testing.assert_array_equal(pp, one.payload)
        np.testing.assert_array_equal(hh, one.header)
