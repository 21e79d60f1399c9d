"""Streaming multi-frame GMSK receiver (GMSKFrameSync).

Mirrors the reference gmskframesync callback contract (reference
src/framing/src/gmskframesync.c): unbounded stream in, one callback per
decoded frame, automatic re-arm.
"""
import numpy as np
import jax.numpy as jnp
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


class TestGmskFullDeviceRX:
    """gmskframe_rx_stream: the FULL fixed-config GMSK receiver in one
    jitted block step (detect, batched phase-derivative demod,
    descrambled header decode, payload decode, byte pack + CRC)."""

    def _drain(self, proc, stream, block):
        import jax
        c = proc.init()
        step = jax.jit(proc.apply)
        found = []
        for b in range(len(stream) // block):
            out, c = step((), c, jnp.asarray(stream[b*block:(b+1)*block]))
            v = np.asarray(out.valid)
            for p in np.nonzero(v)[0]:
                found.append(
                    (int(np.asarray(out.sample_index[p])),
                     bool(np.asarray(out.hdr_ok[p])),
                     np.asarray(out.hdr_bytes[p][:8]).astype(np.uint8),
                     bool(np.asarray(out.pay_ok[p])),
                     np.asarray(out.pay_bytes[p]).astype(np.uint8)))
        return found

    def test_frames_with_cfo_noise_decode_once(self):
        from liquid_dsp_tpu.framing.gmskframe import (gmskframegen,
                                                      gmskframe_rx_stream)
        rng = np.random.default_rng(0)
        T, PL = 2048, 40
        proc = gmskframe_rx_stream(T, PL, fec1="golay2412")
        hdrs, pays, pos, parts = [], [], [], []
        cur = 0
        for gap in (900, 1400, 700):
            h = rng.integers(0, 256, 8).astype(np.uint8)
            p = rng.integers(0, 256, PL).astype(np.uint8)
            f = gmskframegen(h, p, fec1="golay2412")
            parts += [np.zeros(gap, np.complex64), f]
            cur += gap
            hdrs.append(h); pays.append(p); pos.append(cur)
            cur += len(f)
        parts.append(np.zeros(6 * T, np.complex64))
        x = np.concatenate(parts)[:10 * T]
        n = np.arange(len(x))
        x = (x * np.exp(1j * (0.0015 * n + 0.3))).astype(np.complex64)
        x += (0.005 * (rng.standard_normal(len(x)) +
                       1j * rng.standard_normal(len(x)))
              ).astype(np.complex64)
        found = self._drain(proc, x, T)
        assert len(found) == 3, [f[0] for f in found]
        for (idx, hok, hdr, pok, pay), h, p, s in zip(found, hdrs, pays,
                                                      pos):
            assert abs(idx - s) <= 2
            assert hok and pok
            assert (hdr == h).all() and (pay == p).all()

    def test_wrong_config_rejected(self):
        from liquid_dsp_tpu.framing.gmskframe import (gmskframegen,
                                                      gmskframe_rx_stream)
        rng = np.random.default_rng(1)
        T, PL = 2048, 40
        proc = gmskframe_rx_stream(T, PL, fec1="golay2412")
        h = rng.integers(0, 256, 8).astype(np.uint8)
        p = rng.integers(0, 256, PL).astype(np.uint8)
        f = gmskframegen(h, p, fec1="none")     # different payload FEC
        x = np.zeros(8 * T, np.complex64)
        x[1000:1000 + len(f)] = f
        x += (0.002 * (rng.standard_normal(len(x)) +
                       1j * rng.standard_normal(len(x)))
              ).astype(np.complex64)
        found = self._drain(proc, x, T)
        assert len(found) >= 1
        assert not found[0][1]                  # hdr_ok False
