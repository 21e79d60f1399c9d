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


# ---------------------------------------------------------------------------
# Full-device fixed-config pipeline (framing/ofdmflex_stream.py)

from liquid_dsp_tpu.framing.ofdmflex_stream import (OFDMFlexStreamRX,
                                                    ofdmflex_rx_stream)


class TestDevicePipeline:
    def test_multi_frame_noise_cfo_all_decode(self):
        rng = np.random.default_rng(11)
        n = 64
        cap = np.zeros(24576, np.complex64)
        sent = []
        for s0 in (900, 8000, 17000):
            h, p, f = _mkframe(rng, n)
            cap[s0:s0 + len(f)] += f
            sent.append((s0, h, p))
        cap = cap * np.exp(1j * 0.002 * np.arange(len(cap)))
        cap += (0.02 * (rng.standard_normal(len(cap)) +
                        1j * rng.standard_normal(len(cap)))
                ).astype(np.complex64)
        fired = []
        rx = OFDMFlexStreamRX(n, callback=lambda *a: fired.append(a),
                              block_len=4096)
        for i in range(0, len(cap), 6000):    # arbitrary chunking
            rx.execute(cap[i:i + 6000])
        rx.flush()
        assert len(rx.frames) == 3 and len(fired) == 3
        for (s0, h, p), fr in zip(sent, rx.frames):
            hh, hok, pp, pok, st = fr
            assert hok and pok
            np.testing.assert_array_equal(hh, h)
            np.testing.assert_array_equal(pp, p)
            # coarse plateau index: the S0 plateau peak can land up to
            # ~a symbol late under noise; S1 timing recovers exactness
            assert abs(st["sample_index"] - s0) < 160
            assert st["evm_db"] < -20

    def test_frame_straddles_block_boundary(self):
        rng = np.random.default_rng(12)
        h, p, f = _mkframe(rng, 64)
        cap = np.zeros(12288, np.complex64)
        s0 = 4096 - len(f) // 2
        cap[s0:s0 + len(f)] += f
        rx = OFDMFlexStreamRX(64, block_len=4096)
        rx.execute(cap)
        rx.flush()
        assert len(rx.frames) == 1
        hh, hok, pp, pok, st = rx.frames[0]
        assert hok and pok
        np.testing.assert_array_equal(pp, p)

    def test_config_mismatch_header_rejected(self):
        # a frame TXed with a different payload length/scheme must come
        # back header_ok=False from the fixed-config pipeline (its
        # header CRC passes but the fields disagree)
        rng = np.random.default_rng(13)
        h, p, f = _mkframe(rng, 32, ms="qam16")
        cap = np.zeros(8192, np.complex64)
        cap[1200:1200 + len(f)] += f
        rx = OFDMFlexStreamRX(64, block_len=4096)   # expects 64B qpsk
        rx.execute(cap)
        rx.flush()
        assert len(rx.frames) == 1
        hh, hok, pp, pok, st = rx.frames[0]
        assert not hok and pp is None

    def test_no_signal_no_frames(self):
        rng = np.random.default_rng(14)
        cap = (0.1 * (rng.standard_normal(12288) +
                      1j * rng.standard_normal(12288))).astype(np.complex64)
        rx = OFDMFlexStreamRX(64, block_len=4096)
        rx.execute(cap)
        rx.flush()
        assert rx.frames == []

    def test_batched_channels(self):
        # channel-batched apply: each row carries its own frame; both
        # decode independently in one jitted step sequence
        import jax
        import jax.numpy as jnp
        rng = np.random.default_rng(15)
        n = 64
        proc = ofdmflex_rx_stream(4096, n)
        frames, rows = [], []
        for r in range(2):
            h, p, f = _mkframe(rng, n)
            row = np.zeros(12288, np.complex64)
            row[700 + 800 * r:700 + 800 * r + len(f)] += f
            rows.append(row)
            frames.append((h, p))
        x = np.stack(rows)
        carry = proc.init(batch_shape=(2,))
        step = jax.jit(proc.apply)
        outs = []
        for b in range(3):
            out, carry = step((), carry, jnp.asarray(x[:, b*4096:(b+1)*4096]))
            outs.append(out)
        from liquid_dsp_tpu.fec.device import (packetizer_soft_decoder,
                                               qpacket_soft_decoder)
        _, hfin = packetizer_soft_decoder(14, "crc32", "none", "golay2412")
        _, pfin = qpacket_soft_decoder(n, "crc32", "none", "golay2412",
                                       "qpsk")
        seen = [0, 0]
        for out in outs:
            v = np.asarray(out.valid)
            for r in range(2):
                for s in np.nonzero(v[r])[0]:
                    hdr, hok = hfin(np.asarray(out.hdr_msgs[r][s]))
                    pl, pok = pfin(np.asarray(out.pay_msgs[r][s]))
                    assert hok and pok
                    np.testing.assert_array_equal(hdr[:8], frames[r][0])
                    np.testing.assert_array_equal(pl, frames[r][1])
                    seen[r] += 1
        assert seen == [1, 1]
