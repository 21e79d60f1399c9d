"""Tests for symtrack, signal sources, byte packets, and correlators."""
import numpy as np
import jax.numpy as jnp
import pytest

from liquid_dsp_tpu.framing.symtrack import symtrack
from liquid_dsp_tpu.framing.sources import (symstream, msource,
                                            FrameDataStats)
from liquid_dsp_tpu.framing.bpacket import (
    bpacketgen, bpacketsync, bsync_correlate, bpresync_detect,
    detector_cccf_detect)
from liquid_dsp_tpu.modem import constellation, modulate
from liquid_dsp_tpu.ops.fir import firinterp
from liquid_dsp_tpu.design.firdes import firdes_prototype


def _qpsk_stream(n, gain=1.0, phase=0.0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    table = constellation("qpsk")
    sidx = rng.integers(0, 4, n)
    syms = np.asarray(modulate(table, jnp.asarray(sidx)))
    tx = firinterp(2, firdes_prototype("arkaiser", 2, 7, 0.3))
    x, _ = tx(jnp.asarray(syms.astype(np.complex64)), batch_shape=())
    x = gain * np.asarray(x) * np.exp(1j * phase)
    if noise:
        x = x + noise * (rng.standard_normal(len(x)) +
                         1j * rng.standard_normal(len(x)))
    return sidx, x.astype(np.complex64)


class TestSymtrack:
    def test_recovers_constellation(self):
        _, x = _qpsk_stream(3000, gain=0.3, phase=0.8, noise=0.004)
        r = symtrack(x)
        tail = r.symbols[-600:]
        # unit-modulus QPSK after AGC/EQ/PLL
        assert abs(np.mean(np.abs(tail)) - 1.0) < 0.05
        assert np.mean(np.abs(np.abs(tail) - 1.0)) < 0.05
        # decisions concentrated on 4 points
        ang = np.angle(tail * np.exp(1j * np.pi / 4))
        spread = np.min(np.abs(np.mod(ang, np.pi / 2) - np.pi / 4))
        assert r.decisions.shape == tail.shape[:0] + r.symbols.shape


class TestSymtrackStream:
    def test_stream_matches_oneshot(self):
        """Block-by-block streaming == one-shot on the same capture."""
        from liquid_dsp_tpu.framing.symtrack import Symtrack
        _, x = _qpsk_stream(2000, gain=0.3, phase=0.8, noise=0.004, seed=3)
        ref = symtrack(x)
        st = Symtrack(block_len=512)
        n_use = len(x) // st.block_len * st.block_len
        sy, dec = st.execute(x[:n_use])
        n = min(len(sy), len(ref.symbols))
        assert n > 1500
        np.testing.assert_allclose(sy[:n], ref.symbols[:n],
                                   rtol=0, atol=2e-4)
        np.testing.assert_array_equal(dec[:n], ref.decisions[:n])

    def test_block_size_invariance(self):
        """Same capture split into different block sizes -> same output."""
        from liquid_dsp_tpu.framing.symtrack import Symtrack
        _, x = _qpsk_stream(1500, gain=0.5, phase=-0.4, noise=0.01, seed=4)
        outs = []
        for bl in (256, 1024):
            st = Symtrack(block_len=bl)
            n_use = len(x) // 1024 * 1024
            sy, dec = st.execute(x[:n_use])
            outs.append((sy, dec))
        n = min(len(outs[0][0]), len(outs[1][0]))
        np.testing.assert_allclose(outs[0][0][:n], outs[1][0][:n],
                                   rtol=0, atol=2e-4)
        np.testing.assert_array_equal(outs[0][1][:n], outs[1][1][:n])

    def test_state_survives_calls(self):
        """Feeding the capture in many small execute() calls matches one
        call (the persistent-object contract, reference symtrack.c)."""
        from liquid_dsp_tpu.framing.symtrack import Symtrack
        _, x = _qpsk_stream(1200, gain=0.4, phase=0.2, noise=0.01, seed=5)
        n_use = len(x) // 512 * 512
        st1 = Symtrack(block_len=512)
        sy1, _ = st1.execute(x[:n_use])
        st2 = Symtrack(block_len=512)
        chunks = []
        for i in range(0, n_use, 300):
            s, _ = st2.execute(x[i:i + 300])
            if len(s):
                chunks.append(s)
        sy2 = np.concatenate(chunks)
        n = min(len(sy1), len(sy2))
        np.testing.assert_allclose(sy1[:n], sy2[:n], rtol=0, atol=2e-4)
        st2.reset()
        sy3, _ = st2.execute(x[:n_use])
        np.testing.assert_allclose(sy3, sy1, rtol=0, atol=0)


class TestSources:
    def test_symstream_energy(self):
        s = symstream(1024, ms="qpsk", seed=1)
        assert s.shape == (1024,)
        assert abs(np.sqrt(np.mean(np.abs(s) ** 2)) - 1.0) < 0.1

    def test_symstream_bad_len(self):
        with pytest.raises(ValueError):
            symstream(1023)

    def test_msource_tone_location(self):
        y = msource(4096, [dict(kind="tone", fc=0.12)])
        Y = np.fft.fft(y)
        f = np.argmax(np.abs(Y)) / len(Y)
        assert abs(f - 0.12) < 0.001

    def test_msource_mix_levels(self):
        # integer-bin tone so the un-windowed FFT peak reads the gain
        y = msource(8192, [dict(kind="tone", fc=819 / 8192, gain_db=0),
                           dict(kind="noise", gain_db=-40)])
        Y = np.abs(np.fft.fft(y)) / len(y)
        pk = np.max(Y)
        assert abs(pk - 1.0) < 0.05

    def test_msource_unknown_kind(self):
        with pytest.raises(ValueError):
            msource(64, [dict(kind="chirp")])

    def test_framedatastats(self):
        st = FrameDataStats()
        st.update(True, True, 10)
        st.update(True, False, 0)
        assert st.num_frames_detected == 2
        assert st.num_payloads_valid == 1
        assert st.num_bytes_received == 10
        st.reset()
        assert st.num_frames_detected == 0


class TestStreamingSources:
    def test_symstream_chunked_equals_oneshot(self):
        """Streaming generation in arbitrary chunks == one call
        (the persistent-object contract, reference symstream.c)."""
        from liquid_dsp_tpu.framing.sources import Symstream
        a = Symstream(seed=9).generate(4096)
        st = Symstream(seed=9)
        chunks = [st.generate(n) for n in (1, 700, 63, 2048, 4096 - 1 - 700
                                           - 63 - 2048)]
        np.testing.assert_array_equal(np.concatenate(chunks), a)

    def test_msource_add_remove_runtime(self):
        from liquid_dsp_tpu.framing.sources import Msource
        q = Msource()
        t0 = q.add_tone(fc=0.1)
        assert q.num_sources == 1
        y1 = q.generate(256)
        n0 = q.add_noise(gain_db=-10)
        assert q.num_sources == 2
        q.remove(n0)
        assert q.num_sources == 1
        y2 = q.generate(256)
        # tone stays phase-continuous across the add/remove churn
        full = np.exp(2j * np.pi * 0.1 * np.arange(512))
        np.testing.assert_allclose(np.concatenate([y1, y2]), full,
                                   rtol=0, atol=1e-5)

    def test_msource_set_frequency_phase_continuous(self):
        from liquid_dsp_tpu.framing.sources import Msource
        q = Msource()
        sid = q.add_tone(fc=0.05)
        y1 = q.generate(100)
        q.set_frequency(sid, 0.2)
        y2 = q.generate(100)
        # no phase jump at the boundary: the first sample after the
        # change continues from the accumulated phase (one old-rate step)
        step = (np.angle(y2[0]) - np.angle(y1[-1])) % (2 * np.pi)
        assert abs(step - 2 * np.pi * 0.05) < 1e-4
        # and the new rate holds from then on
        dph = np.angle(y2[1:] * np.conj(y2[:-1]))
        np.testing.assert_allclose(dph, 2 * np.pi * 0.2, atol=1e-4)

    def test_msource_enable_disable_and_gain(self):
        from liquid_dsp_tpu.framing.sources import Msource
        q = Msource()
        sid = q.add_tone()
        q.set_gain(sid, -20.0)
        assert abs(q.get_gain(sid) + 20.0) < 1e-6
        y = q.generate(64)
        np.testing.assert_allclose(np.abs(y), 0.1, atol=1e-6)
        q.disable(sid)
        np.testing.assert_array_equal(q.generate(64), 0)
        q.enable(sid)
        assert np.abs(q.generate(1)[0]) > 0.09

    def test_msource_bandlimited_noise(self):
        from liquid_dsp_tpu.framing.sources import Msource
        q = Msource(seed=2)
        q.add_noise(fc=0.0, bandwidth=0.2)
        y = q.generate(1 << 15)
        Y = np.abs(np.fft.fft(y)) ** 2
        f = np.fft.fftfreq(len(y))
        inband = np.mean(Y[np.abs(f) < 0.08])
        outband = np.mean(Y[np.abs(f) > 0.2])
        assert inband / outband > 1e4   # >40 dB suppression
        # unit total power (the shaping filter is power-normalized)
        assert abs(np.mean(np.abs(y) ** 2) - 1.0) < 0.05

    def test_msource_user_source(self):
        from liquid_dsp_tpu.framing.sources import Msource
        q = Msource()
        q.add_user(lambda n: np.full(n, 0.5, np.complex64), fc=0.25)
        y = q.generate(8)
        np.testing.assert_allclose(
            y, 0.5 * np.exp(2j * np.pi * 0.25 * np.arange(8)), atol=1e-6)


class TestBPacket:
    @pytest.mark.parametrize("n,fec1", [(20, "none"), (50, "hamming128"),
                                        (111, "golay2412")])
    def test_loopback_bit_offsets(self, n, fec1):
        rng = np.random.default_rng(n)
        pl = rng.integers(0, 256, n).astype(np.uint8)
        pkt = bpacketgen(pl, "crc32", "none", fec1)
        for off in [0, 3, 11]:
            bits = np.concatenate([
                rng.integers(0, 2, off).astype(np.uint8),
                np.unpackbits(pkt),
                rng.integers(0, 2, 32).astype(np.uint8)])
            r = bpacketsync(np.packbits(bits))
            assert r.found and r.crc_ok, (n, fec1, off)
            np.testing.assert_array_equal(r.payload, pl)
            assert r.bit_offset == off

    def test_corrects_payload_errors(self):
        rng = np.random.default_rng(5)
        pl = rng.integers(0, 256, 40).astype(np.uint8)
        pkt = bpacketgen(pl, "crc32", "none", "golay2412")
        bits = np.unpackbits(pkt)
        bits[150] ^= 1
        bits[300] ^= 1
        r = bpacketsync(np.packbits(bits))
        assert r.crc_ok
        np.testing.assert_array_equal(r.payload, pl)

    def test_no_packet(self):
        rng = np.random.default_rng(6)
        r = bpacketsync(rng.integers(0, 256, 100).astype(np.uint8))
        assert not r.found


class TestCorrelators:
    def test_bsync(self):
        rng = np.random.default_rng(7)
        word = rng.integers(0, 2, 32)
        stream = np.concatenate([rng.integers(0, 2, 50), word,
                                 rng.integers(0, 2, 50)])
        rxy = bsync_correlate(stream, word)
        assert np.argmax(rxy) == 50
        assert rxy[50] == 1.0

    def test_bpresync_with_cfo(self):
        rng = np.random.default_rng(8)
        s = (rng.standard_normal(128) + 1j * rng.standard_normal(128)
             ).astype(np.complex64)
        s /= np.sqrt(np.mean(np.abs(s) ** 2))
        x = np.concatenate([np.zeros(77, np.complex64), s,
                            np.zeros(100, np.complex64)])
        t = np.arange(len(x))
        x = (x * np.exp(1j * 0.01 * t)).astype(np.complex64)
        found, idx, dphi, rxy = bpresync_detect(x, s, dphi_range=0.02,
                                                n_dphi=9)
        assert found and abs(idx - 77) <= 1
        assert abs(dphi - 0.01) < 0.005

    def test_detector_cccf(self):
        rng = np.random.default_rng(9)
        s = (rng.standard_normal(64) + 1j * rng.standard_normal(64)
             ).astype(np.complex64)
        x = np.concatenate([0.05 * (rng.standard_normal(200) +
                                    1j * rng.standard_normal(200)),
                            s, np.zeros(50)]).astype(np.complex64)
        found, idx, rxy = detector_cccf_detect(x, s)
        assert found and abs(idx - 200) <= 1
