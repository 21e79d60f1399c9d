"""Framing tests: framegen64 sample-exact vs the reference golden,
framesync64 loopback under channel impairments (reference
src/framing/tests/framesync64_autotest.c style), qpacketmodem and
qpilot round trips, qdetector estimates."""
import numpy as np
import jax.numpy as jnp
import pytest

from liquid_dsp_tpu.framing import (
    framegen64, framesync64, FRAME64_LEN, frame64_preamble,
    qpacketmodem_encode, qpacketmodem_decode, qpacketmodem_frame_len,
    qpilotgen, qpilotsync, qpilot_frame_len,
    qdetector_detect, make_template,
)
from liquid_dsp_tpu.utils.sequence import MSequence, msequence_bits


@pytest.fixture(scope="module")
def fg64():
    import pathlib
    path = pathlib.Path(__file__).parent / "golden/frame64_golden.npz"
    if not path.exists():
        pytest.skip("frame64_golden.npz not generated")
    return dict(np.load(path))


def _channel(x, gain=1.0, cfo=0.0, phase=0.0, snr_db=None, pad=150, seed=2):
    r = np.concatenate([np.zeros(pad, np.complex64), x,
                        np.zeros(200, np.complex64)])
    t = np.arange(len(r))
    r = r * gain * np.exp(1j * (cfo * t + phase))
    if snr_db is not None:
        rng = np.random.default_rng(seed)
        sigma = gain * 10 ** (-snr_db / 20) / np.sqrt(2)
        r = r + sigma * (rng.standard_normal(len(r)) +
                         1j * rng.standard_normal(len(r)))
    return r.astype(np.complex64)


class TestMSequence:
    def test_default_periods(self):
        for m in [2, 3, 5, 7]:
            bits = msequence_bits(m)
            n = (1 << m) - 1
            assert len(bits) == n
            # balance property: 2^(m-1) ones
            assert bits.sum() == 1 << (m - 1)

    def test_liquid_create_semantics(self):
        # msequence(7, 0x0089, 1) must match the reference stream
        ms = MSequence(7, 0x0089, 1)
        bits = "".join(str(ms.advance()) for _ in range(32))
        assert bits == "10010011010011110111000011111110"


class TestQPacketModem:
    def test_frame64_config_length(self):
        # reference framegen64.c asserts frame_len == 600
        assert qpacketmodem_frame_len(72, "crc24", "none", "golay2412",
                                      "qpsk") == 600

    @pytest.mark.parametrize("ms,fec", [("qpsk", "golay2412"),
                                        ("qam16", "hamming128"),
                                        ("psk8", "none")])
    def test_roundtrip(self, ms, fec):
        rng = np.random.default_rng(1)
        msg = rng.integers(0, 256, 50).astype(np.uint8)
        syms = qpacketmodem_encode(msg, "crc32", "none", fec, ms)
        out, ok = qpacketmodem_decode(np.asarray(syms), 50, "crc32",
                                      "none", fec, ms)
        assert ok
        np.testing.assert_array_equal(out, msg)

    def test_noisy_roundtrip(self):
        rng = np.random.default_rng(2)
        msg = rng.integers(0, 256, 72).astype(np.uint8)
        syms = np.asarray(qpacketmodem_encode(msg, "crc24", "none",
                                              "golay2412", "qpsk"))
        syms = syms + 0.1 * (rng.standard_normal(len(syms)) +
                             1j * rng.standard_normal(len(syms)))
        out, ok = qpacketmodem_decode(syms, 72, "crc24", "none",
                                      "golay2412", "qpsk")
        assert ok
        np.testing.assert_array_equal(out, msg)


class TestQPilot:
    def test_frame_len(self):
        # reference framegen64.c asserts 600 -> 630 with spacing 21
        assert qpilot_frame_len(600, 21) == 630

    def test_sync_recovers_offsets(self):
        rng = np.random.default_rng(3)
        payload = np.exp(1j * rng.uniform(0, 2 * np.pi, 600)
                         ).astype(np.complex64)
        frame = qpilotgen(payload, 21)
        dphi, phi, g = 0.002, 0.7, 0.6
        t = np.arange(len(frame))
        rx = g * frame * np.exp(1j * (dphi * t + phi))
        out, dphi_hat, phi_hat, g_hat = qpilotsync(rx, 600, 21)
        assert abs(dphi_hat - dphi) < 1e-4
        assert abs(phi_hat - phi) < 0.05
        assert abs(g_hat - g) < 0.05
        err = np.mean(np.abs(out - payload) ** 2)
        assert err < 1e-3


class TestQDetector:
    def test_detects_template_with_offsets(self):
        rng = np.random.default_rng(4)
        s = (rng.standard_normal(150) + 1j * rng.standard_normal(150)
             ).astype(np.complex64)
        s /= np.sqrt(np.mean(np.abs(s) ** 2))
        x = np.concatenate([np.zeros(333, np.complex64), s,
                            np.zeros(400, np.complex64)])
        t = np.arange(len(x))
        x = 0.7 * x * np.exp(1j * (0.005 * t + 1.1))
        x += 0.02 * (rng.standard_normal(len(x)) +
                     1j * rng.standard_normal(len(x)))
        det = qdetector_detect(x, s, threshold=0.4)
        assert det.detected
        assert abs(det.sample_index - 333) <= 1
        assert abs(det.dphi_hat - 0.005) < 5e-4
        assert abs(det.gamma_hat - 0.7) < 0.1

    def test_no_false_alarm_on_noise(self):
        rng = np.random.default_rng(5)
        s = (rng.standard_normal(150) + 1j * rng.standard_normal(150)
             ).astype(np.complex64)
        x = 0.3 * (rng.standard_normal(2000) +
                   1j * rng.standard_normal(2000)).astype(np.complex64)
        det = qdetector_detect(x, s, threshold=0.5)
        assert not det.detected


class TestFrame64:
    def test_tx_matches_reference_golden(self, fg64):
        frame = framegen64(fg64["header"], fg64["payload"])
        assert frame.shape == (FRAME64_LEN,)
        np.testing.assert_allclose(frame, fg64["frame"], atol=2e-5)

    def test_decodes_reference_frame(self, fg64):
        # true interop: recover a frame transmitted by the reference C code
        x = np.concatenate([np.zeros(100, np.complex64), fg64["frame"],
                            np.zeros(100, np.complex64)])
        r = framesync64(x)
        assert r.detected and r.crc_ok
        np.testing.assert_array_equal(r.header, fg64["header"])
        np.testing.assert_array_equal(r.payload, fg64["payload"])

    @pytest.mark.parametrize("kw", [
        dict(),
        dict(cfo=0.01),
        dict(phase=2.0),
        dict(gain=0.1),
        dict(snr_db=15),
        dict(gain=0.2, cfo=-0.008, phase=1.0, snr_db=15),
    ])
    def test_loopback_channel(self, kw):
        rng = np.random.default_rng(6)
        header = rng.integers(0, 256, 8).astype(np.uint8)
        payload = rng.integers(0, 256, 64).astype(np.uint8)
        frame = framegen64(header, payload)
        r = framesync64(_channel(frame, **kw))
        assert r.detected and r.crc_ok
        np.testing.assert_array_equal(r.header, header)
        np.testing.assert_array_equal(r.payload, payload)

    def test_fractional_delay(self):
        rng = np.random.default_rng(7)
        header = rng.integers(0, 256, 8).astype(np.uint8)
        payload = rng.integers(0, 256, 64).astype(np.uint8)
        frame = framegen64(header, payload)
        x = np.concatenate([np.zeros(150, np.complex64), frame,
                            np.zeros(220, np.complex64)])
        X = np.fft.fft(x)
        f = np.fft.fftfreq(len(x))
        for frac in [0.25, 0.5, -0.3]:
            x2 = np.fft.ifft(X * np.exp(-2j * np.pi * f * frac)
                             ).astype(np.complex64)
            r = framesync64(x2)
            assert r.detected and r.crc_ok, frac
            np.testing.assert_array_equal(r.payload, payload)

    def test_detection_rate_low_snr(self):
        # reference framesync64_autotest style: high detection rate at
        # moderate SNR
        rng = np.random.default_rng(8)
        header = rng.integers(0, 256, 8).astype(np.uint8)
        payload = rng.integers(0, 256, 64).astype(np.uint8)
        frame = framegen64(header, payload)
        n_ok = 0
        trials = 10
        for i in range(trials):
            r = framesync64(_channel(frame, snr_db=10, seed=100 + i))
            n_ok += int(r.detected and r.crc_ok and
                        np.array_equal(r.payload, payload))
        assert n_ok >= 9, n_ok


class TestQPacketSoft:
    """qpacketmodem_decode_soft (reference qpacketmodem.c:297): exact
    max-log LLRs through the soft packetizer beat hard decisions."""

    def test_soft_beats_hard(self):
        from liquid_dsp_tpu.framing.qpacket import (
            qpacketmodem_encode, qpacketmodem_decode,
            qpacketmodem_decode_soft)
        rng = np.random.default_rng(3)
        n = 50
        payload = rng.integers(0, 256, n).astype(np.uint8)
        sym = np.asarray(qpacketmodem_encode(payload, "crc32", "none",
                                             "hamming74", "qpsk"))
        soft_ok = hard_ok = 0
        for _ in range(20):
            noisy = sym + 0.38 * (rng.standard_normal(len(sym)) +
                                  1j * rng.standard_normal(len(sym)))
            _, oks = qpacketmodem_decode_soft(noisy, n, "crc32", "none",
                                              "hamming74", "qpsk")
            _, okh = qpacketmodem_decode(noisy, n, "crc32", "none",
                                         "hamming74", "qpsk")
            soft_ok += int(oks)
            hard_ok += int(okh)
        assert soft_ok > hard_ok

    def test_noiseless(self):
        from liquid_dsp_tpu.framing.qpacket import (
            qpacketmodem_encode, qpacketmodem_decode_soft)
        rng = np.random.default_rng(5)
        payload = rng.integers(0, 256, 33).astype(np.uint8)
        sym = np.asarray(qpacketmodem_encode(payload, "crc16", "v27",
                                             "none", "qam16"))
        dec, ok = qpacketmodem_decode_soft(sym, 33, "crc16", "v27",
                                           "none", "qam16")
        assert ok and np.array_equal(dec, payload)


class TestDetectionRate:
    """Statistical detection-rate test in the reference framing-autotest
    style: N noisy trials at moderate SNR, require a high success rate
    (reference src/framing/tests/ detection-rate pattern)."""

    def test_frame64_detection_rate(self):
        from liquid_dsp_tpu.framing import framegen64, framesync64
        rng = np.random.default_rng(9)
        n_trials, ok = 20, 0
        for t in range(n_trials):
            hdr = rng.integers(0, 256, 8).astype(np.uint8)
            pay = rng.integers(0, 256, 64).astype(np.uint8)
            y = framegen64(hdr, pay)
            x = np.concatenate([np.zeros(100, np.complex64), 0.5 * y,
                                np.zeros(100, np.complex64)])
            # ~17 dB SNR with random phase
            x = x * np.exp(1j * rng.uniform(0, 2 * np.pi))
            x += 0.07 * (rng.standard_normal(len(x)) +
                         1j * rng.standard_normal(len(x)))
            r = framesync64(x)
            if r.detected and r.crc_ok and np.array_equal(r.payload, pay):
                ok += 1
        assert ok >= 18, f"detection rate {ok}/{n_trials}"


class TestComplementaryCodes:
    """reference bsequence_create_ccodes (bsequence.c:284) + the
    complementary property its autotest asserts."""

    def test_seeds_match_reference(self):
        from liquid_dsp_tpu.utils.sequence import bsequence_create_ccodes
        a, b = bsequence_create_ccodes(8)
        assert np.array_equal(np.packbits(a), [0xB8])
        assert np.array_equal(np.packbits(b), [0xB7])

    def test_autocorrelations_cancel(self):
        from liquid_dsp_tpu.utils.sequence import bsequence_create_ccodes
        for n in (16, 64, 256):
            a, b = bsequence_create_ccodes(n)
            sa, sb = 2.0 * a - 1, 2.0 * b - 1
            s = np.correlate(sa, sa, "full") + np.correlate(sb, sb, "full")
            assert s[n - 1] == 2 * n
            assert np.abs(np.delete(s, n - 1)).max() == 0

    def test_invalid_length_raises(self):
        from liquid_dsp_tpu.utils.sequence import bsequence_create_ccodes
        import pytest
        with pytest.raises(ValueError):
            bsequence_create_ccodes(12)
