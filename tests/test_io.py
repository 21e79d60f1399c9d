"""SDR IQ format conversion: native C path vs numpy fallback, round
trips, file IO, and streaming blocks."""
import numpy as np
import pytest

from liquid_dsp_tpu import io as lio
from liquid_dsp_tpu import native


class TestConversions:
    @pytest.mark.parametrize("fmt", lio.IQ_FORMATS)
    def test_round_trip(self, fmt):
        rng = np.random.default_rng(1)
        x = (rng.uniform(-0.9, 0.9, 500) +
             1j * rng.uniform(-0.9, 0.9, 500)).astype(np.complex64)
        raw = lio.complex_to_iq(x, fmt)
        y = lio.iq_to_complex(raw, fmt)
        tol = {"cu8": 1e-2, "cs8": 1e-2, "cs16": 1e-4, "cf32": 0.0}[fmt]
        assert np.abs(y - x).max() <= tol

    @pytest.mark.parametrize("fmt", lio.IQ_FORMATS)
    def test_native_matches_numpy(self, fmt):
        if native.lib is None:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(2)
        raw = lio.complex_to_iq(
            (rng.uniform(-1, 1, 256) + 1j * rng.uniform(-1, 1, 256)
             ).astype(np.complex64), fmt)
        re_n, im_n = lio.iq_to_planes(raw, fmt)
        re_p, im_p = lio._np_to_planes(
            np.frombuffer(raw.tobytes(), lio._DTYPES[fmt]), fmt)
        np.testing.assert_allclose(re_n, re_p, atol=1e-6)
        np.testing.assert_allclose(im_n, im_p, atol=1e-6)

    def test_known_values_cu8(self):
        raw = np.asarray([0, 255, 128, 127], np.uint8)
        x = lio.iq_to_complex(raw.tobytes(), "cu8")
        np.testing.assert_allclose(x[0], -1.0 + 1.0j, atol=1e-6)
        np.testing.assert_allclose(
            x[1], (0.5 / 127.5) * (1 - 1j), atol=1e-6)

    def test_errors(self):
        with pytest.raises(ValueError):
            lio.iq_to_planes(b"\x00\x01\x02", "cu8")  # odd count
        with pytest.raises(ValueError):
            lio.iq_to_planes(b"\x00\x01", "cu9")


class TestFiles:
    def test_read_write_stream(self, tmp_path):
        rng = np.random.default_rng(3)
        x = (rng.uniform(-0.9, 0.9, 10_000) +
             1j * rng.uniform(-0.9, 0.9, 10_000)).astype(np.complex64)
        f = tmp_path / "cap.cs16"
        lio.write_iq(f, x, "cs16")
        y = lio.read_iq(f, "cs16")
        assert np.abs(y - x).max() < 1e-4
        y2 = lio.read_iq(f, "cs16", count=100, offset=50)
        np.testing.assert_allclose(y2, y[50:150], atol=1e-7)
        blocks = list(lio.iq_stream(f, "cs16", block=4096))
        assert len(blocks) == 3
        assert all(len(b) == 4096 for b in blocks)
        np.testing.assert_allclose(
            np.concatenate(blocks)[:10_000], y, atol=1e-7)
        assert np.all(np.concatenate(blocks)[10_000:] == 0)
        blocks = list(lio.iq_stream(f, "cs16", block=4096, pad_last=False))
        assert len(blocks) == 2
