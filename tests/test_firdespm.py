"""Parks-McClellan design tests (reference firdespm_autotest.c style:
spec conformance) with scipy.signal.remez cross-validation."""
import numpy as np
import pytest

from liquid_dsp_tpu.design.firdespm import firdespm, firdespm_lowpass


def mag(h, f):
    z = np.exp(-2j * np.pi * np.asarray(f))
    return np.abs(sum(hk * z ** k for k, hk in enumerate(h)))


F = np.linspace(0, 0.5, 600)


class TestFirdespm:
    @pytest.mark.parametrize("h_len", [31, 57, 56, 90])
    def test_matches_scipy_lowpass(self, h_len):
        scipy_signal = pytest.importorskip("scipy.signal")
        h = firdespm(h_len, [(0.0, 0.2), (0.25, 0.5)], [1.0, 0.0])
        hs = scipy_signal.remez(h_len, [0, 0.2, 0.25, 0.5], [1.0, 0.0],
                                fs=1.0)
        np.testing.assert_allclose(mag(h, F), mag(hs, F), atol=2e-3)

    def test_equiripple_property(self):
        h = firdespm(57, [(0.0, 0.2), (0.25, 0.5)], [1.0, 0.0])
        H = mag(h, F)
        pb = H[F <= 0.195]
        sb = H[F >= 0.255]
        # passband ripple symmetric about 1, stopband bounded by ripple
        d_pass = max(pb.max() - 1.0, 1.0 - pb.min())
        assert abs(d_pass - sb.max()) < 2e-3  # equal ripple (unit weights)

    def test_weighted_stopband(self):
        h = firdespm(71, [(0.0, 0.2), (0.25, 0.5)], [1.0, 0.0],
                     [1.0, 10.0])
        H = mag(h, F)
        d_pass = max(abs(H[F <= 0.195] - 1.0).max(), 0)
        d_stop = H[F >= 0.255].max()
        assert d_pass / d_stop == pytest.approx(10.0, rel=0.2)

    def test_bandpass(self):
        h = firdespm(71, [(0.0, 0.1), (0.15, 0.3), (0.36, 0.5)],
                     [0.0, 1.0, 0.0], [5.0, 1.0, 5.0])
        H = mag(h, F)
        assert H[(F > 0.16) & (F < 0.29)].min() > 0.99
        assert H[F < 0.09].max() < 10 ** (-50 / 20)
        assert H[F > 0.37].max() < 10 ** (-50 / 20)

    def test_lowpass_helper(self):
        h = firdespm_lowpass(61, 0.15, 60.0)
        H = mag(h, F)
        assert abs(H[0] - 1.0) < 0.02
        assert H[F > 0.25].max() < 10 ** (-45 / 20)

    def test_validation(self):
        with pytest.raises(ValueError):
            firdespm(31, [(0.0, 0.6)], [1.0])
        with pytest.raises(ValueError):
            firdespm(31, [(0.0, 0.2)], [1.0, 0.0])
        with pytest.raises(ValueError):
            firdespm(2, [(0.0, 0.2)], [1.0])
