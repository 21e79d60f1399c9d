"""IIR design tests, mirroring reference iirdes_autotest.c (spec
conformance: passband/stopband levels) plus cross-validation against
scipy's independent implementations where available."""
import numpy as np
import pytest

from liquid_dsp_tpu.design.iirdes import (
    iirdes, iirdes_sos, butter_prototype, cheby1_prototype, cheby2_prototype,
    ellip_prototype, bessel_prototype,
    iirdes_pll_active_lag, iirdes_pll_active_pi,
)


def freqz(b, a, f):
    zi = np.exp(-2j * np.pi * np.atleast_1d(f))
    num = sum(bk * zi ** i for i, bk in enumerate(b))
    den = sum(ak * zi ** i for i, ak in enumerate(a))
    return num / den


def sos_freqz(B, A, f):
    h = np.ones_like(np.atleast_1d(f), complex)
    for i in range(B.shape[0]):
        h = h * freqz(B[i], A[i], f)
    return h


class TestPrototypes:
    @pytest.mark.parametrize("n", [2, 3, 5, 7])
    def test_butter_poles_unit_circle(self, n):
        _, p, _ = butter_prototype(n)
        assert len(p) == n
        np.testing.assert_allclose(np.abs(p), 1.0, atol=1e-6)
        assert np.all(p.real < 0)

    @pytest.mark.parametrize("n", [2, 3, 5])
    def test_cheby1_poles_stable(self, n):
        _, p, _ = cheby1_prototype(n, 1.0)
        assert np.all(p.real < 0)

    @pytest.mark.parametrize("n", [2, 4, 5])
    def test_cheby2_zeros_imaginary(self, n):
        z, p, _ = cheby2_prototype(n, 60.0)
        assert np.all(np.abs(z.real) < 1e-9)
        assert np.all(p.real < 0)

    @pytest.mark.parametrize("n", [3, 4, 5])
    def test_ellip_stable(self, n):
        z, p, _ = ellip_prototype(n, 1.0, 60.0)
        assert np.all(p.real < 0)
        assert np.all(np.abs(z.real) < 1e-9)

    @pytest.mark.parametrize("n", [2, 4])
    def test_bessel_stable(self, n):
        _, p, _ = bessel_prototype(n)
        assert np.all(p.real < 0)


SPEC_CASES = [
    # (ftype, n, fc, Ap, As)
    ("butter", 5, 0.2, 1.0, 60.0),
    ("cheby1", 5, 0.15, 1.0, 60.0),
    ("cheby2", 5, 0.3, 1.0, 60.0),
    ("ellip", 5, 0.2, 1.0, 60.0),
    ("bessel", 5, 0.2, 1.0, 60.0),
]


class TestLowpassSpec:
    @pytest.mark.parametrize("ftype,n,fc,ap,as_", SPEC_CASES)
    def test_tf_passband_stopband(self, ftype, n, fc, ap, as_):
        b, a = iirdes(ftype, n, fc, ap_db=ap, as_db=as_)
        # DC gain ~ 0 dB (within ripple)
        h0 = abs(freqz(b, a, 0.0)[0])
        assert 10 ** (-(ap + 0.1) / 20) <= h0 <= 1.01, (ftype, h0)
        # deep stopband (well above cutoff)
        f_stop = 0.45
        hs = abs(freqz(b, a, f_stop)[0])
        floor_db = {"butter": -40, "cheby1": -50, "cheby2": -55,
                    "ellip": -55, "bessel": -15}[ftype]
        assert 20 * np.log10(hs + 1e-12) < floor_db, (ftype, hs)

    @pytest.mark.parametrize("ftype,n,fc,ap,as_", SPEC_CASES)
    def test_sos_matches_tf(self, ftype, n, fc, ap, as_):
        b, a = iirdes(ftype, n, fc, ap_db=ap, as_db=as_)
        B, A = iirdes_sos(ftype, n, fc, ap_db=ap, as_db=as_)
        f = np.linspace(0, 0.49, 64)
        h_tf = freqz(b, a, f)
        h_sos = sos_freqz(B, A, f)
        np.testing.assert_allclose(np.abs(h_sos), np.abs(h_tf),
                                   rtol=1e-3, atol=1e-6)

    @pytest.mark.parametrize("ftype,n,fc,ap,as_", SPEC_CASES)
    def test_stable(self, ftype, n, fc, ap, as_):
        b, a = iirdes(ftype, n, fc, ap_db=ap, as_db=as_)
        # a ascending in z^-1 == descending in z, so np.roots(a) = poles
        roots = np.roots(a)
        assert np.all(np.abs(roots) < 1.0), (ftype, np.abs(roots).max())


class TestScipyCross:
    scipy = pytest.importorskip("scipy.signal")

    @pytest.mark.parametrize("n,fc", [(3, 0.1), (5, 0.2), (7, 0.3)])
    def test_butter_matches_scipy(self, n, fc):
        from scipy.signal import butter as sp_butter
        b, a = iirdes("butter", n, fc)
        bs, as_ = sp_butter(n, 2 * fc)
        f = np.linspace(0, 0.49, 128)
        np.testing.assert_allclose(np.abs(freqz(b, a, f)),
                                   np.abs(freqz(bs, as_, f)), atol=2e-4)

    @pytest.mark.parametrize("n", [4, 5])
    def test_ellip_matches_scipy(self, n):
        from scipy.signal import ellip as sp_ellip
        ap, as_db, fc = 1.0, 60.0, 0.2
        b, a = iirdes("ellip", n, fc, ap_db=ap, as_db=as_db)
        bs, az = sp_ellip(n, ap, as_db, 2 * fc)
        f = np.linspace(0, 0.49, 128)
        np.testing.assert_allclose(np.abs(freqz(b, a, f)),
                                   np.abs(freqz(bs, az, f)), atol=5e-3)

    def test_cheby1_matches_scipy(self):
        from scipy.signal import cheby1 as sp_c1
        b, a = iirdes("cheby1", 5, 0.15, ap_db=1.0)
        bs, az = sp_c1(5, 1.0, 0.3)
        f = np.linspace(0, 0.49, 128)
        np.testing.assert_allclose(np.abs(freqz(b, a, f)),
                                   np.abs(freqz(bs, az, f)), atol=2e-3)

    def test_cheby2_matches_scipy(self):
        from scipy.signal import cheby2 as sp_c2
        # scipy cheby2 cutoff is the STOPBAND edge; ours (like the
        # reference) pre-warps fc as the -As point too
        b, a = iirdes("cheby2", 5, 0.25, as_db=60.0)
        bs, az = sp_c2(5, 60.0, 0.5)
        f = np.linspace(0, 0.49, 128)
        np.testing.assert_allclose(np.abs(freqz(b, a, f)),
                                   np.abs(freqz(bs, az, f)), atol=5e-3)


class TestBandTransforms:
    def test_highpass(self):
        b, a = iirdes("butter", 5, 0.2, btype="highpass")
        assert abs(freqz(b, a, 0.0)[0]) < 1e-4
        assert abs(abs(freqz(b, a, 0.5)[0]) - 1.0) < 1e-3

    def test_bandpass(self):
        b, a = iirdes("butter", 3, 0.35, f0=0.25, btype="bandpass")
        assert abs(abs(freqz(b, a, 0.25)[0]) - 1.0) < 0.01
        assert abs(freqz(b, a, 0.02)[0]) < 0.01
        assert abs(freqz(b, a, 0.48)[0]) < 0.01

    def test_bandstop(self):
        b, a = iirdes("butter", 3, 0.35, f0=0.25, btype="bandstop")
        assert abs(freqz(b, a, 0.25)[0]) < 0.01
        assert abs(abs(freqz(b, a, 0.0)[0]) - 1.0) < 0.01


class TestPLL:
    def test_active_lag_shapes(self):
        b, a = iirdes_pll_active_lag(0.01, 0.707, 1000.0)
        assert b.shape == (3,) and a.shape == (3,)

    def test_active_pi_integrator(self):
        b, a = iirdes_pll_active_pi(0.01, 0.707, 1000.0)
        # PI has a pole at z=1 (perfect integrator): a(1) == 0
        assert abs(np.sum(a)) < 1e-9

    def test_invalid_params(self):
        with pytest.raises(ValueError):
            iirdes_pll_active_lag(-1.0, 0.7, 100.0)


class TestErrors:
    def test_bad_fc(self):
        with pytest.raises(ValueError):
            iirdes("butter", 5, 0.7)

    def test_bad_type(self):
        with pytest.raises(ValueError):
            iirdes("gauss", 5, 0.2)


class TestDesignGolden:
    """Design layer vs the compiled reference (cases in tools/
    gen_flexframe_golden.py).  SOS gain packing is a free choice, so
    iirdes comparisons multiply the sections out to the cascade
    transfer function."""

    @pytest.fixture(scope="class")
    def fg(self):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        return dict(np.load(path))

    @staticmethod
    def _cascade(B, A):
        nb = np.poly1d([1.0])
        na = np.poly1d([1.0])
        for b3, a3 in zip(B, A):
            nb = nb * np.poly1d(b3)
            na = na * np.poly1d(a3)
        return nb.coeffs, na.coeffs

    @pytest.mark.parametrize("name,args,kw,tol", [
        ("butter5", ("butter", 5, 0.2), {"as_db": 60.0}, 1e-5),
        ("ellip5", ("ellip", 5, 0.2), {"ap_db": 1.0, "as_db": 60.0}, 5e-3),
        ("cheby24", ("cheby2", 4, 0.15), {"as_db": 50.0}, 1e-3)])
    def test_iirdes_cascade(self, fg, name, args, kw, tol):
        B, A = iirdes_sos(*args, **kw)
        nb, na = self._cascade(np.asarray(B), np.asarray(A))
        Br = np.real(fg[f"iirdes_{name}_B"]).reshape(-1, 3)
        Ar = np.real(fg[f"iirdes_{name}_A"]).reshape(-1, 3)
        nbr, nar = self._cascade(Br, Ar)
        assert np.abs(nb - nbr).max() < tol
        assert np.abs(na - nar).max() < tol

    def test_firdespm_exact(self, fg):
        from liquid_dsp_tpu.design.firdespm import firdespm
        h = firdespm(51, [0.0, 0.2, 0.25, 0.5], [1.0, 0.0], [1.0, 1.0])
        assert np.abs(h - np.real(fg["firdespm_h"])).max() < 1e-4

    def test_rrc_prototype_exact(self, fg):
        from liquid_dsp_tpu.design.firdes import firdes_prototype
        hp = firdes_prototype("rrcos", 2, 7, 0.3)
        assert np.abs(hp - np.real(fg["proto_rrc_h"])).max() < 1e-5

    def test_hm3_prototype_close(self, fg):
        # both sides run an iterated Remez heuristic; taps agree to ~3e-3
        from liquid_dsp_tpu.design.firdes import firdes_prototype
        hp = firdes_prototype("hm3", 2, 7, 0.3)
        assert np.abs(hp - np.real(fg["proto_hm3_h"])).max() < 1e-2
