"""Resampler tests, mirroring the reference autotest criteria:
resamp_crcf_autotest.c (windowed-sinusoid spectral test: carrier moves to
f/r, images/distortion below stopband) and resamp2/msresamp tests.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from conftest import assert_close

from liquid_dsp_tpu.ops.resample import (
    resamp, resamp2_decim, resamp2_interp, resamp2_analyzer,
    resamp2_synthesizer, msresamp, as_rational, halfband_taps)


def spectral_peak_and_sidelobe(y, main_lobe_width=0.07):
    """FFT of y; returns (fpeak, peak_dB, max_sidelobe_dB relative)."""
    n = len(y)
    nfft = 1 << int(np.ceil(np.log2(n)))
    Y = np.fft.fftshift(np.fft.fft(y, nfft))
    f = np.arange(nfft) / nfft - 0.5
    mag = np.abs(Y)
    ipk = np.argmax(mag)
    fpeak = f[ipk]
    mag_db = 20 * np.log10(mag / mag[ipk] + 1e-12)
    side = mag_db[np.abs(f - fpeak) > main_lobe_width]
    return fpeak, np.max(side)


def windowed_tone(n, fx, beta=10.0):
    from liquid_dsp_tpu.design.windows import kaiser
    w = kaiser(n, beta)
    return (np.exp(2j * np.pi * fx * np.arange(n)) * w).astype(np.complex64)


def run_proc(proc, x):
    y, _ = proc(jnp.asarray(x), batch_shape=())
    return np.asarray(y)


class TestResamp:
    def test_rational_rate_output_len(self):
        q = resamp((3, 2), m=7)
        x = np.zeros(400, np.complex64)
        y = run_proc(q, x)
        assert y.shape == (600,)

    @pytest.mark.parametrize("num,den", [(3, 2), (2, 3), (7, 5), (127, 100)])
    def test_tone_spectral_purity(self, num, den):
        # reference resamp_crcf_autotest.c criteria: peak at fx/r,
        # sidelobes < -As + margin
        r = num / den
        fx = 0.05
        n = 60 * den  # multiple of den
        x = windowed_tone(n, fx)
        q = resamp((num, den), m=13, fc=0.45, as_db=60.0)
        y = run_proc(q, x)
        assert len(y) == n * num // den
        fpeak, side = spectral_peak_and_sidelobe(np.asarray(y))
        assert abs(fpeak - fx / r) < 0.01, (fpeak, fx / r)
        assert side < -50.0, side

    def test_block_equals_oneshot(self):
        # streaming in 4 blocks == one shot (carry correctness)
        num, den = 7, 5
        n = 40 * den
        rng = np.random.default_rng(3)
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
        q = resamp((num, den), m=9)
        y_once = run_proc(q, x)
        c = q.init(batch_shape=())
        ys = []
        for blk in x.reshape(4, -1):
            yb, c = q.apply(q.params, c, jnp.asarray(blk))
            ys.append(np.asarray(yb))
        assert_close(np.concatenate(ys), y_once, tol=1e-5,
                     msg="blocked vs one-shot resamp")

    def test_unity_rate_identity_delay(self):
        # rate 1 on an in-band tone: output == delayed input (branch-0 path)
        n = 256
        x = windowed_tone(n, 0.1)
        q = resamp((1, 1), m=9, fc=0.45, as_db=80.0)
        y = run_proc(q, x)
        # group delay ~ m + 1 samples; correlate to find best lag
        lags = range(5, 15)
        errs = [np.mean(np.abs(y[lag:n] - x[: n - lag]) ** 2) / np.mean(np.abs(x) ** 2)
                for lag in lags]
        assert min(errs) < 1e-3, min(errs)

    def test_as_rational(self):
        assert as_rational(0.5) == (1, 2)
        assert as_rational((3, 6)) == (1, 2)
        num, den = as_rational(1.27115323)
        assert abs(num / den - 1.27115323) < 1e-4


class TestResamp2:
    def test_interp_then_decim_recovers(self):
        # reference resamp2_crcf_autotest: interp 1:2 then decim 2:1
        # recovers the signal up to delay
        n = 512
        fx = 0.087
        x = windowed_tone(n, fx)
        m = 7
        qi = resamp2_interp(m=m, as_db=60.0)
        qd = resamp2_decim(m=m, as_db=60.0)
        y = run_proc(qi, x)
        assert y.shape == (2 * n,)
        # reference decimator has DC gain 2 (resamp2_crcf_decim_execute
        # sums delay + filter branches without halving) and its branch
        # parity gives the loopback a half-sample offset at the input
        # rate — decimate at both alignments and keep the better one
        best = np.inf
        for off in (0, 1):
            z = 0.5 * np.asarray(run_proc(qd, np.roll(y, -off)))
            best = min(best,
                       min(np.mean(np.abs(z[d:] - x[: n - d]) ** 2)
                           for d in range(1, 4 * m)))
        assert best / np.mean(np.abs(x) ** 2) < 1e-3

    def test_decim_tone(self):
        # tone below 0.25 passes through decimator at 2x frequency
        n = 1024
        fx = 0.1
        x = windowed_tone(n, fx)
        y = run_proc(resamp2_decim(m=9, as_db=70.0), x)
        fpeak, side = spectral_peak_and_sidelobe(np.asarray(y))
        assert abs(fpeak - 2 * fx) < 0.01
        assert side < -55

    def test_analyzer_two_tones(self):
        # mirrors reference resamp2_crcf_autotest.c:29-72: lowband tone f0
        # and highband tone pi+f1 separate cleanly; outputs carry the
        # half-sample phase offset exp(j*2*f*(i+0.5)).
        m = 5
        n = 37
        f0, f1 = 0.0739, -0.1387
        tol = 1e-3
        N = 2 * n
        i_in = np.arange(N)
        x = (np.exp(1j * f0 * i_in) + np.exp(1j * (np.pi + f1) * i_in)
             ).astype(np.complex64)
        qa = resamp2_analyzer(m=m, as_db=60.0)
        bands = run_proc(qa, x)
        y0, y1 = np.asarray(bands)
        i = np.arange(m, n - m)
        assert_close(y0[i + m], np.exp(2j * f0 * (i + 0.5)), tol=tol,
                     msg="lowband")
        assert_close(y1[i + m], np.exp(2j * f1 * (i + 0.5)), tol=tol,
                     msg="highband")

    def test_analyzer_synthesizer_loopback_tones(self):
        # band-limited loopback: reconstruction delayed by 4m-1 samples.
        # The odd total delay means the highband (pi-modulated) component
        # comes back sign-inverted — intrinsic to the reference pair's
        # delay structure (resamp2_crcf_autotest.c delays: analysis m,
        # synthesis 2m, each with a half-sample interpolation).
        n = 512
        m = 9
        i = np.arange(n)
        d = 4 * m - 1
        qa = resamp2_analyzer(m=m, as_db=70.0)
        qs = resamp2_synthesizer(m=m, as_db=70.0)
        for f, band_sign in [(0.04, 1.0), (0.5 - 0.06, -1.0)]:
            x = np.exp(2j * np.pi * f * i).astype(np.complex64)
            bands = run_proc(qa, x)
            assert bands.shape == (2, n // 2)
            y = run_proc(qs, jnp.asarray(bands))
            assert y.shape == (n,)
            ks = np.arange(d + 4 * m, n - 4 * m)
            err = (np.mean(np.abs(y[ks] - band_sign * x[ks - d]) ** 2)
                   / np.mean(np.abs(x) ** 2))
            assert err < 1e-3, (f, err)

    def test_halfband_taps_structure(self):
        h = halfband_taps(5, 0.0, 60.0)
        # even taps (excluding center) are ~zero: sinc(t/2) at even t
        n = len(h)
        c = (n - 1) // 2
        for i in range(0, n, 2):
            if i != c:
                assert abs(h[i]) < 1e-6


class TestMsresamp:
    @pytest.mark.parametrize("rate", [0.5, 0.25, (1, 3), 2.0, 4.0, (8, 3)])
    def test_rate_and_tone(self, rate):
        num, den = as_rational(rate)
        r = num / den
        fx = 0.02
        n = 48 * den * (4 if r < 1 else 1)
        x = windowed_tone(n, fx)
        q = msresamp(rate, as_db=60.0)
        y = run_proc(q, x)
        assert len(y) == n * num // den
        fpeak, side = spectral_peak_and_sidelobe(
            np.asarray(y), main_lobe_width=0.07 / min(r, 1.0))
        assert abs(fpeak - fx / r) < 0.02, (fpeak, fx / r)
        assert side < -40, side


class TestResampGolden:
    """resamp sample-exact vs the compiled reference (resamp cases in
    tools/gen_flexframe_golden.py): decimating 2/3 and interpolating
    5/4, default prototype (m=7, fc=0.25, As=60, npfb=64)."""

    @pytest.mark.parametrize("name,num,den", [("resamp_23", 2, 3),
                                              ("resamp_54", 5, 4)])
    def test_sample_exact(self, name, num, den):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        g = dict(np.load(path))
        x, yref = g[f"{name}_x"], g[f"{name}_y"]
        p = resamp((num, den), m=7, fc=0.25, as_db=60.0, npfb=64)
        y, _ = p(jnp.asarray(x), batch_shape=())
        y = np.asarray(y)
        assert len(y) == len(yref)
        assert np.abs(y - yref).max() < 1e-5


class TestResamp2Golden:
    """resamp2 decim/interp sample-exact vs the compiled reference
    (r2 cases in tools/gen_flexframe_golden.py)."""

    @pytest.fixture(scope="class")
    def fg(self):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        return dict(np.load(path))

    def test_decim(self, fg):
        pd = resamp2_decim(7, 0.0, 60.0)
        yd, _ = pd(jnp.asarray(fg["r2_x"]), batch_shape=())
        assert np.abs(np.asarray(yd) - fg["r2_decim"]).max() < 1e-5

    def test_interp(self, fg):
        pi = resamp2_interp(7, 0.0, 60.0)
        yi, _ = pi(jnp.asarray(fg["r2_x"]), batch_shape=())
        assert np.abs(np.asarray(yi) - fg["r2_interp"]).max() < 1e-5


class TestQMFGolden:
    """resamp2 QMF analyzer/synthesizer sample-exact vs the compiled
    reference (qmf cases in tools/gen_flexframe_golden.py)."""

    @pytest.fixture(scope="class")
    def fg(self):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        return dict(np.load(path))

    def test_analyzer(self, fg):
        qa = resamp2_analyzer(5, 60.0)
        Y, _ = qa(jnp.asarray(fg["qmf_x"]), batch_shape=())
        Y = np.asarray(Y)
        assert np.abs(Y[0] - fg["qmf_lo"]).max() < 1e-5
        assert np.abs(Y[1] - fg["qmf_hi"]).max() < 1e-5

    def test_synthesizer(self, fg):
        qs = resamp2_synthesizer(5, 60.0)
        Z, _ = qs(jnp.asarray(np.stack([fg["qmf_lo"], fg["qmf_hi"]])),
                  batch_shape=())
        assert np.abs(np.asarray(Z) - fg["qmf_z"]).max() < 1e-5


class TestMsresamp2Golden:
    """msresamp2 2-stage cascades sample-exact vs the compiled reference
    (ms2 cases in tools/gen_flexframe_golden.py): reference per-stage
    filter design (fc halves per stage, Kaiser length estimate) and
    zeta gain compensation."""

    @pytest.fixture(scope="class")
    def fg(self):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        return dict(np.load(path))

    def test_decim_cascade(self, fg):
        from liquid_dsp_tpu.ops.resample import msresamp2
        qd = msresamp2("decim", 2, 0.4, 0.0, 60.0)
        yd, _ = qd(jnp.asarray(fg["ms2_x"]), batch_shape=())
        assert np.abs(np.asarray(yd) - fg["ms2_d"]).max() < 1e-5

    def test_interp_cascade(self, fg):
        from liquid_dsp_tpu.ops.resample import msresamp2
        qi = msresamp2("interp", 2, 0.4, 0.0, 60.0)
        yi, _ = qi(jnp.asarray(fg["ms2_x"]), batch_shape=())
        assert np.abs(np.asarray(yi) - fg["ms2_i"]).max() < 1e-5


class TestResampBandedBackend:
    """The banded rectangular matmul (accelerator path, VERDICT r3 #4)
    must match the conv formulation sample-exactly across rates, dtypes,
    and block boundaries — on CPU both backends are forced explicitly."""

    @pytest.mark.parametrize("num,den", [(3, 2), (5, 4), (2, 3), (7, 5),
                                         (1, 2), (4, 1), (13, 8)])
    def test_matmul_equals_conv(self, num, den):
        import jax
        rng = np.random.default_rng(num * 16 + den)
        T = den * 192
        x = (rng.standard_normal((3, T)) +
             1j * rng.standard_normal((3, T))).astype(np.complex64)
        pc = resamp((num, den), backend="conv")
        pm = resamp((num, den), backend="matmul")
        cc, cm = pc.init(batch_shape=(3,)), pm.init(batch_shape=(3,))
        for _ in range(2):                  # carry across blocks
            yc, cc = jax.jit(pc.apply)(pc.params, cc, jnp.asarray(x))
            ym, cm = jax.jit(pm.apply)(pm.params, cm, jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(ym), np.asarray(yc),
                                       atol=2e-5)

    @pytest.mark.parametrize("name,num,den", [("resamp_23", 2, 3),
                                              ("resamp_54", 5, 4)])
    def test_matmul_golden(self, name, num, den):
        # the banded backend straight against the reference golden
        # (same vectors as TestResampGolden)
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        g = dict(np.load(path))
        x, yref = g[f"{name}_x"], g[f"{name}_y"]
        p = resamp((num, den), m=7, fc=0.25, as_db=60.0, npfb=64,
                   backend="matmul")
        y, _ = p(jnp.asarray(x), batch_shape=())
        assert np.abs(np.asarray(y) - yref).max() < 1e-5
