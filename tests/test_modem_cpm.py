"""Continuous-phase and analog modem tests, mirroring the reference's
loopback autotests (src/modem/tests/: fskmodem_autotest.c,
gmskmodem_autotest.c, cpfskmodem_autotest.c, freqmodem_autotest.c,
ampmodem_autotest.c)."""
import numpy as np
import jax.numpy as jnp
import pytest

from liquid_dsp_tpu.modem import (
    fsk_modulator, fsk_demodulator, gmsk_modulator, gmsk_demodulator,
    cpfsk_modulator, cpfsk_demodulator,
    freq_modulator, freq_demodulator, amp_modulator, amp_demodulator,
)


def run(proc, x):
    y, _ = proc(jnp.asarray(x), batch_shape=())
    return np.asarray(y)


class TestFSK:
    @pytest.mark.parametrize("m,k", [(1, 2), (2, 4), (3, 8), (4, 16)])
    def test_loopback(self, m, k):
        M = 1 << m
        rng = np.random.default_rng(m)
        syms = rng.integers(0, M, 256)
        bw = 0.45 if m > 2 else 0.25
        mod = fsk_modulator(m, k, bw)
        dem = fsk_demodulator(m, k, bw)
        y = run(mod, syms)
        assert y.shape == (256 * k,)
        assert np.allclose(np.abs(y), 1.0, atol=1e-5)  # constant envelope
        s_hat = run(dem, y)
        assert np.array_equal(s_hat, syms)

    def test_loopback_noisy(self):
        m, k = 2, 16
        M = 1 << m
        rng = np.random.default_rng(9)
        syms = rng.integers(0, M, 1024)
        mod = fsk_modulator(m, k, 0.25)
        dem = fsk_demodulator(m, k, 0.25)
        y = run(mod, syms)
        y = y + 0.2 * (rng.standard_normal(len(y)) +
                       1j * rng.standard_normal(len(y)))
        s_hat = run(dem, y)
        assert np.mean(s_hat != syms) < 0.01

    def test_phase_continuity_across_blocks(self):
        m, k = 1, 4
        mod = fsk_modulator(m, k, 0.25)
        syms = np.array([0, 1, 1, 0, 1, 0, 0, 1])
        y_once = run(mod, syms)
        c = mod.init(batch_shape=())
        ys = []
        for blk in syms.reshape(2, -1):
            yb, c = mod.apply(mod.params, c, jnp.asarray(blk))
            ys.append(np.asarray(yb))
        np.testing.assert_allclose(np.concatenate(ys), y_once, atol=1e-5)


class TestGMSK:
    def test_loopback(self):
        k, m, bt = 2, 3, 0.3
        rng = np.random.default_rng(1)
        bits = rng.integers(0, 2, 512)
        mod = gmsk_modulator(k, m, bt)
        dem = gmsk_demodulator(k, m, bt)
        y = run(mod, bits)
        assert y.shape == (512 * k,)
        assert np.allclose(np.abs(y), 1.0, atol=1e-5)
        b_hat = run(dem, y)
        # matched filter delay: 2m symbols; compare shifted
        d = 2 * m
        n_ok = np.mean(b_hat[d:] == bits[: len(bits) - d])
        assert n_ok > 0.995, n_ok

    @pytest.mark.parametrize("k", [2, 4])
    def test_loopback_k(self, k):
        rng = np.random.default_rng(2)
        bits = rng.integers(0, 2, 256)
        y = run(gmsk_modulator(k, 3, 0.35), bits)
        b_hat = run(gmsk_demodulator(k, 3, 0.35), y)
        d = 6
        assert np.mean(b_hat[d:] == bits[: len(bits) - d]) > 0.99


class TestCPFSK:
    @pytest.mark.parametrize("kind", ["square", "rcos_full", "rcos_partial",
                                      "gmsk"])
    def test_loopback_binary(self, kind):
        bps, h, k = 1, 0.5, 8
        rng = np.random.default_rng(3)
        syms = rng.integers(0, 2, 256)
        mod = cpfsk_modulator(bps, h, k, kind=kind)
        dem = cpfsk_demodulator(bps, h, k, kind=kind)
        y = run(mod, syms)
        assert np.allclose(np.abs(y), 1.0, atol=1e-5)
        s_hat = run(dem, y)
        # find best alignment (pulse delay differs per type)
        best = 0.0
        for d in range(0, 8):
            acc = np.mean(s_hat[d:] == syms[: len(syms) - d])
            best = max(best, acc)
        assert best > 0.98, (kind, best)

    def test_loopback_4ary(self):
        bps, h, k = 2, 0.25, 8
        rng = np.random.default_rng(4)
        syms = rng.integers(0, 4, 256)
        y = run(cpfsk_modulator(bps, h, k, kind="square"), syms)
        s_hat = run(cpfsk_demodulator(bps, h, k, kind="square"), y)
        best = max(np.mean(s_hat[d:] == syms[: len(syms) - d])
                   for d in range(0, 8))
        assert best > 0.98, best


class TestAnalog:
    def test_fm_loopback(self):
        kf = 0.1
        t = np.arange(4096)
        msg = (0.5 * np.cos(2 * np.pi * 0.013 * t) +
               0.3 * np.cos(2 * np.pi * 0.003 * t)).astype(np.float32)
        mod = freq_modulator(kf)
        dem = freq_demodulator(kf)
        y = run(mod, msg)
        assert np.allclose(np.abs(y), 1.0, atol=1e-5)
        m_hat = run(dem, y)
        # first sample has no previous reference; the modulator's 10-bit
        # sincos LUT (reference freqmod.c) bounds loopback accuracy at
        # ~1/(1024*kf) RMS
        err = np.sqrt(np.mean((m_hat[1:] - msg[1:]) ** 2))
        assert err < 2.0 / (1024 * kf), err

    def test_am_dsb_envelope_loopback(self):
        t = np.arange(2048)
        msg = (0.7 * np.cos(2 * np.pi * 0.01 * t)).astype(np.float32)
        mod = amp_modulator(kind="dsb", suppressed_carrier=False)
        dem = amp_demodulator(kind="dsb", suppressed_carrier=False)
        y = run(mod, msg)
        m_hat = run(dem, y)
        err = np.sqrt(np.mean((m_hat - msg) ** 2))
        assert err < 1e-3, err

    def test_am_dsb_suppressed_loopback(self):
        t = np.arange(2048)
        msg = np.cos(2 * np.pi * 0.01 * t).astype(np.float32)
        y = run(amp_modulator(kind="dsb", suppressed_carrier=True), msg)
        m_hat = run(amp_demodulator(kind="dsb", suppressed_carrier=True), y)
        assert np.sqrt(np.mean((m_hat - msg) ** 2)) < 1e-4

    @pytest.mark.parametrize("kind,sign", [("usb", 1), ("lsb", -1)])
    def test_am_ssb_spectrum(self, kind, sign):
        # SSB: energy concentrated on one side of the carrier
        t = np.arange(4096)
        msg = np.cos(2 * np.pi * 0.05 * t).astype(np.float32)
        y = run(amp_modulator(kind=kind, suppressed_carrier=True), msg)
        Y = np.fft.fftshift(np.fft.fft(y))
        f = np.arange(len(Y)) / len(Y) - 0.5
        upper = np.sum(np.abs(Y[f > 0.01]) ** 2)
        lower = np.sum(np.abs(Y[f < -0.01]) ** 2)
        ratio = (upper / lower) if sign > 0 else (lower / upper)
        assert ratio > 100.0, ratio

    def test_am_ssb_loopback(self):
        t = np.arange(2048)
        msg = np.cos(2 * np.pi * 0.02 * t).astype(np.float32)
        y = run(amp_modulator(kind="usb", suppressed_carrier=True), msg)
        m_hat = run(amp_demodulator(kind="usb", suppressed_carrier=True), y)
        # hilbert delay: the reference's split form delays the i-branch
        # by 2m = 18 samples (firhilb m=9, ampmodem.c:95)
        d = 18
        err = np.sqrt(np.mean((m_hat[d:] - msg[: len(msg) - d]) ** 2) /
                      np.mean(msg ** 2))
        assert err < 0.02, err


class TestFSKGolden:
    """fsk/cpfsk modulators sample-exact vs the compiled reference
    (cases in tools/gen_flexframe_golden.py)."""

    @pytest.fixture(scope="class")
    def fg(self):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        return dict(np.load(path))

    def test_fskmod_sample_exact(self, fg):
        syms = np.real(fg["fsk_syms"]).astype(np.int32)
        fm = fsk_modulator(2, 16, bandwidth=0.25)
        y, _ = fm(jnp.asarray(syms), batch_shape=())
        assert np.abs(np.asarray(y) - fg["fsk_y"]).max() < 1e-4

    def test_cpfskmod_sample_exact(self, fg):
        syms = np.real(fg["cpfsk_syms"]).astype(np.int32)
        cm = cpfsk_modulator(1, 0.5, 8, 3, beta=0.25, kind="square")
        y, _ = cm(jnp.asarray(syms), batch_shape=())
        assert np.abs(np.asarray(y) - fg["cpfsk_y"]).max() < 1e-4


class TestAmpModemGolden:
    """ampmodem sample-exact vs the compiled reference at fc=0 (amp
    cases in tools/gen_flexframe_golden.py): DSB, USB suppressed, LSB."""

    @pytest.mark.parametrize("kind,sup", [("dsb", False), ("usb", True),
                                          ("lsb", False)])
    def test_sample_exact(self, kind, sup):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        g = dict(np.load(path))
        x = np.real(g["amp_x"]).astype(np.float32)
        am = amp_modulator(0.1, kind=kind, suppressed_carrier=sup)
        y, _ = am(jnp.asarray(x), batch_shape=())
        assert np.abs(np.asarray(y) - g[f"amp_{kind}"]).max() < 1e-5
