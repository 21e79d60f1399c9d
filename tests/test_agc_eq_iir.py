"""AGC, equalizer, and IIR filter tests.

IIR golden vectors from the reference (src/filter/tests/data/iirfilt_*);
AGC convergence criteria mirror reference agc_autotest.c; equalizer tests
mirror eqlms/eqrls autotests (converge on a known channel).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from conftest import assert_close

from liquid_dsp_tpu.ops.agc import agc, rssi_from_carry
from liquid_dsp_tpu.ops.iir import (iirfilt, iirfilt_sos, iir_freqresponse,
                                    iir_group_delay)
from liquid_dsp_tpu.ops.equalize import eqlms, eqrls


GOLDEN_IIR = [
    ("iirfilt_rrrf_data_h3x64", np.float32),
    ("iirfilt_rrrf_data_h5x64", np.float32),
    ("iirfilt_rrrf_data_h7x64", np.float32),
    ("iirfilt_crcf_data_h3x64", np.complex64),
    ("iirfilt_crcf_data_h5x64", np.complex64),
    ("iirfilt_crcf_data_h7x64", np.complex64),
    ("iirfilt_cccf_data_h3x64", np.complex64),
    ("iirfilt_cccf_data_h5x64", np.complex64),
    ("iirfilt_cccf_data_h7x64", np.complex64),
]


class TestIIR:
    @pytest.mark.parametrize("stem,dtype", GOLDEN_IIR)
    def test_golden(self, golden, stem, dtype):
        d = golden(stem)
        q = iirfilt(d["b"], d["a"])
        y, _ = q(jnp.asarray(d["x"].astype(dtype)),
                 batch_shape=(), dtype=dtype)
        assert_close(np.asarray(y), d["y"], tol=1e-3, msg=stem)

    def test_streaming_matches_oneshot(self, golden):
        d = golden("iirfilt_crcf_data_h5x64")
        q = iirfilt(d["b"], d["a"])
        y_once, _ = q(jnp.asarray(d["x"]), batch_shape=())
        c = q.init(batch_shape=())
        ys = []
        for blk in d["x"].reshape(4, -1):
            yb, c = q.jitted(q.params, c, jnp.asarray(blk))
            ys.append(np.asarray(yb))
        assert_close(np.concatenate(ys), np.asarray(y_once), tol=1e-6)

    def test_sos_equals_tf(self):
        # a biquad cascade must match the expanded transfer function
        B = np.array([[0.2, 0.3, 0.1], [0.5, -0.2, 0.05]], np.float32)
        A = np.array([[1.0, -0.5, 0.2], [1.0, 0.1, -0.3]], np.float32)
        b = np.convolve(B[0], B[1])
        a = np.convolve(A[0], A[1])
        rng = np.random.default_rng(0)
        x = rng.standard_normal(256).astype(np.float32)
        y_sos, _ = iirfilt_sos(B, A)(jnp.asarray(x), batch_shape=(),
                                     dtype=jnp.float32)
        y_tf, _ = iirfilt(b, a)(jnp.asarray(x), batch_shape=(),
                                dtype=jnp.float32)
        assert_close(np.asarray(y_sos), np.asarray(y_tf), tol=1e-4)

    def test_freqresponse_dc(self):
        b = np.array([0.5, 0.5])
        a = np.array([1.0, -0.2])
        h0 = iir_freqresponse(b, a, 0.0)
        np.testing.assert_allclose(h0, np.sum(b) / np.sum(a), rtol=1e-6)

    def test_group_delay_positive(self):
        b = np.array([0.2, 0.4, 0.2])
        a = np.array([1.0, -0.4, 0.1])
        gd = iir_group_delay(b, a, 0.05)
        assert gd > 0


class TestAGC:
    @pytest.mark.parametrize("gamma", [1e-3, 1e-2, 0.1, 10.0, 100.0])
    def test_converges_to_unit_energy(self, gamma):
        # reference agc_crcf_autotest: output RMS -> 1 for any input level
        rng = np.random.default_rng(2)
        n = 4096
        x = gamma * np.exp(2j * np.pi * 0.093 * np.arange(n)
                           ).astype(np.complex64)
        q = agc(bandwidth=0.01)
        y, c = q(jnp.asarray(x), batch_shape=())
        tail = np.asarray(y)[-512:]
        rms = np.sqrt(np.mean(np.abs(tail) ** 2))
        assert abs(rms - 1.0) < 0.05, (gamma, rms)
        # rssi estimate: -20log10(g) ~ 20log10(gamma/sqrt(2))? amplitude
        rssi = float(np.asarray(rssi_from_carry(c)))
        assert abs(rssi - 20 * np.log10(gamma)) < 1.5, (gamma, rssi)

    def test_locked_holds_gain(self):
        rng = np.random.default_rng(0)
        x = (0.1 * rng.standard_normal(1024)).astype(np.float32)
        q = agc(bandwidth=0.01, locked=True)
        y, c = q(jnp.asarray(x.astype(np.complex64)), batch_shape=())
        assert float(np.asarray(c["g"])) == 1.0

    def test_batched_channels(self):
        # independent gains per channel (the DP axis)
        gains = np.array([0.1, 1.0, 10.0], np.float32)
        n = 2048
        x = (gains[:, None] *
             np.exp(2j * np.pi * 0.1 * np.arange(n))[None, :]
             ).astype(np.complex64)
        q = agc(bandwidth=0.02)
        y, c = q(jnp.asarray(x), batch_shape=(3,))
        rms = np.sqrt(np.mean(np.abs(np.asarray(y)[:, -256:]) ** 2, axis=1))
        np.testing.assert_allclose(rms, 1.0, atol=0.05)


def _channel_signal(n, h_len=5, seed=1):
    rng = np.random.default_rng(seed)
    d = np.sign(rng.standard_normal(n)) + 1j * np.sign(rng.standard_normal(n))
    d = (d / np.sqrt(2)).astype(np.complex64)
    hc = np.zeros(3, np.complex64)
    hc[0] = 1.0
    hc[1] = 0.3 - 0.2j
    hc[2] = -0.1 + 0.05j
    x = np.convolve(d, hc)[:n].astype(np.complex64)
    return x, d


class TestEqualizers:
    def test_eqlms_trained_converges(self):
        n = 2000
        x, d = _channel_signal(n)
        L = 9
        q = eqlms(h_len=L, mu=0.5)
        # train with desired = delayed symbols (delay = center tap L//2)
        delay = L // 2
        d_shift = np.concatenate([np.zeros(delay, np.complex64),
                                  d[: n - delay]])
        y, c = q((jnp.asarray(x), jnp.asarray(d_shift)), batch_shape=())
        err = np.mean(np.abs(np.asarray(y)[-500:] - d_shift[-500:]) ** 2)
        assert err < 0.02, err

    def test_eqrls_trained_converges_fast(self):
        n = 400
        x, d = _channel_signal(n, seed=3)
        L = 9
        delay = L // 2
        d_shift = np.concatenate([np.zeros(delay, np.complex64),
                                  d[: n - delay]])
        q = eqrls(h_len=L, lam=0.99, delta=0.1)
        y, c = q((jnp.asarray(x), jnp.asarray(d_shift)), batch_shape=())
        err = np.mean(np.abs(np.asarray(y)[-100:] - d_shift[-100:]) ** 2)
        assert err < 0.01, err

    def test_eqlms_decision_directed_qpsk(self):
        # blind adaptation on QPSK after trained warmup
        n = 3000
        x, d = _channel_signal(n, seed=5)
        L = 9
        delay = L // 2
        d_shift = np.concatenate([np.zeros(delay, np.complex64),
                                  d[: n - delay]])
        q = eqlms(h_len=L, mu=0.2)
        c = q.init(batch_shape=())
        # warmup trained on first half
        _, c = q.apply(q.params, c, (jnp.asarray(x[: n // 2]),
                                     jnp.asarray(d_shift[: n // 2])))
        qpsk_slicer = lambda y: (jnp.sign(y.real) +
                                 1j * jnp.sign(y.imag)) / np.sqrt(2)
        from liquid_dsp_tpu.ops.equalize import eqlms_run
        y2, c = eqlms_run(None, 0.2, c, jnp.asarray(x[n // 2:]),
                          slicer=qpsk_slicer)
        err = np.mean(np.abs(np.asarray(y2)[-500:] -
                             d_shift[n // 2:][-500:]) ** 2)
        assert err < 0.05, err


class TestBlockIIR:
    """backend='block' (exact block state-space processing, the off-CPU
    default) must match the sequential scan to float32 rounding — output
    AND carry (the block carry is the same DF2T state vector)."""

    @pytest.mark.parametrize("ftype,order", [("butter", 3), ("butter", 7),
                                             ("ellip", 5), ("cheby2", 4)])
    def test_block_matches_scan_sos(self, ftype, order):
        from liquid_dsp_tpu.design.iirdes import iirdes_sos
        B, A = iirdes_sos(ftype, order, 0.17)
        rng = np.random.default_rng(order)
        x = (rng.standard_normal((2, 1000)) +
             1j * rng.standard_normal((2, 1000))).astype(np.complex64)
        q1 = iirfilt_sos(B, A, backend="scan")
        q2 = iirfilt_sos(B, A, backend="block")
        y1, c1 = q1(jnp.asarray(x), batch_shape=(2,))
        y2, c2 = q2(jnp.asarray(x), batch_shape=(2,))
        assert_close(np.asarray(y2), np.asarray(y1), tol=1e-4)
        assert_close(np.asarray(c2), np.asarray(c1), tol=1e-4)

    def test_block_matches_scan_tf(self):
        b = np.array([0.2, 0.3, 0.1, 0.05])
        a = np.array([1.0, -0.5, 0.2, -0.04])
        rng = np.random.default_rng(3)
        # T=100 < block_size exercises the remainder-only path
        for T in (100, 1000):
            x = rng.standard_normal(T).astype(np.float32)
            y1, c1 = iirfilt(b, a, backend="scan")(
                jnp.asarray(x), batch_shape=(), dtype=jnp.float32)
            y2, c2 = iirfilt(b, a, backend="block")(
                jnp.asarray(x), batch_shape=(), dtype=jnp.float32)
            assert_close(np.asarray(y2), np.asarray(y1), tol=1e-5)
            assert_close(np.asarray(c2), np.asarray(c1), tol=1e-5)

    def test_block_streaming_odd_splits(self):
        from liquid_dsp_tpu.design.iirdes import iirdes_sos
        B, A = iirdes_sos("butter", 5, 0.2)
        q = iirfilt_sos(B, A, backend="block")
        rng = np.random.default_rng(7)
        x = rng.standard_normal(1000).astype(np.float32)
        y_once, _ = q(jnp.asarray(x), batch_shape=(), dtype=jnp.float32)
        c = q.init(batch_shape=(), dtype=jnp.float32)
        ys = []
        for blk in np.split(x, [130, 390, 517]):   # none a multiple of L
            yb, c = q.apply(q.params, c, jnp.asarray(blk))
            ys.append(np.asarray(yb))
        assert_close(np.concatenate(ys), np.asarray(y_once), tol=1e-5)

    def test_unstable_falls_back_to_scan(self):
        # pole outside the unit circle: A^L overflows, resolver must
        # keep the sequential scan
        q = iirfilt([1.0], [1.0, -1.5], backend="block")
        assert "b" in q.params          # scan params, not block mats

    def test_carry_cross_backend(self):
        # a carry saved under one backend restores under the other
        from liquid_dsp_tpu.design.iirdes import iirdes_sos
        B, A = iirdes_sos("butter", 4, 0.1)
        rng = np.random.default_rng(11)
        x1 = rng.standard_normal(300).astype(np.float32)
        x2 = rng.standard_normal(300).astype(np.float32)
        qs = iirfilt_sos(B, A, backend="scan")
        qb = iirfilt_sos(B, A, backend="block")
        _, c = qs.apply(qs.params, qs.init(batch_shape=(),
                                           dtype=jnp.float32),
                        jnp.asarray(x1))
        y_b, _ = qb.apply(qb.params, c, jnp.asarray(x2))
        y_s, _ = qs.apply(qs.params, c, jnp.asarray(x2))
        assert_close(np.asarray(y_b), np.asarray(y_s), tol=1e-5)


class TestPScan:
    @pytest.mark.parametrize("order", [3, 5, 7])
    def test_pscan_matches_scan(self, order):
        from liquid_dsp_tpu.design.iirdes import iirdes_sos
        B, A = iirdes_sos("butter", order, 0.2)
        rng = np.random.default_rng(order)
        x = (rng.standard_normal((2, 256)) +
             1j * rng.standard_normal((2, 256))).astype(np.complex64)
        q1 = iirfilt_sos(B, A, backend="scan")
        q2 = iirfilt_sos(B, A, backend="pscan")
        y1, c1 = q1(jnp.asarray(x), batch_shape=(2,))
        y2, c2 = q2(jnp.asarray(x), batch_shape=(2,))
        assert_close(np.asarray(y2), np.asarray(y1), tol=1e-3)
        assert_close(np.asarray(c2), np.asarray(c1), tol=1e-3)

    def test_pscan_streaming(self):
        from liquid_dsp_tpu.design.iirdes import iirdes_sos
        B, A = iirdes_sos("ellip", 5, 0.15)
        rng = np.random.default_rng(9)
        x = (rng.standard_normal(512)).astype(np.float32)
        q = iirfilt_sos(B, A, backend="pscan")
        y_once, _ = q(jnp.asarray(x), batch_shape=(), dtype=jnp.float32)
        c = q.init(batch_shape=(), dtype=jnp.float32)
        ys = []
        for blk in x.reshape(4, -1):
            yb, c = q.jitted(q.params, c, jnp.asarray(blk))
            ys.append(np.asarray(yb))
        assert_close(np.concatenate(ys), np.asarray(y_once), tol=1e-4)


class TestAGCGolden:
    def test_matches_reference_exactly(self, golden):
        # sample-level agreement with the compiled reference's
        # agc_crcf_execute trace (tests/golden/agc_golden.npz)
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/agc_golden.npz"
        if not path.exists():
            pytest.skip("agc_golden.npz not generated")
        d = dict(np.load(path))
        q = agc(bandwidth=0.01)
        y, c = q(jnp.asarray(d["x"]), batch_shape=())
        np.testing.assert_allclose(np.asarray(y), d["y"], atol=2e-5)
        assert abs(float(np.asarray(c["g"])) - float(d["g"])) < 1e-4


class TestEqlmsGolden:
    """eqlms trained adaptation sample-exact vs the compiled reference
    (eqlms case in tools/gen_flexframe_golden.py): the per-sample output
    stream AND the final weights (reference get_weights returns the
    conjugate-reversed internal vector, eqlms.c)."""

    def test_sample_exact(self):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        g = dict(np.load(path))
        from liquid_dsp_tpu.ops.equalize import (eqlms_run,
                                                 eqlms_init_weights)
        L = 13
        carry = {"w": jnp.asarray(eqlms_init_weights(L), jnp.complex64),
                 "buf": jnp.zeros(L, jnp.complex64),
                 "x2_sum": jnp.float32(0), "n": jnp.int32(0)}
        y, c2 = eqlms_run(None, 0.3, carry, jnp.asarray(g["eqlms_x"]),
                          d=jnp.asarray(g["eqlms_d"]))
        assert np.abs(np.asarray(y) - g["eqlms_y"]).max() < 1e-5
        w_fir = np.conj(np.asarray(c2["w"])[::-1])
        assert np.abs(w_fir - g["eqlms_w"]).max() < 1e-5
