"""Channelizer tests: sample-exact golden comparison against the
reference implementation (tests/golden/channelizer_golden.npz), the
reference's own autotest criteria (firpfbch2 loopback reconstruction,
firpfbch analyzer == mix+filter+decimate equivalence), streaming
consistency, and batched channels."""
import numpy as np
import pytest
import jax.numpy as jnp

from liquid_dsp_tpu.multichannel.channelizer import (
    firpfbch_analyzer, firpfbch_synthesizer, firpfbch_kaiser_taps,
    firpfbch2_analyzer, firpfbch2_synthesizer)

CASES = [(8, 4), (16, 5), (64, 3)]


@pytest.fixture(scope="module")
def cg():
    import pathlib
    path = pathlib.Path(__file__).parent / "golden/channelizer_golden.npz"
    if not path.exists():
        pytest.skip("channelizer_golden.npz not generated")
    return dict(np.load(path))


class TestGolden:
    @pytest.mark.parametrize("M,m", CASES)
    def test_firpfbch2_analyzer(self, cg, M, m):
        x = cg[f"x_{M}_{m}"]
        Yref = cg[f"Y2_{M}_{m}"].reshape(-1, M)
        Y, _ = firpfbch2_analyzer(M, m, 60.0)(jnp.asarray(x),
                                              batch_shape=())
        np.testing.assert_allclose(np.asarray(Y).T, Yref, atol=2e-4)

    @pytest.mark.parametrize("M,m", CASES)
    def test_firpfbch2_synthesizer(self, cg, M, m):
        Yref = cg[f"Y2_{M}_{m}"].reshape(-1, M)
        yref = cg[f"y2_{M}_{m}"]
        y, _ = firpfbch2_synthesizer(M, m, 60.0)(
            jnp.asarray(Yref.T.copy()), batch_shape=())
        np.testing.assert_allclose(np.asarray(y), yref, atol=2e-4)

    @pytest.mark.parametrize("M,m", CASES)
    def test_firpfbch_analyzer(self, cg, M, m):
        x = cg[f"x_{M}_{m}"]
        Zref = cg[f"Z1_{M}_{m}"].reshape(-1, M)
        Z, _ = firpfbch_analyzer(M, m, 60.0)(jnp.asarray(x),
                                             batch_shape=())
        np.testing.assert_allclose(np.asarray(Z).T, Zref, atol=2e-4)

    @pytest.mark.parametrize("M,m", CASES)
    def test_firpfbch_synthesizer(self, cg, M, m):
        Zref = cg[f"Z1_{M}_{m}"].reshape(-1, M)
        zref = cg[f"z1_{M}_{m}"]
        z, _ = firpfbch_synthesizer(M, m, 60.0)(
            jnp.asarray(Zref.T.copy()), batch_shape=())
        np.testing.assert_allclose(np.asarray(z), zref, atol=2e-4)


class TestProperties:
    @pytest.mark.parametrize("M,m", [(8, 5), (16, 5), (64, 5)])
    def test_firpfbch2_reconstruction(self, M, m):
        # reference firpfbch2_crcf_autotest: loopback reconstructs the
        # input within 1e-3 after delay 2*M*m - M/2 + 1
        rng = np.random.default_rng(1)
        n = 64 * M
        x = (rng.standard_normal(n) / np.sqrt(2) +
             1j * rng.standard_normal(n) / np.sqrt(2)
             ).astype(np.complex64) * 0.5
        Y, _ = firpfbch2_analyzer(M, m, 60.0)(jnp.asarray(x),
                                              batch_shape=())
        y, _ = firpfbch2_synthesizer(M, m, 60.0)(Y, batch_shape=())
        y = np.asarray(y)
        delay = 2 * M * m - M // 2 + 1
        err = np.abs(y[delay:] - x[: n - delay]).max()
        assert err < 2e-3, err

    def test_firpfbch_analyzer_equivalence(self):
        # reference firpfbch_crcf_analyzer_autotest: channel c output ==
        # mix down by c/M, filter with prototype, decimate by M
        M, m = 8, 4
        h = firpfbch_kaiser_taps(M, m, 60.0)
        rng = np.random.default_rng(2)
        n = 48 * M
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
        Y, _ = firpfbch_analyzer(M, m, 60.0)(jnp.asarray(x),
                                             batch_shape=())
        Y = np.asarray(Y)
        t = np.arange(n)
        for c in [0, 1, 5]:
            z = x * np.exp(-2j * np.pi * c * t / M)
            w = np.convolve(z, h[: 2 * m * M])[:n]
            direct = w[M - 1:: M]
            ratio = Y[c, 8:40] / direct[8:40]
            # equivalent up to a constant per-channel unit phase
            assert np.abs(np.abs(ratio) - 1.0).max() < 1e-3
            assert np.std(np.angle(ratio * np.conj(ratio[0]))) < 1e-3

    def test_tone_channel_mapping(self):
        M, m = 16, 4
        qa = firpfbch2_analyzer(M, m, 60.0)
        n = 32 * M
        for c in [0, 3, 9, 15]:
            x = np.exp(2j * np.pi * (c / M) * np.arange(n)
                       ).astype(np.complex64)
            Y, _ = qa(jnp.asarray(x), batch_shape=())
            power = np.mean(np.abs(np.asarray(Y)[:, 16:]) ** 2, axis=1)
            assert int(np.argmax(power)) == c

    def test_streaming_matches_oneshot(self):
        M, m = 8, 4
        qa = firpfbch2_analyzer(M, m, 60.0)
        rng = np.random.default_rng(3)
        n = 16 * M
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
        Y_once, _ = qa(jnp.asarray(x), batch_shape=())
        c = qa.init(batch_shape=())
        outs = []
        for blk in x.reshape(4, -1):
            Yb, c = qa.jitted(qa.params, c, jnp.asarray(blk))
            outs.append(np.asarray(Yb))
        np.testing.assert_allclose(np.concatenate(outs, axis=-1),
                                   np.asarray(Y_once), atol=1e-5)

    def test_batched_channels(self):
        M, m = 8, 3
        qa = firpfbch_analyzer(M, m, 60.0)
        rng = np.random.default_rng(4)
        x = (rng.standard_normal((3, 16 * M)) +
             1j * rng.standard_normal((3, 16 * M))).astype(np.complex64)
        Yb, _ = qa(jnp.asarray(x), batch_shape=(3,))
        for i in range(3):
            Yi, _ = qa(jnp.asarray(x[i]), batch_shape=())
            np.testing.assert_allclose(np.asarray(Yb)[i], np.asarray(Yi),
                                       atol=1e-5)

    def test_bad_block_length(self):
        qa = firpfbch_analyzer(8, 4)
        with pytest.raises(ValueError):
            qa(jnp.zeros(100, jnp.complex64), batch_shape=())


class TestStreamingVsOneshot:
    """Every channelizer is stateful; streaming over blocks must equal
    the one-shot run (CLAUDE.md testing rule) — this is exactly the
    class of test that catches a wrong carry slice or hop lag."""

    @staticmethod
    def _stream_eq(proc, x_one, blocks, batch_shape=()):
        y_one, _ = proc.apply(proc.params, proc.init(batch_shape=batch_shape),
                              jnp.asarray(x_one))
        carry = proc.init(batch_shape=batch_shape)
        outs = []
        for b in blocks:
            y, carry = proc.apply(proc.params, carry, jnp.asarray(b))
            outs.append(np.asarray(y))
        y_s = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(y_s, np.asarray(y_one), atol=1e-5)

    def test_pfbch_analyzer(self):
        rng = np.random.default_rng(0)
        M = 8
        x = (rng.standard_normal(M * 24) +
             1j * rng.standard_normal(M * 24)).astype(np.complex64)
        self._stream_eq(firpfbch_analyzer(M), x,
                        [x[:M * 10], x[M * 10:]])

    def test_pfbch_analyzer_p1(self):
        # single-tap-per-branch bank (len(h) == M -> p = 1): the carry
        # is EMPTY and must stay empty across blocks (regression for
        # the `[-0:]`-returns-everything slice bug)
        rng = np.random.default_rng(1)
        M = 8
        h = np.hanning(M).astype(np.float32) + 0.1
        proc = firpfbch_analyzer(M, h=h)
        c0 = proc.init()
        assert c0.shape == (0, M)
        x = (rng.standard_normal(M * 12) +
             1j * rng.standard_normal(M * 12)).astype(np.complex64)
        y, c1 = proc.apply(proc.params, c0, jnp.asarray(x[:M * 5]))
        assert np.asarray(c1).shape == (0, M)
        self._stream_eq(proc, x, [x[:M * 5], x[M * 5:]])

    def test_pfbch_synthesizer(self):
        rng = np.random.default_rng(2)
        M, L = 8, 24
        X = (rng.standard_normal((M, L)) +
             1j * rng.standard_normal((M, L))).astype(np.complex64)
        self._stream_eq(firpfbch_synthesizer(M), X,
                        [X[:, :10], X[:, 10:]])

    def test_pfbch_synthesizer_p1(self):
        rng = np.random.default_rng(3)
        M, L = 8, 12
        h = np.hanning(M).astype(np.float32) + 0.1
        proc = firpfbch_synthesizer(M, h=h)
        X = (rng.standard_normal((M, L)) +
             1j * rng.standard_normal((M, L))).astype(np.complex64)
        self._stream_eq(proc, X, [X[:, :5], X[:, 5:]])

    def test_pfbch2_analyzer(self):
        rng = np.random.default_rng(4)
        M = 16
        x = (rng.standard_normal(M * 20) +
             1j * rng.standard_normal(M * 20)).astype(np.complex64)
        self._stream_eq(firpfbch2_analyzer(M), x,
                        [x[:M * 7], x[M * 7:]])

    def test_pfbch2_synthesizer(self):
        rng = np.random.default_rng(5)
        M, nf = 16, 28
        X = (rng.standard_normal((M, nf)) +
             1j * rng.standard_normal((M, nf))).astype(np.complex64)
        self._stream_eq(firpfbch2_synthesizer(M), X,
                        [X[:, :12], X[:, 12:]])

    def test_batched_streaming(self):
        rng = np.random.default_rng(6)
        M = 8
        x = (rng.standard_normal((3, M * 16)) +
             1j * rng.standard_normal((3, M * 16))).astype(np.complex64)
        self._stream_eq(firpfbch2_analyzer(M), x,
                        [x[:, :M * 9], x[:, M * 9:]], batch_shape=(3,))


class TestLargeMFallback:
    """M > _FUSED_MAX_M uses the einsum + batched-(I)FFT formulation
    (the dense fused DFT factor grows O(M^2)); force the fallback on a
    small M and require equality with the fused path."""

    def test_fallback_matches_fused(self, monkeypatch):
        from liquid_dsp_tpu.multichannel import channelizer as ch
        rng = np.random.default_rng(7)
        M = 16
        x = (rng.standard_normal(M * 20) +
             1j * rng.standard_normal(M * 20)).astype(np.complex64)
        X = (rng.standard_normal((M, 20)) +
             1j * rng.standard_normal((M, 20))).astype(np.complex64)
        fused = {
            "a1": ch.firpfbch_analyzer(M),
            "s1": ch.firpfbch_synthesizer(M),
            "a2": ch.firpfbch2_analyzer(M),
            "s2": ch.firpfbch2_synthesizer(M),
        }
        monkeypatch.setattr(ch, "_FUSED_MAX_M", 4)
        slow = {
            "a1": ch.firpfbch_analyzer(M),
            "s1": ch.firpfbch_synthesizer(M),
            "a2": ch.firpfbch2_analyzer(M),
            "s2": ch.firpfbch2_synthesizer(M),
        }
        for key, inp in (("a1", x), ("s1", X), ("a2", x), ("s2", X)):
            f, g = fused[key], slow[key]
            assert f.planar_apply is not None and g.planar_apply is None
            yf, _ = f.apply(f.params, f.init(), jnp.asarray(inp))
            yg, _ = g.apply(g.params, g.init(), jnp.asarray(inp))
            np.testing.assert_allclose(np.asarray(yf), np.asarray(yg),
                                       atol=2e-5, err_msg=key)
