"""FFT conformance vs reference golden vectors
(reference: src/fft/tests/fft_runtest.c — composite/prime/pow2/r2r sizes)."""
import numpy as np
import pytest
import jax.numpy as jnp

from conftest import assert_close
from liquid_dsp_tpu.ops.fft import fft, ifft, dct, dst, r2r

# All sizes present in the reference data directory: pow2, composite, prime.
SIZES = [2, 3, 4, 5, 6, 7, 8, 9, 10, 16, 17, 20, 21, 22, 24, 26, 30, 32,
         35, 36, 43, 48, 63, 64, 79, 92, 96, 120, 130, 157, 192, 317, 509]


@pytest.mark.parametrize("n", SIZES)
def test_fft_forward_golden(golden, n):
    d = golden(f"fft_data_{n}")
    x = jnp.asarray(d[f"fft_test_x{n}"])
    y = fft(x)
    tol = 2e-3 * np.sqrt(n)  # accumulated f32 roundoff grows ~sqrt(n)
    assert_close(y, d[f"fft_test_y{n}"], tol=tol, msg=f"fft {n}")


@pytest.mark.parametrize("n", SIZES)
def test_fft_roundtrip(golden, n):
    d = golden(f"fft_data_{n}")
    x = jnp.asarray(d[f"fft_test_x{n}"])
    xr = ifft(fft(x), normalize=True)
    assert_close(xr, np.asarray(x), tol=1e-4 * np.sqrt(n), msg=f"roundtrip {n}")


@pytest.mark.parametrize("n", [8, 27, 32])
@pytest.mark.parametrize("kind", ["REDFT00", "REDFT10", "REDFT01", "REDFT11",
                                  "RODFT00", "RODFT10", "RODFT01", "RODFT11"])
def test_r2r_golden(golden, n, kind):
    d = np.load(f"tests/golden/fft_r2rdata_{n}.npz")
    x = jnp.asarray(d[f"fftdata_r2r_x{n}"])
    y = r2r(x, kind)
    assert_close(y, d[f"fftdata_r2r_{kind}_y{n}"], tol=1e-3 * n, msg=f"{kind} {n}")


def test_fft_batched():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((4, 48)) + 1j * rng.standard_normal((4, 48))).astype(np.complex64)
    y = fft(jnp.asarray(x))
    assert_close(y, np.fft.fft(x, axis=-1), tol=1e-3, msg="batched fft 48")


# one size per method-chooser branch (ops/fft.py _fft_any): four-step
# mixed-radix (odd factor <= 2048 x 2^m), matmul DFT (odd n <= 2048),
# Rader (prime > 2048, also as the odd part of 2^k*p), Bluestein
# (remaining); forward vs numpy + unnormalized-backward round trip
@pytest.mark.parametrize("n", [96, 384, 1200, 638,     # CT
                               127, 509, 1021, 2043,   # matmul DFT
                               2053, 4099, 8191,       # Rader prime
                               4106, 16396,            # 2^k * prime
                               6138])                  # CT peel
def test_fft_method_chooser_vs_numpy(n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((3, n)) +
         1j * rng.standard_normal((3, n))).astype(np.complex64)
    y = fft(jnp.asarray(x))
    ref = np.fft.fft(x, axis=-1)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(y) - ref).max() / scale < 2e-4 * np.sqrt(n)
    xr = ifft(y, normalize=True)
    assert np.abs(np.asarray(xr) - x).max() < 1e-4 * np.sqrt(n)


class TestSpgram:
    def test_tone_psd_peak(self):
        from liquid_dsp_tpu.ops.fft import spgram, spgram_estimate
        import jax.numpy as jnp
        q = spgram(nfft=256, window="hamming", window_len=128, delay=64)
        f0 = 0.1234
        n = 8192
        x = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
        psd, c = q(jnp.asarray(x), batch_shape=())
        db = np.asarray(spgram_estimate(psd))
        freqs = np.arange(256) / 256 - 0.5
        fpk = freqs[np.argmax(db)]
        assert abs(fpk - f0) < 1.5 / 256
        # dynamic range: tone well above the floor
        assert db.max() - np.median(db) > 40

    def test_streaming_accumulates(self):
        from liquid_dsp_tpu.ops.fft import spgram
        import jax.numpy as jnp
        q = spgram(nfft=128, window_len=64, delay=32)
        rng = np.random.default_rng(0)
        c = q.init(batch_shape=())
        for _ in range(3):
            x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)
                 ).astype(np.complex64)
            psd, c = q.apply(q.params, c, jnp.asarray(x))
        # each block yields T//delay + 1 transforms (the initial
        # zero-padded window counts once, as in the reference)
        assert int(np.asarray(c["count"])) == 3 * (512 // 32 + 1)

    def test_asgram(self):
        from liquid_dsp_tpu.ops.fft import asgram_render
        line = asgram_render(np.linspace(-80, 0, 64))
        assert isinstance(line, str) and len(line) == 64

    def test_ewma_matches_sequential(self):
        # the batched closed-form EWMA fold must equal the reference's
        # per-transform recurrence psd' = (1-a)psd + a|X|^2 (spgram.c
        # accumulate path), including the count==0 seed-from-first case
        from liquid_dsp_tpu.ops.fft import spgram
        from liquid_dsp_tpu.design.windows import window as make_window
        import jax.numpy as jnp
        nfft, wlen, delay, alpha = 64, 32, 16, 0.1
        q = spgram(nfft=nfft, window_len=wlen, delay=delay, alpha=alpha)
        rng = np.random.default_rng(7)
        w = np.asarray(make_window("hamming", wlen))
        w = w / np.sqrt(np.sum(w * w))
        c = q.init(batch_shape=())
        buf = np.zeros(wlen, np.complex64)
        psd_ref, count = np.zeros(nfft), 0
        for _ in range(2):  # streaming across blocks too
            x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)
                 ).astype(np.complex64)
            psd, c = q.apply(q.params, c, jnp.asarray(x))
            buf = np.concatenate([buf, x])
            n_xf = (len(buf) - wlen) // delay + 1
            for i in range(n_xf):
                X = np.fft.fft(buf[i * delay:i * delay + wlen] * w, nfft)
                p = np.abs(X) ** 2
                psd_ref = p if count == 0 else (1 - alpha) * psd_ref + alpha * p
                count += 1
            buf = buf[n_xf * delay:][-wlen:]
            if len(buf) < wlen:  # carry keeps a full left-zero-padded window
                buf = np.concatenate([np.zeros(wlen - len(buf),
                                               np.complex64), buf])
        assert int(np.asarray(c["count"])) == count
        np.testing.assert_allclose(np.asarray(psd), psd_ref, rtol=2e-3,
                                   atol=1e-4)

    def test_large_block_single_fft_batch(self):
        # T=256k in one block: must trace as ONE gather + ONE batched FFT
        # (the old impl statically unrolled ~thousands of FFT slices)
        from liquid_dsp_tpu.ops.fft import spgram
        import jax
        import jax.numpy as jnp
        q = spgram(nfft=256, window_len=128, delay=64)
        x = jnp.zeros(1 << 18, jnp.complex64)
        jaxpr = jax.make_jaxpr(
            lambda c, xx: q.apply(q.params, c, xx))(q.init(), x)

        def count_ffts(jx):
            n = 0
            for e in jx.eqns:
                if e.primitive.name == "fft":
                    n += 1
                for v in e.params.values():  # recurse into pjit bodies
                    if hasattr(v, "jaxpr"):
                        n += count_ffts(v.jaxpr)
            return n

        n_ffts = count_ffts(jaxpr.jaxpr)
        assert n_ffts == 1, n_ffts


class TestSpgramGolden:
    """spgram one-shot PSD vs the compiled reference (spgram case in
    tools/gen_flexframe_golden.py)."""

    def test_psd_oneshot(self):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        g = dict(np.load(path))
        from liquid_dsp_tpu.ops.fft import spgram_psd_oneshot
        psd = spgram_psd_oneshot(jnp.asarray(g["spgram_x"]), 256,
                                 "kaiser", 128, 10.0)
        ref = np.real(g["spgram_psd"])
        assert np.abs(np.asarray(psd) - ref).max() < 1e-3
