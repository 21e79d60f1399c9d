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
