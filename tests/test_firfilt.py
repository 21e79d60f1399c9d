"""firfilt/firdecim conformance vs reference golden vectors
(reference test analog: src/filter/tests/firfilt_autotest.c + data/)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import assert_close
from liquid_dsp_tpu.ops.fir import firfilt, firdecim, firinterp

FIRFILT_CASES = [
    "firfilt_rrrf_data_h4x8", "firfilt_rrrf_data_h7x16",
    "firfilt_rrrf_data_h13x32", "firfilt_rrrf_data_h23x64",
    "firfilt_crcf_data_h4x8", "firfilt_crcf_data_h7x16",
    "firfilt_crcf_data_h13x32", "firfilt_crcf_data_h23x64",
    "firfilt_cccf_data_h4x8", "firfilt_cccf_data_h7x16",
    "firfilt_cccf_data_h13x32", "firfilt_cccf_data_h23x64",
]

FIRDECIM_CASES = [
    "firdecim_rrrf_data_M2h4x20", "firdecim_rrrf_data_M3h7x30",
    "firdecim_rrrf_data_M4h13x40", "firdecim_rrrf_data_M5h23x50",
    "firdecim_crcf_data_M2h4x20", "firdecim_crcf_data_M3h7x30",
    "firdecim_crcf_data_M4h13x40", "firdecim_crcf_data_M5h23x50",
    "firdecim_cccf_data_M2h4x20", "firdecim_cccf_data_M3h7x30",
    "firdecim_cccf_data_M4h13x40", "firdecim_cccf_data_M5h23x50",
]


@pytest.mark.parametrize("case", FIRFILT_CASES)
def test_firfilt_golden(golden, case):
    d = golden(case)
    proc = firfilt(d["h"])
    y, _ = proc(jnp.asarray(d["x"]))
    assert_close(y, d["y"], msg=case)


@pytest.mark.parametrize("case", FIRFILT_CASES[:4])
def test_firfilt_block_split_equivalence(golden, case):
    """Splitting the stream into blocks with carry must be exact
    (the property that makes time-sharding correct)."""
    d = golden(case)
    proc = firfilt(d["h"])
    x = jnp.asarray(d["x"])
    carry = proc.init(dtype=x.dtype)
    ys = []
    for blk in np.split(np.asarray(x), 4):
        y, carry = proc.apply(proc.params, carry, jnp.asarray(blk))
        ys.append(np.asarray(y))
    assert_close(np.concatenate(ys), d["y"], msg=case)


@pytest.mark.parametrize("case", FIRDECIM_CASES)
def test_firdecim_golden(golden, case):
    d = golden(case)
    m = int(case.split("_M")[1][0])
    proc = firdecim(m, d["h"])
    y, _ = proc(jnp.asarray(d["x"]))
    assert_close(y, d["y"], msg=case)


def test_firfilt_batched():
    """Leading batch axes broadcast (the channel-sharding axis)."""
    rng = np.random.default_rng(0)
    h = rng.standard_normal(9).astype(np.float32)
    x = (rng.standard_normal((3, 64)) + 1j * rng.standard_normal((3, 64))).astype(np.complex64)
    proc = firfilt(h)
    y, _ = proc(jnp.asarray(x), carry=proc.init(batch_shape=(3,)))
    for b in range(3):
        ref = np.convolve(x[b], h)[:64]
        assert_close(y[b], ref, msg=f"batch {b}")


def test_firinterp_roundtrip():
    """firinterp then firdecim with the same Nyquist filter recovers the
    symbol stream (matched-filter property; reference firinterp_autotest)."""
    from liquid_dsp_tpu.design.firdes import firdes_rcos
    k, m = 4, 3
    h = firdes_rcos(k, m, 0.3)
    rng = np.random.default_rng(1)
    sym = (rng.integers(0, 2, 32) * 2.0 - 1.0).astype(np.float32)
    interp = firinterp(k, h)
    y, _ = interp(jnp.asarray(sym))
    assert y.shape[-1] == 32 * k
    # peak of rcos is at delay k*m; downsampled at that offset recovers syms
    yn = np.asarray(y)
    rec = yn[k * m::k][: 32 - m] / np.max(np.abs(h))
    assert_close(np.sign(rec), sym[: 32 - m], tol=0.0, msg="interp roundtrip")


def test_firinterp_is_zero_stuffed_conv():
    rng = np.random.default_rng(2)
    k = 3
    h = rng.standard_normal(10).astype(np.float32)
    x = (rng.standard_normal(20) + 1j * rng.standard_normal(20)).astype(np.complex64)
    y, _ = firinterp(k, h)(jnp.asarray(x))
    xz = np.zeros(20 * k, dtype=np.complex64)
    xz[::k] = x
    ref = np.convolve(xz, h)[: 20 * k]
    assert_close(y, ref, msg="zero-stuffed equivalence")


def test_firfilt_fft_backend_matches_xla():
    """backend='fft' (the off-CPU auto route for taps >= 128) delegates
    to overlap-save with the SAME carry (last L-1 input samples): output
    and carry must match the direct form; a carry produced by one
    backend must restore under the other."""
    from liquid_dsp_tpu.design.firdes import firdes_kaiser
    rng = np.random.default_rng(3)
    h = firdes_kaiser(257, 0.1, 80.0)
    x = (rng.standard_normal((2, 700)) +
         1j * rng.standard_normal((2, 700))).astype(np.complex64)
    q1 = firfilt(h, backend="xla")
    q2 = firfilt(h, backend="fft")
    y1, c1 = q1(jnp.asarray(x), batch_shape=(2,))
    y2, c2 = q2(jnp.asarray(x), batch_shape=(2,))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c1))
    y1b, _ = q1.apply(q1.params, c2, jnp.asarray(x))
    y2b, _ = q2.apply(q2.params, c1, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y2b), np.asarray(y1b), atol=2e-5)
