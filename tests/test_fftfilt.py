"""fftfilt conformance: golden vectors + firfilt equivalence
(reference: src/filter/tests/fftfilt_runtest.c, examples/fftfilt_crcf_example.c)."""
import numpy as np
import pytest
import jax.numpy as jnp

from conftest import assert_close
from liquid_dsp_tpu.ops.fftfilt import fftfilt
from liquid_dsp_tpu.ops.fir import firfilt

CASES = [
    "fftfilt_rrrf_data_h4x256", "fftfilt_rrrf_data_h7x256",
    "fftfilt_rrrf_data_h13x256", "fftfilt_rrrf_data_h23x256",
    "fftfilt_crcf_data_h4x256", "fftfilt_crcf_data_h7x256",
    "fftfilt_crcf_data_h13x256", "fftfilt_crcf_data_h23x256",
    "fftfilt_cccf_data_h4x256", "fftfilt_cccf_data_h7x256",
    "fftfilt_cccf_data_h13x256", "fftfilt_cccf_data_h23x256",
]


@pytest.mark.parametrize("case", CASES)
def test_fftfilt_golden(golden, case):
    d = golden(case)
    proc = fftfilt(d["h"])
    x = jnp.asarray(d["x"])
    y, _ = proc(x, carry=proc.init(dtype=x.dtype))
    assert_close(y, d["y"], msg=case)


@pytest.mark.parametrize("case", CASES[:2])
def test_fftfilt_block_carry(golden, case):
    """Block-split overlap-save must equal the one-shot result."""
    d = golden(case)
    proc = fftfilt(d["h"])
    x = np.asarray(d["x"])
    carry = proc.init(dtype=jnp.asarray(x).dtype)
    ys = []
    for blk in np.split(x, 8):
        y, carry = proc.apply(proc.params, carry, jnp.asarray(blk))
        ys.append(np.asarray(y))
    assert_close(np.concatenate(ys), d["y"], msg=case)


def test_fftfilt_equals_firfilt():
    """fftfilt ≡ firfilt (the reference's own equivalence example)."""
    rng = np.random.default_rng(7)
    h = rng.standard_normal(25).astype(np.float32)
    x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(np.complex64)
    y1, _ = firfilt(h)(jnp.asarray(x))
    y2, _ = fftfilt(h)(jnp.asarray(x))
    assert_close(y2, np.asarray(y1), tol=1e-3, msg="fftfilt vs firfilt")
