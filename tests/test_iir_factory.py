"""Factory-constructor filters (reference iirfilt.c:174-411 analogs):
integrator, differentiator, DC blocker, PLL loop filter, rect FIR.

Golden vectors are the compiled reference's own outputs on a chirp
input (tools/gen_iirfactory_golden.py); comparison uses the autotest
tol=1e-3 convention.  Property tests cover the frequency-domain
behavior in each filter's design band."""
import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from liquid_dsp_tpu.ops.iir import (iirfilt_integrator,
                                    iirfilt_differentiator,
                                    iirfilt_dc_blocker, iirfilt_pll)
from liquid_dsp_tpu.ops.fir import firfilt_rect

GOLDEN = pathlib.Path(__file__).parent / "golden/iirfactory_golden.npz"


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


# integrator/differentiator have no reference golden: the reference's
# liquid_cplxpair (iirdes.c:60-101) fails to pair the Pintelon zeros
# (absolute 1e-6 tolerance vs magnitude-3..5.5 roots) and its
# create_integrator emits NaN coefficients under this toolchain; the
# property tests below pin the correct behavior instead.
_PROCS = {
    "dcblock": lambda: iirfilt_dc_blocker(0.05),
    "pll": lambda: iirfilt_pll(0.02, 0.7071, 1000.0),
    "rect": lambda: firfilt_rect(8),
}


@pytest.mark.parametrize("tag", sorted(_PROCS))
def test_golden_vs_reference(tag, golden):
    x = golden["input"]
    ref = golden[tag]
    y, _ = _PROCS[tag]()(jnp.asarray(x), batch_shape=())
    y = np.asarray(y)
    scale = max(1.0, float(np.max(np.abs(ref))))
    # autotest tol=1e-3, relative to the response scale (the pll's
    # near-unity poles amplify the chirp by ~1e3)
    assert np.max(np.abs(y - ref)) / scale < 1e-3, tag


def _tone_gain(proc, f, n=8000, settle=2000):
    """Complex gain at f via projection onto the tone (robust to the
    non-decaying DC mode the integrator's z=1 pole leaves behind)."""
    per = int(round(1.0 / f))
    m = ((n - settle) // per) * per
    t = np.arange(n)
    x = np.exp(2j * np.pi * f * t).astype(np.complex64)
    y, _ = proc(jnp.asarray(x), batch_shape=())
    y = np.asarray(y)[settle:settle + m]
    return complex(np.mean(y * np.conj(x[settle:settle + m])))


def test_integrator_magnitude_follows_one_over_f():
    q = iirfilt_integrator()
    for f in (0.01, 0.02, 0.05, 0.1, 0.2):
        g = abs(_tone_gain(q, f))
        ideal = 1.0 / (2 * np.pi * f)
        assert abs(g - ideal) / ideal < 0.04, (f, g, ideal)


def test_integrator_step_response_is_a_ramp():
    q = iirfilt_integrator()
    y, _ = q(jnp.ones(2000, jnp.complex64), batch_shape=())
    d = np.diff(np.real(np.asarray(y))[500:])
    assert np.allclose(d, 1.0, atol=0.05)


def test_differentiator_magnitude_in_design_band():
    # the reference 8th-order design approximates |H| = 2*pi*f for
    # f <~ 0.07 and rolls off toward Nyquist (Pintelon Table IV)
    q = iirfilt_differentiator()
    for f in (0.02, 0.04, 0.06):
        g = abs(_tone_gain(q, f))
        ideal = 2 * np.pi * f
        # the 8th-order design is equiripple-ish within ~3% here
        assert abs(g - ideal) / ideal < 0.04, (f, g, ideal)


def test_dc_blocker_kills_dc_keeps_tone():
    q = iirfilt_dc_blocker(0.05)
    n = 6000
    tone = np.exp(2j * np.pi * 0.2 * np.arange(n))
    x = (tone + 2.0 + 1.0j).astype(np.complex64)
    y, _ = q(jnp.asarray(x), batch_shape=())
    y = np.asarray(y)[2000:]
    assert abs(np.mean(y)) < 0.01                 # DC removed
    assert abs(np.mean(np.abs(y)) - 1.0) < 0.05   # tone preserved
    with pytest.raises(ValueError):
        iirfilt_dc_blocker(1.5)


def test_pll_rejects_bad_parameters():
    for bad in ((1.5, 0.7, 1.0), (0.1, 1.5, 1.0), (0.1, 0.7, -1.0)):
        with pytest.raises(ValueError):
            iirfilt_pll(*bad)


def test_firfilt_rect_is_moving_sum():
    q = firfilt_rect(8)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(256) +
         1j * rng.standard_normal(256)).astype(np.complex64)
    y, _ = q(jnp.asarray(x), batch_shape=())
    ref = np.convolve(x, np.ones(8))[:256]
    assert np.allclose(np.asarray(y), ref, atol=1e-4)
    with pytest.raises(ValueError):
        firfilt_rect(0)
    with pytest.raises(ValueError):
        firfilt_rect(2000)
