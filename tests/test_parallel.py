"""Multi-device equivalence: N-device sharded run ≡ 1-device run ≡ golden.

This is the test class the reference cannot have (single-threaded C);
SURVEY.md §4 prescribes it.  Runs on the 8-device virtual CPU mesh.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import assert_close
from liquid_dsp_tpu import chain
from liquid_dsp_tpu.ops.fir import firfilt, firdecim
from liquid_dsp_tpu.ops.fftfilt import fftfilt
from liquid_dsp_tpu.ops.nco import nco
from liquid_dsp_tpu.parallel.mesh import stream_mesh
from liquid_dsp_tpu.parallel.stream import run_time_sharded


def _rand_cplx(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_firfilt_time_sharded(n_dev):
    rng = np.random.default_rng(11)
    h = rng.standard_normal(17).astype(np.float32)
    x = _rand_cplx(rng, 1024)
    proc = firfilt(h)
    y_ref, c_ref = proc(jnp.asarray(x))
    mesh = stream_mesh(n_time=n_dev, devices=jax.devices()[:n_dev])
    y, c = run_time_sharded(proc, mesh, jnp.asarray(x))
    assert_close(y, np.asarray(y_ref), tol=1e-5, msg=f"{n_dev}-dev firfilt")
    assert_close(c, np.asarray(c_ref), tol=1e-6, msg="carry")


def test_firfilt_sharded_golden(golden):
    """Sharded output matches the extracted reference golden vector
    EXACTLY the way the single-device path does."""
    d = golden("firfilt_crcf_data_h13x32")
    proc = firfilt(d["h"])
    mesh = stream_mesh(n_time=2, devices=jax.devices()[:2])
    y, _ = run_time_sharded(proc, mesh, jnp.asarray(d["x"]))
    assert_close(y, d["y"], msg="sharded vs golden")


def test_fftfilt_time_sharded():
    rng = np.random.default_rng(13)
    h = rng.standard_normal(23).astype(np.float32)
    x = _rand_cplx(rng, 2048)
    proc = fftfilt(h)
    y_ref, _ = proc(jnp.asarray(x), carry=proc.init())
    mesh = stream_mesh(n_time=4, devices=jax.devices()[:4])
    y, _ = run_time_sharded(proc, mesh, jnp.asarray(x))
    assert_close(y, np.asarray(y_ref), tol=1e-4, msg="4-dev fftfilt")


def test_chain_time_sharded():
    """mixer -> FIR -> decim chain sharded over 4 devices: the mixer uses
    closed-form phase advance, the filters exchange halos."""
    rng = np.random.default_rng(17)
    h = rng.standard_normal(31).astype(np.float32)
    h2 = rng.standard_normal(15).astype(np.float32)
    x = _rand_cplx(rng, 2048)
    proc = chain(nco(dphi=0.1, direction="down"), firfilt(h), firdecim(2, h2))
    y_ref, _ = proc(jnp.asarray(x))
    mesh = stream_mesh(n_time=4, devices=jax.devices()[:4])
    y, _ = run_time_sharded(proc, mesh, jnp.asarray(x))
    assert_close(y, np.asarray(y_ref), tol=1e-3, msg="sharded chain")


def test_multiblock_carry_continuity():
    """Two successive sharded block steps ≡ one long single-device run."""
    rng = np.random.default_rng(19)
    h = rng.standard_normal(9).astype(np.float32)
    x = _rand_cplx(rng, 1024)
    proc = firfilt(h)
    y_ref, _ = proc(jnp.asarray(x))
    mesh = stream_mesh(n_time=4, devices=jax.devices()[:4])
    carry = proc.init()
    y1, carry = run_time_sharded(proc, mesh, jnp.asarray(x[:512]), carry=carry)
    y2, carry = run_time_sharded(proc, mesh, jnp.asarray(x[512:]), carry=carry)
    assert_close(np.concatenate([np.asarray(y1), np.asarray(y2)]),
                 np.asarray(y_ref), tol=1e-5, msg="block continuity")


def test_channel_and_time_sharded():
    """2-channel x 4-time mesh: both axes at once."""
    rng = np.random.default_rng(23)
    h = rng.standard_normal(13).astype(np.float32)
    x = _rand_cplx(rng, 2, 1024)
    proc = firfilt(h)
    y_ref, _ = proc(jnp.asarray(x), carry=proc.init(batch_shape=(2,)))
    mesh = stream_mesh(n_time=4, n_channel=2)
    y, _ = run_time_sharded(proc, mesh, jnp.asarray(x),
                            carry=proc.init(batch_shape=(2,)))
    assert_close(y, np.asarray(y_ref), tol=1e-5, msg="ch+time sharded")
