"""LTI chain fusion (liquid_dsp_tpu/fuse.py): fused == unfused.

The fused stage recombines a cascade into ONE strided FIR; outputs must
match the unfused public-API chain to fp32 accumulation tolerance (one
long dot product vs a cascade of short ones), including across block
boundaries (streaming carry) and around non-LTI stages.
"""
import numpy as np
import jax.numpy as jnp

from liquid_dsp_tpu import chain, fuse
from liquid_dsp_tpu.design.firdes import firdes_kaiser
from liquid_dsp_tpu.ops.fir import firfilt, firdecim
from liquid_dsp_tpu.ops.fftfilt import fftfilt
from liquid_dsp_tpu.ops.nco import nco
from liquid_dsp_tpu.ops.resample import msresamp, msresamp2, resamp2_decim


def _run_blocks(proc, x_blocks, batch_shape):
    carry = proc.init(batch_shape=batch_shape)
    outs = []
    for xb in x_blocks:
        y, carry = proc.jitted(proc.params, carry, jnp.asarray(xb))
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def _check(proc, n_blocks=3, T=512, batch=(2,), dtype=np.complex64,
           rtol=2e-4):
    rng = np.random.default_rng(7)
    shape = batch + (T,)
    blocks = []
    for _ in range(n_blocks):
        x = rng.standard_normal(shape)
        if np.issubdtype(dtype, np.complexfloating):
            x = x + 1j * rng.standard_normal(shape)
        blocks.append(x.astype(dtype))
    fused = fuse(proc)
    y_ref = _run_blocks(proc, blocks, batch)
    y_fused = _run_blocks(fused, blocks, batch)
    assert y_fused.shape == y_ref.shape
    rms = np.sqrt(np.mean(np.abs(y_ref) ** 2)) + 1e-30
    assert np.abs(y_fused - y_ref).max() / rms < rtol
    return fused


def test_fir_cascade_fuses_to_one_stage():
    p = chain(firfilt(firdes_kaiser(21, 0.2, 60.0)),
              firfilt(firdes_kaiser(33, 0.3, 60.0)))
    fused = _check(p)
    # both stages merged: no children left
    assert fused.children is None
    assert fused.lti is not None and fused.lti.taps.shape[-1] == 21 + 33 - 1


def test_fir_plus_decim():
    p = chain(firfilt(firdes_kaiser(24, 0.2, 60.0)),
              firdecim(4, firdes_kaiser(16, 0.1, 60.0)))
    fused = _check(p, T=256)
    assert fused.rate == (1, 4)


def test_fftfilt_fuses_too():
    p = chain(fftfilt(firdes_kaiser(57, 0.3, 60.0)),
              firfilt(firdes_kaiser(20, 0.25, 60.0)))
    _check(p)


def test_halfband_cascade_offsets():
    # two resamp2 decimators: down=4, d = 1 + 2*1 = 3
    p = chain(resamp2_decim(4), resamp2_decim(3))
    fused = _check(p, T=512)
    assert fused.lti.down == 4 and fused.lti.d == 3


def test_msresamp2_two_stage_with_gain():
    p = msresamp2("decim", 2)
    _check(p, T=512)


def test_headline_chain_with_nonlti_prefix():
    # the bench chain: mix (non-LTI) -> FIR64 -> FIR57 -> msresamp(0.5).
    # fuse must keep the NCO and collapse everything after it.
    p = chain(nco(dphi=0.125, direction="down"),
              firfilt(firdes_kaiser(64, 0.2, 60.0)),
              firfilt(firdes_kaiser(57, 0.3, 60.0)),
              msresamp(0.5, 60.0))
    fused = _check(p, T=1024)
    assert len(fused.children) == 2  # nco + one fused FIR
    assert fused.children[1].lti.down == 2
    assert fused.children[1].lti.d == 1


def test_complex_taps_halfband():
    # f0 != 0 gives complex halfband taps; fusion must stay complex
    p = chain(resamp2_decim(4, f0=0.1), firfilt(firdes_kaiser(9, 0.2, 60.0)))
    fused = _check(p, T=512)
    assert np.iscomplexobj(fused.lti.taps)


def test_real_input_stream():
    p = chain(firfilt(firdes_kaiser(15, 0.2, 60.0)),
              firdecim(2, firdes_kaiser(10, 0.2, 60.0)))
    _check(p, dtype=np.float32, T=256)


def test_fuse_noop_without_lti():
    p = nco(dphi=0.3, direction="up")
    assert fuse(p) is p


def test_single_lti_stage_left_alone():
    f = firfilt(firdes_kaiser(21, 0.2, 60.0))
    p = chain(nco(dphi=0.125, direction="down"), f)
    fused = fuse(p)
    assert fused.children[1] is f


def test_fused_rate_and_time_shard_halo():
    p = chain(firfilt(firdes_kaiser(16, 0.2, 60.0)), resamp2_decim(3))
    fused = fuse(p)
    L = fused.lti.taps.shape[-1]
    assert fused.halo == L - 1
    # halo metadata means the standard time-sharding transform applies:
    # equivalence under the stream sharder on a 4-device virtual mesh
    import jax
    from liquid_dsp_tpu.parallel.mesh import stream_mesh
    from liquid_dsp_tpu.parallel.stream import run_time_sharded

    rng = np.random.default_rng(3)
    x = (rng.standard_normal((2, 1024)) +
         1j * rng.standard_normal((2, 1024))).astype(np.complex64)
    y1 = _run_blocks(fused, [x], (2,))
    mesh = stream_mesh(n_time=4, devices=jax.devices()[:4])
    y4, _ = run_time_sharded(fused, mesh, jnp.asarray(x), batch_shape=(2,))
    rms = np.sqrt(np.mean(np.abs(y1) ** 2))
    assert np.abs(np.asarray(y4) - y1).max() / rms < 2e-4
