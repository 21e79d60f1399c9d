"""StreamRunner: one-compile streaming over block sources, carry
management, checkpoint/resume, and sharded mode."""
import numpy as np
import jax.numpy as jnp
import pytest

from liquid_dsp_tpu import chain
from liquid_dsp_tpu.runtime import StreamRunner
from liquid_dsp_tpu.design.firdes import firdes_kaiser
from liquid_dsp_tpu.ops.fir import firfilt
from liquid_dsp_tpu.ops.nco import nco


def _proc():
    return chain(nco(dphi=0.1, direction="down"),
                 firfilt(firdes_kaiser(32, 0.2, 60.0)))


class TestStreamRunner:
    def test_matches_oneshot(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(4096) +
             1j * rng.standard_normal(4096)).astype(np.complex64)
        proc = _proc()
        y_once, _ = proc(jnp.asarray(x), batch_shape=())
        runner = StreamRunner(_proc(), batch_shape=())
        ys = [np.asarray(runner(blk)) for blk in np.split(x, 8)]
        np.testing.assert_allclose(np.concatenate(ys), np.asarray(y_once),
                                   atol=1e-4, rtol=1e-4)
        assert runner.blocks_processed == 8

    def test_checkpoint_resume(self, tmp_path):
        rng = np.random.default_rng(1)
        x = (rng.standard_normal(2048) +
             1j * rng.standard_normal(2048)).astype(np.complex64)
        blocks = np.split(x, 4)
        r1 = StreamRunner(_proc(), batch_shape=())
        for blk in blocks[:2]:
            r1(blk)
        ck = tmp_path / "state.npz"
        r1.save(ck)
        tail1 = [np.asarray(r1(blk)) for blk in blocks[2:]]
        r2 = StreamRunner(_proc(), batch_shape=())
        r2.load(ck)
        assert r2.blocks_processed == 2
        tail2 = [np.asarray(r2(blk)) for blk in blocks[2:]]
        for a, b in zip(tail1, tail2):
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    def test_run_iterator_and_io(self, tmp_path):
        from liquid_dsp_tpu import io as lio
        rng = np.random.default_rng(2)
        x = (rng.uniform(-0.5, 0.5, 8192) +
             1j * rng.uniform(-0.5, 0.5, 8192)).astype(np.complex64)
        f = tmp_path / "cap.cs16"
        lio.write_iq(f, x, "cs16")
        runner = StreamRunner(_proc(), batch_shape=())
        outs = list(runner.run(lio.iq_stream(f, "cs16", block=2048)))
        assert len(outs) == 4 and all(o.shape == (2048,) for o in outs)

    def test_sharded_mode(self):
        import jax
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        from liquid_dsp_tpu.parallel.mesh import stream_mesh
        mesh = stream_mesh(n_time=2, n_channel=1,
                           devices=jax.devices()[:2])
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((1, 1024)) +
             1j * rng.standard_normal((1, 1024))).astype(np.complex64)
        runner = StreamRunner(_proc(), batch_shape=(1,), mesh=mesh)
        y = np.asarray(runner(x))
        proc = _proc()
        y_ref, _ = proc(jnp.asarray(x), batch_shape=(1,))
        np.testing.assert_allclose(y, np.asarray(y_ref), atol=1e-4, rtol=1e-3)
