"""Debug tap-point subsystem (the reference DEBUG_* machinery analog)."""
import numpy as np
import jax.numpy as jnp

from liquid_dsp_tpu import debug
from liquid_dsp_tpu.ops.agc import agc


class TestDebugTaps:
    def test_disabled_by_default(self):
        q = agc()
        x = jnp.asarray(np.ones(256, np.complex64) * 0.1)
        q(x, batch_shape=())
        assert not debug.enabled()
        assert debug.store() == {}

    def test_capture_agc_gain(self):
        q = agc(bandwidth=0.05)
        x = jnp.asarray(np.ones(512, np.complex64) * 0.1)
        with debug.capture() as store:
            q(x, batch_shape=())
        assert "agc.gain" in store
        g = np.asarray(store["agc.gain"][0])
        assert abs(g - 10.0) < 1.0       # converged toward 1/|x|
        # disabled again afterwards: no further recording
        q(x, batch_shape=())
        assert len(store["agc.gain"]) == 1

    def test_capture_stream_rx(self, tmp_path):
        from liquid_dsp_tpu.framing.frame64 import (Framesync64,
                                                    framegen64, FRAME64_LEN)
        cap = np.zeros(8192, np.complex64)
        cap[1000:1000 + FRAME64_LEN] = framegen64(
            np.arange(8, dtype=np.uint8), np.arange(64, dtype=np.uint8))
        fs = Framesync64(block_len=4096)
        with debug.capture() as store:
            fs.execute(cap)
        assert "stream_rx.seg_peak" in store
        assert "stream_rx.region_syms" in store
        # the detection trace sees the frame's correlation peak
        assert max(float(np.max(s)) for s in store["stream_rx.seg_peak"]) \
            > 0.5
        debug.dump(tmp_path / "dbg.npz")
        d = np.load(tmp_path / "dbg.npz")
        assert any(k.startswith("stream_rx_seg_peak") for k in d.files)

    def test_capture_ofdm_metric(self):
        from liquid_dsp_tpu.multichannel.ofdm import (
            ofdm_params, ofdm_generate_frame, ofdm_frame_sync)
        rng = np.random.default_rng(0)
        p = ofdm_params(64, 16, 4)
        nsym = 4
        X = ((rng.integers(0, 2, (nsym, p.M_data)) * 2 - 1) +
             1j * (rng.integers(0, 2, (nsym, p.M_data)) * 2 - 1)
             ).astype(np.complex64) / np.sqrt(2)
        tx = ofdm_generate_frame(p, X)
        cap = np.concatenate([np.zeros(100, np.complex64), tx,
                              np.zeros(100, np.complex64)])
        with debug.capture() as store:
            r = ofdm_frame_sync(p, cap, nsym)
        assert r.detected
        assert "ofdm.metric" in store
        assert float(np.max(store["ofdm.metric"][0])) > 0.7
