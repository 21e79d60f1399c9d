"""Pallas kernel tests (interpret mode on CPU; real-hardware path is
exercised by tools/bench_suite.py on a TPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from conftest import assert_close
from liquid_dsp_tpu.ops.kernels.pallas_fir import (fir_apply_pallas,
                                                   make_banded_taps, TILE)
from liquid_dsp_tpu.ops.fir import fir_apply, firfilt
from liquid_dsp_tpu.design.firdes import firdes_kaiser


class TestPallasFIR:
    def test_banded_structure(self):
        h = np.arange(1, 5, dtype=np.float32)
        Hb = make_banded_taps(h)
        assert Hb.shape == (4 + TILE - 1, TILE)
        # column t contains h reversed starting at row t
        np.testing.assert_array_equal(Hb[0:4, 0], h[::-1])
        np.testing.assert_array_equal(Hb[7:11, 7], h[::-1])

    @pytest.mark.parametrize("L,T,B", [(64, 512, 3), (13, 256, 1),
                                       (129, 384, 2)])
    def test_matches_conv(self, L, T, B):
        rng = np.random.default_rng(L)
        h = firdes_kaiser(L, 0.2, 60.0).astype(np.float32)
        x = jnp.asarray((rng.standard_normal((B, T)) +
                         1j * rng.standard_normal((B, T))
                         ).astype(np.complex64))
        carry = jnp.asarray((rng.standard_normal((B, L - 1)) +
                             1j * rng.standard_normal((B, L - 1))
                             ).astype(np.complex64))
        y_ref, c_ref = fir_apply(jnp.asarray(h), carry, x)
        y_p, c_p = fir_apply_pallas(h, carry, x, interpret=True)
        assert_close(np.asarray(y_p), np.asarray(y_ref), tol=1e-4)
        assert_close(np.asarray(c_p), np.asarray(c_ref), tol=1e-6)

    def test_firfilt_pallas_backend(self, golden):
        d = golden("firfilt_crcf_data_h13x32")
        q = firfilt(d["h"], backend="pallas")
        y, _ = q(jnp.asarray(d["x"]), batch_shape=())
        assert_close(np.asarray(y), d["y"], tol=1e-3)

    def test_complex_taps_rejected(self):
        with pytest.raises(ValueError):
            firfilt(np.ones(8, np.complex64), backend="pallas")


class TestMatmulFIR:
    """firfilt backend='matmul': banded-tap-matrix formulation
    (MXU-shaped on TPU; see PERF.md)."""

    def test_matches_xla_backend(self):
        import numpy as np
        import jax.numpy as jnp
        from liquid_dsp_tpu.ops.fir import firfilt
        from liquid_dsp_tpu.design.firdes import firdes_kaiser
        rng = np.random.default_rng(3)
        for L, T in [(64, 1000), (57, 4096), (13, 257), (1, 128)]:
            h = firdes_kaiser(L, 0.2, 60.0) if L > 1 else np.array([0.7])
            x = jnp.asarray((rng.standard_normal((3, T)) +
                             1j * rng.standard_normal((3, T))
                             ).astype(np.complex64))
            ya, _ = firfilt(h)(x, batch_shape=(3,))
            ym, _ = firfilt(h, backend="matmul")(x, batch_shape=(3,))
            assert float(jnp.max(jnp.abs(ya - ym))) < 1e-5, (L, T)

    def test_streaming_complex_taps(self):
        import numpy as np
        import jax.numpy as jnp
        from liquid_dsp_tpu.ops.fir import firfilt
        rng = np.random.default_rng(4)
        h = (rng.standard_normal(21) +
             1j * rng.standard_normal(21)).astype(np.complex64)
        x = jnp.asarray((rng.standard_normal((2, 512)) +
                         1j * rng.standard_normal((2, 512))
                         ).astype(np.complex64))
        p = firfilt(h, backend="matmul")
        y_once, _ = p(x, batch_shape=(2,))
        c = p.init(batch_shape=(2,))
        ys = []
        for blk in np.split(np.asarray(x), 4, axis=-1):
            yb, c = p.apply(p.params, c, jnp.asarray(blk))
            ys.append(np.asarray(yb))
        d = np.abs(np.concatenate(ys, -1) - np.asarray(y_once)).max()
        assert d < 1e-5
