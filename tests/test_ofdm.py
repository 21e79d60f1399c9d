"""OFDM frame tests (reference src/multichannel/tests/
ofdmframesync_autotest.c style: loopback detection + data recovery under
carrier offset, noise, and multipath)."""
import numpy as np
import jax.numpy as jnp
import pytest

from liquid_dsp_tpu.multichannel.ofdm import (
    ofdm_params, ofdm_generate_frame, ofdm_frame_sync, default_sctype,
    SCTYPE_NULL, SCTYPE_PILOT, SCTYPE_DATA)
from liquid_dsp_tpu.modem import constellation, modulate, demodulate


def _frame(M=64, cp=16, n_syms=10, seed=0, ms="qpsk"):
    params = ofdm_params(M, cp)
    rng = np.random.default_rng(seed)
    table = constellation(ms)
    Mbits = {"qpsk": 4, "qam16": 16}[ms]
    sidx = rng.integers(0, Mbits, (n_syms, params.M_data))
    data = np.asarray(modulate(table, jnp.asarray(sidx)))
    return params, sidx, ofdm_generate_frame(params, data), table


def _ser(params, r, sidx, table):
    dec = np.asarray(demodulate(table, jnp.asarray(r.data_syms.reshape(-1))))
    return np.mean(dec != sidx.reshape(-1))


class TestAllocation:
    def test_default_sctype_counts(self):
        p = default_sctype(64)
        # reference: guards 2*max(M/10,2), DC null, pilots every P=8
        assert p[0] == SCTYPE_NULL
        assert np.sum(p == SCTYPE_PILOT) == 6
        assert np.sum(p == SCTYPE_DATA) == 44

    def test_small_M_pilot_spacing(self):
        p = default_sctype(32)
        assert np.sum(p == SCTYPE_PILOT) >= 2

    def test_params_validation(self):
        with pytest.raises(ValueError):
            # all null except too few pilots
            p = np.zeros(16, np.uint8)
            p[1] = SCTYPE_DATA
            ofdm_params(16, 4, p=p)


class TestLoopback:
    def test_clean(self):
        params, sidx, frame, table = _frame()
        x = np.concatenate([np.zeros(100, np.complex64), frame,
                            np.zeros(100, np.complex64)])
        r = ofdm_frame_sync(params, x, 10)
        assert r.detected
        assert _ser(params, r, sidx, table) == 0.0

    @pytest.mark.parametrize("cfo", [0.005, -0.012])
    def test_carrier_offset(self, cfo):
        params, sidx, frame, table = _frame(seed=1)
        x = np.concatenate([np.zeros(80, np.complex64), frame,
                            np.zeros(80, np.complex64)])
        t = np.arange(len(x))
        x = (x * np.exp(1j * (cfo * t + 1.0))).astype(np.complex64)
        r = ofdm_frame_sync(params, x, 10)
        assert r.detected
        assert abs(r.cfo_hat - cfo) < 1e-3
        assert _ser(params, r, sidx, table) == 0.0

    def test_awgn_20db(self):
        params, sidx, frame, table = _frame(seed=2)
        rng = np.random.default_rng(3)
        x = np.concatenate([np.zeros(120, np.complex64), frame,
                            np.zeros(80, np.complex64)])
        s = 10 ** (-20 / 20) * np.sqrt(np.mean(np.abs(frame) ** 2))
        x = x + s / np.sqrt(2) * (rng.standard_normal(len(x)) +
                                  1j * rng.standard_normal(len(x)))
        r = ofdm_frame_sync(params, x.astype(np.complex64), 10)
        assert r.detected
        assert _ser(params, r, sidx, table) < 0.01

    def test_multipath(self):
        params, sidx, frame, table = _frame(seed=4)
        h = np.zeros(6, np.complex64)
        h[0] = 1.0
        h[3] = 0.3 - 0.2j
        h[5] = -0.1j
        x = np.convolve(np.concatenate([np.zeros(64, np.complex64), frame,
                                        np.zeros(64, np.complex64)]), h
                        )[:len(frame) + 128].astype(np.complex64)
        r = ofdm_frame_sync(params, x, 10)
        assert r.detected
        # per-subcarrier EQ from S1 handles in-CP multipath
        assert _ser(params, r, sidx, table) < 0.01

    def test_qam16(self):
        params, sidx, frame, table = _frame(seed=5, ms="qam16")
        x = np.concatenate([np.zeros(90, np.complex64), frame,
                            np.zeros(90, np.complex64)])
        r = ofdm_frame_sync(params, x, 10)
        assert r.detected
        assert _ser(params, r, sidx, table) == 0.0

    def test_no_false_alarm(self):
        params = ofdm_params(64, 16)
        rng = np.random.default_rng(6)
        x = (0.3 * (rng.standard_normal(2000) +
                    1j * rng.standard_normal(2000))).astype(np.complex64)
        r = ofdm_frame_sync(params, x, 4)
        assert not r.detected or r.data_syms is None

    @pytest.mark.parametrize("M,cp", [(32, 8), (128, 32)])
    def test_other_sizes(self, M, cp):
        params, sidx, frame, table = _frame(M=M, cp=cp, n_syms=6, seed=7)
        x = np.concatenate([np.zeros(70, np.complex64), frame,
                            np.zeros(70, np.complex64)])
        r = ofdm_frame_sync(params, x, 6)
        assert r.detected
        assert _ser(params, r, sidx, table) == 0.0
