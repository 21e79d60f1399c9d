"""flexframe / ofdmflexframe / gmskframe loopback tests (reference
src/framing/tests autotest style: assemble, impair, recover; sweep
payload modulation and FEC properties)."""
import numpy as np
import pytest

from liquid_dsp_tpu.framing.flexframe import (flexframegen, flexframesync,
                                              FLEXFRAME_H_USER)
from liquid_dsp_tpu.framing.ofdmflexframe import (
    ofdmflexframegen, ofdmflexframesync, OFDMFLEXFRAME_H_USER)
from liquid_dsp_tpu.framing.gmskframe import (gmskframegen, gmskframesync,
                                              GMSKFRAME_H_USER)


def _impair(f, pad=120, gain=0.6, cfo=0.003, phase=0.9, snr_db=None,
            seed=1):
    x = np.concatenate([np.zeros(pad, np.complex64), f,
                        np.zeros(pad, np.complex64)])
    t = np.arange(len(x))
    x = gain * x * np.exp(1j * (cfo * t + phase))
    if snr_db is not None:
        rng = np.random.default_rng(seed)
        s = gain * 10 ** (-snr_db / 20) * np.sqrt(np.mean(np.abs(f) ** 2))
        x = x + s / np.sqrt(2) * (rng.standard_normal(len(x)) +
                                  1j * rng.standard_normal(len(x)))
    return x.astype(np.complex64)


class TestFlexFrame:
    @pytest.mark.parametrize("n,ms,fec1", [
        (40, "qpsk", "golay2412"),
        pytest.param(100, "qam16", "hamming128", marks=pytest.mark.slow),
        pytest.param(250, "psk8", "none", marks=pytest.mark.slow),
        pytest.param(17, "qam64", "rep3", marks=pytest.mark.slow),
        (1, "bpsk", "none"),
        (60, "qpsk", "v39"),
    ])
    def test_loopback(self, n, ms, fec1):
        rng = np.random.default_rng(n)
        hdr = rng.integers(0, 256, FLEXFRAME_H_USER).astype(np.uint8)
        pl = rng.integers(0, 256, n).astype(np.uint8)
        f = flexframegen(hdr, pl, "crc32", "none", fec1, ms)
        r = flexframesync(_impair(f))
        assert r.detected and r.header_ok and r.crc_ok
        assert r.ms == ms and r.payload_len == n
        np.testing.assert_array_equal(r.header, hdr)
        np.testing.assert_array_equal(r.payload, pl)

    def test_noisy(self):
        rng = np.random.default_rng(9)
        hdr = rng.integers(0, 256, FLEXFRAME_H_USER).astype(np.uint8)
        pl = rng.integers(0, 256, 80).astype(np.uint8)
        f = flexframegen(hdr, pl, "crc32", "none", "golay2412", "qpsk")
        r = flexframesync(_impair(f, snr_db=15))
        assert r.crc_ok
        np.testing.assert_array_equal(r.payload, pl)

    def test_bad_header_size(self):
        with pytest.raises(ValueError):
            flexframegen(np.zeros(5, np.uint8), np.zeros(10, np.uint8))


class TestOFDMFlexFrame:
    @pytest.mark.parametrize("n,ms,fec1", [
        (64, "qpsk", "golay2412"),
        (200, "qam16", "hamming128"),
        (33, "psk8", "none"),
    ])
    def test_loopback(self, n, ms, fec1):
        rng = np.random.default_rng(n)
        hdr = rng.integers(0, 256, OFDMFLEXFRAME_H_USER).astype(np.uint8)
        pl = rng.integers(0, 256, n).astype(np.uint8)
        f = ofdmflexframegen(hdr, pl, ms=ms, fec1=fec1)
        r = ofdmflexframesync(_impair(f, cfo=0.004))
        assert r.detected and r.header_ok and r.crc_ok
        np.testing.assert_array_equal(r.header, hdr)
        np.testing.assert_array_equal(r.payload, pl)

    def test_noisy(self):
        rng = np.random.default_rng(11)
        hdr = rng.integers(0, 256, OFDMFLEXFRAME_H_USER).astype(np.uint8)
        pl = rng.integers(0, 256, 120).astype(np.uint8)
        f = ofdmflexframegen(hdr, pl, fec1="golay2412")
        r = ofdmflexframesync(_impair(f, snr_db=18, cfo=0.002))
        assert r.crc_ok
        np.testing.assert_array_equal(r.payload, pl)


class TestGMSKFrame:
    @pytest.mark.parametrize("n,fec1", [
        pytest.param(40, "none", marks=pytest.mark.slow),
        pytest.param(100, "golay2412", marks=pytest.mark.slow),
        (25, "hamming74")])
    def test_loopback(self, n, fec1):
        rng = np.random.default_rng(n)
        hdr = rng.integers(0, 256, GMSKFRAME_H_USER).astype(np.uint8)
        pl = rng.integers(0, 256, n).astype(np.uint8)
        f = gmskframegen(hdr, pl, fec1=fec1)
        r = gmskframesync(_impair(f, cfo=0.002))
        assert r.detected and r.header_ok and r.crc_ok
        np.testing.assert_array_equal(r.header, hdr)
        np.testing.assert_array_equal(r.payload, pl)

    @pytest.mark.slow
    def test_noisy(self):
        rng = np.random.default_rng(13)
        hdr = rng.integers(0, 256, GMSKFRAME_H_USER).astype(np.uint8)
        pl = rng.integers(0, 256, 60).astype(np.uint8)
        f = gmskframegen(hdr, pl, fec1="golay2412")
        r = gmskframesync(_impair(f, snr_db=20))
        assert r.crc_ok
        np.testing.assert_array_equal(r.payload, pl)


class TestFlexFrameGolden:
    """Wire interop with the compiled reference: flexframegen output is
    sample-exact vs tests/golden/flexframe_golden.npz, and flexframesync
    decodes frames the reference transmitted (tools/
    gen_flexframe_golden.py)."""

    CASES = [("ffg_a", 64, "crc32", "none", "golay2412", "qpsk", 21),
             ("ffg_b", 40, "crc16", "hamming128", "none", "qam16", 33),
             ("ffg_c", 100, "crc32", "secded7264", "hamming84", "psk8", 55)]

    @pytest.fixture(scope="class")
    def fg(self):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        return dict(np.load(path))

    @staticmethod
    def _fill(n, seed):
        # reference generator's LCG byte stream (gen_flexframe_golden.py)
        s, out = seed, []
        for _ in range(n):
            s = (s * 1103515245 + 12345) & 0xFFFFFFFF
            out.append((s >> 16) & 0xFF)
        return np.asarray(out, np.uint8)

    @pytest.mark.parametrize("tag,n,crc,fec0,fec1,ms,seed", CASES)
    def test_tx_sample_exact(self, fg, tag, n, crc, fec0, fec1, ms, seed):
        hdr = self._fill(14, seed)
        payload = self._fill(n, seed + 1)
        y = flexframegen(hdr, payload, crc=crc, fec0=fec0, fec1=fec1, ms=ms)
        ref = fg[tag]
        assert len(y) == len(ref)
        assert np.abs(y - ref).max() < 1e-5

    @pytest.mark.parametrize("tag,n,crc,fec0,fec1,ms,seed", CASES)
    def test_sync_decodes_reference_tx(self, fg, tag, n, crc, fec0, fec1,
                                       ms, seed):
        hdr = self._fill(14, seed)
        payload = self._fill(n, seed + 1)
        ref = fg[tag]
        x = np.concatenate([np.zeros(50, np.complex64), ref,
                            np.zeros(50, np.complex64)])
        res = flexframesync(x)
        assert res.detected and res.header_ok and res.crc_ok
        assert np.array_equal(res.header, hdr)
        assert np.array_equal(res.payload, payload)
        assert res.ms == ms

    def test_pilots_and_qpacketmodem_exact(self, fg):
        from liquid_dsp_tpu.framing.qpacket import (qpilotgen,
                                                    qpacketmodem_encode)
        for plen in [60, 92, 124]:
            mine = qpilotgen(np.zeros(plen, np.complex64), 16)
            assert np.abs(mine - fg[f"pilots_{plen}_16"]).max() < 1e-5
        for tag, n, c, f0, f1, ms, seed in [
                ("qpm_a", 40, "crc32", "none", "golay2412", "qpsk", 7),
                ("qpm_b", 72, "crc16", "hamming74", "none", "qam16", 11),
                ("qpm_hdr", 20, "crc32", "secded7264", "hamming84",
                 "qpsk", 3)]:
            payload = self._fill(n, seed)
            mine = np.asarray(qpacketmodem_encode(payload, c, f0, f1, ms))
            assert np.abs(mine - fg[tag]).max() < 1e-5, tag


class TestGMSKFrameGolden:
    """Wire interop with the compiled reference (gmsk cases in tools/
    gen_flexframe_golden.py).  The reference's tail symbols are random
    bits (rand()), so comparison excludes the final 2m symbols."""

    CASES = [("gmsk_a", 40, "crc32", "none", "none", 77),
             ("gmsk_b", 64, "crc16", "hamming74", "golay2412", 91)]

    @pytest.fixture(scope="class")
    def fg(self):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        return dict(np.load(path))

    @pytest.mark.parametrize("tag,n,crc,fec0,fec1,seed", CASES)
    def test_tx_sample_exact_body(self, fg, tag, n, crc, fec0, fec1, seed):
        from liquid_dsp_tpu.framing.gmskframe import gmskframegen
        hdr = TestFlexFrameGolden._fill(8, seed)
        payload = TestFlexFrameGolden._fill(n, seed + 1)
        y = gmskframegen(hdr, payload, crc=crc, fec0=fec0, fec1=fec1)
        ref = fg[tag]
        k, m = 2, 3
        body = int(fg[tag + "_len"][0]) - 2 * m * k
        assert len(y) == int(fg[tag + "_len"][0])
        assert np.abs(y[:body] - ref[:body]).max() < 1e-4

    @pytest.mark.parametrize("tag,n,crc,fec0,fec1,seed", CASES)
    def test_sync_decodes_reference_tx(self, fg, tag, n, crc, fec0, fec1,
                                       seed):
        from liquid_dsp_tpu.framing.gmskframe import gmskframesync
        hdr = TestFlexFrameGolden._fill(8, seed)
        payload = TestFlexFrameGolden._fill(n, seed + 1)
        rl = int(fg[tag + "_len"][0])
        x = np.concatenate([np.zeros(40, np.complex64), fg[tag][:rl],
                            np.zeros(40, np.complex64)])
        res = gmskframesync(x)
        assert res.detected and res.header_ok and res.crc_ok
        assert np.array_equal(res.header, hdr)
        assert np.array_equal(res.payload, payload)


class TestOFDMFlexFrameGolden:
    """Wire interop with the compiled reference (offg/ofdm cases in
    tools/gen_flexframe_golden.py).  The last OFDM symbol of the header
    block and of the payload block carry random pad symbols in the
    reference (ofdmflexframegen.c:620-626) and are excluded from the
    sample comparison."""

    CASES = [("offg_a", 64, "crc32", "none", "golay2412", "qpsk", 101),
             ("offg_b", 40, "crc16", "hamming128", "none", "qam16", 113)]

    @pytest.fixture(scope="class")
    def fg(self):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        return dict(np.load(path))

    def test_raw_ofdm_layer_sample_exact(self, fg):
        from liquid_dsp_tpu.multichannel.ofdm import (
            ofdm_params, ofdm_generate_frame, SCTYPE_DATA)
        par = ofdm_params(64, 16)
        assert np.array_equal(np.asarray(par.p),
                              np.real(fg["ofdm_sct_64"]).astype(int))
        state = [123]

        def nxt():
            state[0] = (state[0] * 1103515245 + 12345) & 0xFFFFFFFF
            return ((state[0] >> 16) & 0xFF) / 127.5 - 1.0

        p = np.asarray(par.p)
        data = [[nxt() + 1j * nxt() for i in range(64)
                 if p[i] == SCTYPE_DATA] for _ in range(3)]
        y = ofdm_generate_frame(par, np.asarray(data, np.complex64))
        ref = np.concatenate([fg[f"ofdm_{t}_64_16"] for t in
                              ("s0a", "s0b", "s1", "d0", "d1", "d2")])
        assert np.abs(y - ref).max() < 1e-5

    @pytest.mark.parametrize("tag,n,crc,fec0,fec1,ms,seed", CASES)
    def test_tx_sample_exact_nonpad(self, fg, tag, n, crc, fec0, fec1, ms,
                                    seed):
        from liquid_dsp_tpu.framing.ofdmflexframe import ofdmflexframegen
        from liquid_dsp_tpu.multichannel.ofdm import ofdm_params
        hdr = TestFlexFrameGolden._fill(8, seed)
        payload = TestFlexFrameGolden._fill(n, seed + 1)
        y = ofdmflexframegen(hdr, payload, M=64, cp_len=16, crc=crc,
                             fec0=fec0, fec1=fec1, ms=ms)
        ref = fg[tag]
        assert len(y) == len(ref)
        par = ofdm_params(64, 16)
        from liquid_dsp_tpu.framing.ofdmflexframe import _frame_geometry
        h_syms, p_syms, nh, npd = _frame_geometry(par, n, crc, fec0, fec1,
                                                  ms)
        step = 64 + 16
        n_sym = len(ref) // step
        pad = {3 + nh - 1, 3 + nh + npd - 1}  # last header/payload symbol
        for i in range(n_sym):
            if i in pad:
                continue
            d = np.abs(y[i * step:(i + 1) * step] -
                       ref[i * step:(i + 1) * step]).max()
            assert d < 1e-5, (i, d)

    @pytest.mark.parametrize("tag,n,crc,fec0,fec1,ms,seed", CASES)
    def test_sync_decodes_reference_tx(self, fg, tag, n, crc, fec0, fec1,
                                       ms, seed):
        from liquid_dsp_tpu.framing.ofdmflexframe import ofdmflexframesync
        hdr = TestFlexFrameGolden._fill(8, seed)
        payload = TestFlexFrameGolden._fill(n, seed + 1)
        x = np.concatenate([np.zeros(30, np.complex64), fg[tag],
                            np.zeros(30, np.complex64)])
        res = ofdmflexframesync(x, M=64, cp_len=16)
        assert res.detected and res.header_ok and res.crc_ok
        assert np.array_equal(res.header, hdr)
        assert np.array_equal(res.payload, payload)
        assert res.ms == ms


class TestBPacketGolden:
    """bpacketgen output is byte-exact vs the compiled reference, and
    bpacketsync finds/decodes reference packets at arbitrary bit
    offsets (bpkt cases in tools/gen_flexframe_golden.py)."""

    CASES = [(0, 32, "crc32", "none", "none"),
             (1, 50, "crc16", "hamming74", "rep3")]

    @pytest.fixture(scope="class")
    def fg(self):
        import pathlib
        path = pathlib.Path(__file__).parent / "golden/flexframe_golden.npz"
        if not path.exists():
            pytest.skip("flexframe_golden.npz not generated")
        return dict(np.load(path))

    @pytest.mark.parametrize("ci,n,crc,fec0,fec1", CASES)
    def test_encode_byte_exact(self, fg, ci, n, crc, fec0, fec1):
        from liquid_dsp_tpu.framing.bpacket import bpacketgen
        payload = TestFlexFrameGolden._fill(n, 131 + ci)
        mine = bpacketgen(payload, crc=crc, fec0=fec0, fec1=fec1)
        ref = np.real(fg[f"bpkt_{ci}"]).astype(np.uint8)
        assert np.array_equal(mine, ref)

    @pytest.mark.parametrize("ci,n,crc,fec0,fec1", CASES)
    @pytest.mark.parametrize("shift", [0, 3, 7])
    def test_sync_decodes_reference_at_bit_offset(self, fg, ci, n, crc,
                                                  fec0, fec1, shift):
        from liquid_dsp_tpu.framing.bpacket import bpacketsync
        from liquid_dsp_tpu.fec.block import unpack_bits, pack_bits
        payload = TestFlexFrameGolden._fill(n, 131 + ci)
        ref = np.real(fg[f"bpkt_{ci}"]).astype(np.uint8)
        bits = np.concatenate([np.zeros(shift, np.uint8),
                               unpack_bits(ref),
                               np.zeros((8 - shift) % 8 + 8, np.uint8)])
        res = bpacketsync(pack_bits(bits))
        assert res.found and res.crc_ok
        assert np.array_equal(res.payload, payload)


class TestBidirectionalInterop:
    """The REFERENCE library's own synchronizers decode frames assembled
    by THIS framework (tools/verify_interop_rx.py compiles reference-C
    receivers and feeds them our TX samples)."""

    @pytest.mark.slow
    def test_reference_rx_decodes_our_tx(self):
        import pathlib
        import subprocess
        import sys as _sys
        if not pathlib.Path("/root/reference").exists():
            pytest.skip("reference tree not mounted")
        tool = pathlib.Path(__file__).parent.parent / \
            "tools/verify_interop_rx.py"
        r = subprocess.run(
            [_sys.executable, str(tool)], capture_output=True, text=True,
            timeout=560, env={**__import__("os").environ,
                              "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, r.stdout + r.stderr
        assert "all reference receivers decode" in r.stdout
