"""Native C kernel tests: byte-exact agreement with the Python
implementations (which are themselves golden-tested against the
reference)."""
import numpy as np
import pytest

from liquid_dsp_tpu import native


pytestmark = pytest.mark.skipif(native.lib is None,
                                reason="native library unavailable")


def test_crc_matches_python():
    from liquid_dsp_tpu.fec.crc import crc_generate_key, _PARAMS, _reflect
    rng = np.random.default_rng(0)
    for scheme, (poly, width) in _PARAMS.items():
        for n in [0, 1, 7, 100, 1000]:
            msg = rng.integers(0, 256, n).astype(np.uint8)
            rpoly = _reflect(poly, width)
            mask = (1 << width) - 1
            k_native = native.crc_key(msg, rpoly, mask)
            # force the python path
            key = 0xFFFFFFFF
            for b in msg.tolist():
                key ^= b
                for _ in range(8):
                    key = (key >> 1) ^ (rpoly if key & 1 else 0)
            k_py = (~key) & mask
            assert k_native == k_py, (scheme, n)


def test_interleave_matches_golden():
    # full interleaver (routed through native passes) still matches the
    # reference golden vectors
    import pathlib
    from liquid_dsp_tpu.fec.interleave import interleave, deinterleave
    path = pathlib.Path(__file__).parent / "golden/fec_golden.npz"
    fg = dict(np.load(path))
    for n in [4, 8, 16, 64, 100]:
        x = fg[f"intlv_in_{n}"].astype(np.uint8)
        np.testing.assert_array_equal(
            interleave(x), fg[f"intlv_out_{n}"].astype(np.uint8))
        np.testing.assert_array_equal(deinterleave(interleave(x)), x)


def test_msequence_matches_python():
    from liquid_dsp_tpu.utils.sequence import MSequence
    for m, g_raw in [(7, 0x0089), (6, 0x6D)]:
        ms = MSequence(m, g_raw, 1)
        py_bits = np.asarray([ms.advance() for _ in range(200)], np.uint8)
        ms2 = MSequence(m, g_raw, 1)
        nat = native.msequence_bits(m, ms2.g, ms2.v, 200)
        np.testing.assert_array_equal(nat, py_bits)


def test_crc_speed_sanity():
    import time
    from liquid_dsp_tpu.fec.crc import crc_generate_key
    rng = np.random.default_rng(1)
    msg = rng.integers(0, 256, 100_000).astype(np.uint8)
    t0 = time.perf_counter()
    crc_generate_key("crc32", msg)
    dt = time.perf_counter() - t0
    # native path should chew 100kB in well under 50 ms
    assert dt < 0.05, dt
