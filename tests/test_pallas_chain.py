"""Fused Pallas mix+FIR+decim kernel (kernel_fuse): streaming output ==
the planar fused XLA chain, including carries across block boundaries.
Runs in interpret mode on CPU; the real-hardware path is identical code
with interpret=False (benched by tools/exp_pallas_fused.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from liquid_dsp_tpu import chain, fuse, kernel_fuse, planar
from liquid_dsp_tpu.design.firdes import firdes_kaiser
from liquid_dsp_tpu.ops.fir import firfilt
from liquid_dsp_tpu.ops.nco import nco
from liquid_dsp_tpu.ops.resample import msresamp


def _headline():
    return fuse(chain(nco(dphi=0.125, direction="down"),
                      firfilt(firdes_kaiser(64, 0.2, 60.0)),
                      firfilt(firdes_kaiser(57, 0.3, 60.0)),
                      msresamp(0.5, 60.0)))


def _run_planar(proc, blocks, batch):
    p = planar(proc)
    params = jax.tree.map(np.asarray, p.params)
    carry = p.init(batch_shape=batch)
    outs = []
    for xb in blocks:
        (yr, yi), carry = p.apply(params, carry,
                                  (jnp.asarray(xb.real.copy()),
                                   jnp.asarray(xb.imag.copy())))
        outs.append(np.asarray(yr) + 1j * np.asarray(yi))
    return np.concatenate(outs, axis=-1)


def test_kernel_matches_fused_planar_streaming():
    fused = _headline()
    k = kernel_fuse(fused)
    assert k is not fused, "headline pattern must match kernel_fuse"
    rng = np.random.default_rng(0)
    B, T, nblk = 8, 2048, 3
    blocks = [(rng.standard_normal((B, T)) +
               1j * rng.standard_normal((B, T))).astype(np.complex64)
              for _ in range(nblk)]
    y_ref = _run_planar(fused, blocks, (B,))
    y_k = _run_planar(k, blocks, (B,))
    assert y_k.shape == y_ref.shape
    rms = np.sqrt(np.mean(np.abs(y_ref) ** 2))
    assert np.abs(y_k - y_ref).max() / rms < 2e-4


def test_kernel_large_tile_and_mixed_blocks():
    # T=4096 engages the nsub=16 tile; a following 2048 block must
    # continue the stream correctly through the carry (different tile
    # choice per block, same state contract)
    fused = _headline()
    k = kernel_fuse(fused)
    rng = np.random.default_rng(2)
    B = 8
    blocks = [(rng.standard_normal((B, T)) +
               1j * rng.standard_normal((B, T))).astype(np.complex64)
              for T in (4096, 2048, 4096)]
    y_ref = _run_planar(fused, blocks, (B,))
    y_k = _run_planar(k, blocks, (B,))
    assert y_k.shape == y_ref.shape
    rms = np.sqrt(np.mean(np.abs(y_ref) ** 2))
    assert np.abs(y_k - y_ref).max() / rms < 2e-4


def test_kernel_complex_entry_point():
    k = kernel_fuse(_headline())
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((8, 2048)) +
         1j * rng.standard_normal((8, 2048))).astype(np.complex64)
    y, c = k(jnp.asarray(x), batch_shape=(8,))
    assert np.asarray(y).shape == (8, 1024)
    assert np.iscomplexobj(np.asarray(y))


def test_kernel_bf16_planes_streaming():
    # bfloat16 input/output planes: same kernel, HBM layout narrowed
    # (arithmetic stays f32 in VMEM).  Error budget: bf16 quantization
    # of input and output, ~2^-8 relative.  Output narrowing is an
    # EXPLICIT opt-in (out_dtype="input"); the default writes f32.
    fused = _headline()
    k = kernel_fuse(fused, out_dtype="input")
    p = planar(k)
    rng = np.random.default_rng(3)
    B, T, nblk = 8, 2048, 3
    blocks = [(rng.standard_normal((B, T)) +
               1j * rng.standard_normal((B, T))).astype(np.complex64)
              for _ in range(nblk)]
    y_ref = _run_planar(fused, blocks, (B,))
    carry = p.init(batch_shape=(B,))
    outs = []
    for xb in blocks:
        r = jnp.asarray(xb.real.copy()).astype(jnp.bfloat16)
        i = jnp.asarray(xb.imag.copy()).astype(jnp.bfloat16)
        (yr, yi), carry = p.apply((), carry, (r, i))
        assert yr.dtype == jnp.bfloat16 and yi.dtype == jnp.bfloat16
        outs.append(np.asarray(yr.astype(jnp.float32)) +
                    1j * np.asarray(yi.astype(jnp.float32)))
    y_k = np.concatenate(outs, axis=-1)
    assert y_k.shape == y_ref.shape
    rms = np.sqrt(np.mean(np.abs(y_ref) ** 2))
    assert np.abs(y_k - y_ref).max() / rms < 3e-2

    # default policy: bf16 INPUT does not silently narrow the output —
    # kernel_fuse without out_dtype emits float32 planes
    pd = planar(kernel_fuse(fused))
    cd = pd.init(batch_shape=(B,))
    r = jnp.asarray(blocks[0].real.copy()).astype(jnp.bfloat16)
    i = jnp.asarray(blocks[0].imag.copy()).astype(jnp.bfloat16)
    (yr, yi), _ = pd.apply((), cd, (r, i))
    assert yr.dtype == jnp.float32 and yi.dtype == jnp.float32


def test_kernel_bf16_exact_for_8bit_captures():
    # cu8 sample levels (k - 127.5)/127.5 must survive the f32->bf16
    # cast without rounding (the claim behind the bf16 fast path)
    k = np.arange(256, dtype=np.float64)
    lv = ((k - 127.5) / 127.5).astype(np.float32)
    as_bf = jnp.asarray(lv).astype(jnp.bfloat16).astype(jnp.float32)
    # levels are half-integers scaled by 1/127.5: bf16's 8 significand
    # bits hold k - 127.5 exactly; the /127.5 rounds once in f32 and
    # that SAME f32 value must round-trip bf16 unchanged
    exact = np.asarray(jnp.asarray((k - 127.5).astype(np.float32))
                       .astype(jnp.bfloat16).astype(jnp.float32))
    assert np.array_equal(exact, (k - 127.5).astype(np.float32))
    # and the normalized form is within one bf16 ulp of the f32 level
    assert np.abs(np.asarray(as_bf) - lv).max() <= 2.0 ** -8


def test_kernel_fuse_no_match_is_identity():
    p = chain(nco(dphi=0.125, direction="down", table=True),
              firfilt(firdes_kaiser(64, 0.2, 60.0)))
    assert kernel_fuse(p) is p          # table-mode NCO: no match
    q = firfilt(firdes_kaiser(64, 0.2, 60.0))
    assert kernel_fuse(q) is q          # single stage: no match
