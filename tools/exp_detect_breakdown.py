"""Decompose the detect-everywhere stage's TPU time: segment gather,
forward FFT, hypothesis IFFTs, magnitude+argmax — each timed cumulative
(value-verified, two-point scheme) so the binding stage is explicit.

Usage: python tools/exp_detect_breakdown.py [batch] [T]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import bench as bm
    from liquid_dsp_tpu.framing.frame64 import _detector_template
    from liquid_dsp_tpu.framing.stream_rx import (_DET_NFFT, _DET_HOP,
                                                  _detect_consts)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

    dc = _detect_consts(_detector_template())
    s_len, s2_sum = dc["s_len"], dc["s2_sum"]
    So_re, So_im = dc["So_re"], dc["So_im"]          # numpy [5, NFFT]
    n_seg = (T - _DET_NFFT) // _DET_HOP + 1
    starts = (np.arange(n_seg) * _DET_HOP).astype(np.int32)
    seg_idx = starts[:, None] + np.arange(_DET_NFFT)[None, :]

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((batch, T)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((batch, T)).astype(np.float32))

    def stage(level):
        @jax.jit
        def f(r, i):
            buf = lax.complex(r, i)
            segs = buf[:, jnp.asarray(seg_idx)]          # [B, n_seg, NFFT]
            if level == 0:
                return jnp.sum(jnp.abs(segs.real))
            Xf = jnp.fft.fft(segs, axis=-1)
            if level == 1:
                return jnp.sum(jnp.abs(Xf.real))
            So = lax.complex(jnp.asarray(So_re), jnp.asarray(So_im))
            R = jnp.fft.ifft(Xf[:, :, None, :] * jnp.conj(So)[None, None],
                             axis=-1) * _DET_NFFT       # [B,n_seg,5,NFFT]
            if level == 2:
                return jnp.sum(jnp.abs(R.real))
            x2 = jnp.sum(segs.real ** 2 + segs.imag ** 2, axis=-1)
            g0 = jnp.sqrt(jnp.maximum(x2, 1e-20) * (s_len / _DET_NFFT))
            g = 1.0 / (_DET_NFFT * g0 * np.sqrt(s2_sum))
            rxy = jnp.abs(R[..., :_DET_HOP]) * g[:, :, None, None]
            rxy_flat = rxy.reshape(batch, n_seg, -1)
            seg_arg = jnp.argmax(rxy_flat, axis=-1)
            seg_peak = jnp.take_along_axis(rxy_flat, seg_arg[..., None],
                                           axis=-1)[..., 0]
            return jnp.sum(seg_peak) + jnp.sum(seg_arg)
        return f

    names = ["gather only", "+fwd FFT", "+5 IFFTs", "+mag/argmax"]
    for lvl, name in enumerate(names):
        f = stage(lvl)
        float(np.asarray(f(xr, xi)))                     # compile+warm

        def run(n, f=f):
            t0 = time.perf_counter()
            chk = None
            for _ in range(n):
                chk = f(xr, xi)
            float(np.asarray(chk))
            return time.perf_counter() - t0

        msps = bm.timed_throughput(run, batch * T) / 1e6
        print(f"{name:14s} {msps:10.1f} Msps")




def matmul_variant():
    """Same rxy via an MXU banded-matmul correlation bank instead of
    FFT/IFFT: R_o[l] = sum_j x[l+j] conj(s_o)[j], s_o the carrier-
    hypothesis-modulated template (time-domain equivalent of the
    roll(S, off) spectra; linear == circular for l < hop since
    l + s_len <= NFFT)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    import bench as bm
    from liquid_dsp_tpu.framing.frame64 import _detector_template
    from liquid_dsp_tpu.framing.stream_rx import (_DET_NFFT, _DET_HOP,
                                                  _detect_consts)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

    s = _detector_template().astype(np.complex64)
    s_len = len(s)
    n_off = 5
    offs = np.arange(-2, 3)
    n = np.arange(s_len)
    # time-domain modulated templates [5, s_len] (UNconjugated: the
    # Rr/Ri combination below applies the conjugate)
    sconj = np.stack([s * np.exp(2j * np.pi * o * n / _DET_NFFT)
                      for o in offs])
    # banded correlation matrices [NFFT, 5*HOP]: col (o, l) has
    # sconj[o, j] at row l+j
    Br = np.zeros((_DET_NFFT, n_off * _DET_HOP), np.float32)
    Bi = np.zeros_like(Br)
    for o in range(n_off):
        for l in range(_DET_HOP):
            Br[l:l + s_len, o * _DET_HOP + l] = sconj[o].real
            Bi[l:l + s_len, o * _DET_HOP + l] = sconj[o].imag
    n_seg = (T - _DET_NFFT) // _DET_HOP + 1
    starts = (np.arange(n_seg) * _DET_HOP).astype(np.int32)
    seg_idx = starts[:, None] + np.arange(_DET_NFFT)[None, :]
    dc = _detect_consts(_detector_template())
    s2_sum = dc["s2_sum"]

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((batch, T)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((batch, T)).astype(np.float32))

    @jax.jit
    def f(r, i):
        Fr = r[:, jnp.asarray(seg_idx)]                 # [B, n_seg, NFFT]
        Fi = i[:, jnp.asarray(seg_idx)]
        Rr = Fr @ Br + Fi @ Bi                          # [B, n_seg, 5*HOP]
        Ri = Fi @ Br - Fr @ Bi
        x2 = jnp.sum(Fr ** 2 + Fi ** 2, axis=-1)
        g0 = jnp.sqrt(jnp.maximum(x2, 1e-20) * (s_len / _DET_NFFT))
        g = 1.0 / (_DET_NFFT * g0 * np.sqrt(s2_sum))
        rxy = jnp.sqrt(Rr ** 2 + Ri ** 2) * g[..., None]
        seg_arg = jnp.argmax(rxy, axis=-1)
        seg_peak = jnp.take_along_axis(rxy, seg_arg[..., None],
                                       axis=-1)[..., 0]
        return jnp.sum(seg_peak) + jnp.sum(seg_arg)

    float(np.asarray(f(xr, xi)))

    def run(ntr):
        t0 = time.perf_counter()
        chk = None
        for _ in range(ntr):
            chk = f(xr, xi)
        float(np.asarray(chk))
        return time.perf_counter() - t0

    msps = bm.timed_throughput(run, batch * T) / 1e6
    print(f"matmul bank    {msps:10.1f} Msps")


if __name__ == "__main__":
    main()
    matmul_variant()
