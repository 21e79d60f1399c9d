"""Experiment: algebraic chain fusion of the headline bench chain.

mix(dphi) -> FIR64 -> FIR57 -> halfband decim(2) -> 0.5 gain
  ==  mix(dphi) -> strided-2 FIR with C = h64 (*) h57 (*) (0.5*hb), d=+1

Derivation: adjacent LTI stages convolve; the halfband decimator is the
full 4m+1-tap prototype evaluated at x[2i+1-j] (its even taps vanish,
center tap = 1 gives the delayed odd branch), so the composite is a
single strided FIR with a +1 input offset handled by a shortened carry.

Modes:
  --check   CPU sample-exactness vs the unfused public-API chain
  --tpu     throughput of fused variants on the real chip (planar I/O)
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def composite_taps():
    from liquid_dsp_tpu.design.firdes import firdes_kaiser
    from liquid_dsp_tpu.ops.resample import halfband_taps
    h64 = firdes_kaiser(64, 0.2, 60.0).astype(np.float64)
    h57 = firdes_kaiser(57, 0.3, 60.0).astype(np.float64)
    # msresamp(0.5) resolves to msresamp2('decim', 1, fc=0.4): stage
    # fc=0.2, ft=0.15 -> Kaiser h_len 25 -> m=6; zeta=0.5 gain after
    hb = halfband_taps(6, 0.0, 60.0).astype(np.float64) * 0.5
    C = np.convolve(np.convolve(h64, h57), hb)
    return C.astype(np.float32)  # length 64+57+25-2 = 144, delay d=+1


def check_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench import build_chain

    proc = build_chain()
    rng = np.random.default_rng(0)
    B, T = 2, 4096
    x = (rng.standard_normal((B, T)) + 1j * rng.standard_normal((B, T))
         ).astype(np.complex64)

    carry = proc.init(batch_shape=(B,))
    y_ref, carry = proc.apply(proc.params, carry, jnp.asarray(x))
    y_ref2, _ = proc.apply(proc.params, carry, jnp.asarray(x))
    y_ref = np.asarray(y_ref)
    y_ref2 = np.asarray(y_ref2)

    # fused: mix -> strided-2 FIR(C) with d=+1 via shortened carry
    C = composite_taps()
    L = len(C)
    d = 1
    H = L - 1 - d

    def fused_block(xb, theta0, hist):
        t = np.arange(xb.shape[-1])
        m = xb * np.exp(-1j * (theta0 + 0.125 * t)).astype(np.complex64)
        xp = np.concatenate([hist, m], axis=-1)
        # y[n] = sum_j C[j] xp[2n + (L-1) - j] -> x[2n - j + d]
        ys = []
        for n in range(xb.shape[-1] // 2):
            seg = xp[..., 2 * n: 2 * n + L]
            ys.append(seg @ C[::-1])
        y = np.stack(ys, axis=-1)
        theta1 = (theta0 + 0.125 * xb.shape[-1]) % (2 * np.pi)
        return y.astype(np.complex64), theta1, xp[..., xp.shape[-1] - H:]

    hist = np.zeros((B, H), np.complex64)
    y1, th, hist = fused_block(x, 0.0, hist)
    y2, th, hist = fused_block(x, th, hist)

    # fp32 rounding differs between 3 cascaded convs and 1 fused conv;
    # compare relative to output RMS
    rms = np.sqrt(np.mean(np.abs(y_ref) ** 2))
    e1 = np.abs(y1 - y_ref).max() / rms
    e2 = np.abs(y2 - y_ref2).max() / rms
    print(f"block1 rel err {e1:.3e}  block2 (streaming) rel err {e2:.3e}")
    assert e1 < 1e-3 and e2 < 1e-3, "fusion mismatch"
    print("check-ok")


def tpu_perf():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from bench import timed_throughput
    from liquid_dsp_tpu.ops.fir import fir_apply_matmul, fir_apply

    C = composite_taps()
    L = len(C)
    d = 1
    H = L - 1 - d
    Cj = jnp.asarray(C)
    B, T = 16, 1 << 17
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))

    def mix(r, i, theta0):
        t = jnp.arange(T, dtype=jnp.float32)
        ph = theta0 + 0.125 * t
        c, s = jnp.cos(ph), jnp.sin(ph)
        return r * c + i * s, i * c - r * s

    # variant B: full-rate banded matmul then slice [1::2] (d=+1 absorbed
    # into the slice offset)
    @jax.jit
    def step_full(theta0, r, i, chk):
        mr, mi = mix(r, i, theta0)
        z = jnp.zeros((B, L - 1), jnp.float32)
        yr, _ = fir_apply_matmul(Cj, z, mr, tile=256)
        yi, _ = fir_apply_matmul(Cj, z, mi, tile=256)
        yr, yi = yr[..., 1::2], yi[..., 1::2]
        return (theta0 + 0.125 * T) % (2 * np.pi), \
            chk + jnp.sum(yr * yr + yi * yi)

    # variant C: strided lax.conv
    @jax.jit
    def step_conv(theta0, r, i, chk):
        mr, mi = mix(r, i, theta0)
        z = jnp.zeros((B, H), jnp.float32)
        yr, _ = fir_apply(Cj, z, mr, stride=2)
        yi, _ = fir_apply(Cj, z, mi, stride=2)
        return (theta0 + 0.125 * T) % (2 * np.pi), \
            chk + jnp.sum(yr * yr + yi * yi)

    # variant D: polyphase - two stride-1 banded matmuls on the even/odd
    # input phases.  y[n] = sum_j C[j] x[2n-j+1]; j=2k even -> x odd
    # phase, j=2k+1 -> x even phase:
    #   y[n] = sum_k C[2k] xo[n-k] + sum_k C[2k+1] xe[n-k]
    Ce = jnp.asarray(C[1::2].copy())   # taps on even phase
    Co = jnp.asarray(np.pad(C[0::2], (0, (len(C[1::2]) - len(C[0::2])) if len(C[0::2]) < len(C[1::2]) else 0)))

    @jax.jit
    def step_poly(theta0, r, i, chk):
        mr, mi = mix(r, i, theta0)
        # phases: xe = x[0::2], xo = x[1::2]; stack planes+phases on batch
        stk = jnp.stack([mr[..., 0::2], mi[..., 0::2],
                         mr[..., 1::2], mi[..., 1::2]], axis=0)
        Le = Ce.shape[-1]
        z = jnp.zeros(stk.shape[:-1] + (Le - 1,), jnp.float32)
        ye, _ = fir_apply_matmul(Ce, z[:2], stk[:2], tile=256)
        yo, _ = fir_apply_matmul(Co, z[2:], stk[2:], tile=256)
        y = ye + yo
        return (theta0 + 0.125 * T) % (2 * np.pi), \
            chk + jnp.sum(y * y)

    for name, step in [("full+slice", step_full), ("strided-conv", step_conv),
                       ("polyphase", step_poly)]:
        th = jnp.float32(0)
        chk = jnp.float32(0)
        th, chk = step(th, xr, xi, chk)
        float(np.asarray(chk))

        def run_trials(n):
            t0 = time.perf_counter()
            th = jnp.float32(0)
            chk = jnp.float32(0)
            for _ in range(n):
                th, chk = step(th, xr, xi, chk)
            float(np.asarray(chk))
            return time.perf_counter() - t0

        msps = timed_throughput(run_trials, B * T) / 1e6
        print(f"{name}: {msps:.1f} Msps")


if __name__ == "__main__":
    if "--check" in sys.argv:
        check_cpu()
    else:
        tpu_perf()
