"""Bisect the gap between bench planar_main (~1700 Msps) and the raw
fused experiment (~2700 Msps).  Variants remove one difference at a time:

  D  exact bench planar step (params as args, per-batch theta carry)
  E  D but params CLOSED OVER (taps become XLA constants)
  F  E but scalar theta (phases [T] broadcast, no angle-addition planes)
  G  F but no carry threading (zero history each step, like exp_fuse)
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from bench import timed_throughput, build_chain
    from liquid_dsp_tpu import planar
    from liquid_dsp_tpu.ops.fir import fir_apply_matmul

    B, T = 16, 1 << 17
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))

    proc = planar(build_chain())
    params = proc.params
    carry0 = jax.jit(lambda: proc.init(batch_shape=(B,)))()

    @jax.jit
    def step_D(params, c, r, i):
        (yr, yi), c2 = proc.apply(params, c, (r, i))
        return c2, jnp.sum(yr * yr + yi * yi)

    @jax.jit
    def step_E(c, r, i):
        (yr, yi), c2 = proc.apply(params, c, (r, i))
        return c2, jnp.sum(yr * yr + yi * yi)

    # F/G: hand-rolled with scalar theta
    fstage = build_chain().children[1]
    C = fstage.lti.taps
    d, down = fstage.lti.d, fstage.lti.down
    Cj = jnp.asarray(C)
    L = len(C)
    dphi = 0.125

    def mix(r, i, theta0):
        t = jnp.arange(T, dtype=jnp.float32)
        ph = theta0 + dphi * t
        c, s = jnp.cos(ph), jnp.sin(ph)
        return r * c + i * s, i * c - r * s

    @jax.jit
    def step_F(carry, r, i):
        theta0, cr, ci = carry
        mr, mi = mix(r, i, theta0)
        yr, cr2 = fir_apply_matmul(Cj, cr, mr, tile=256)
        yi, ci2 = fir_apply_matmul(Cj, ci, mi, tile=256)
        yr, yi = yr[..., d::down], yi[..., d::down]
        th2 = (theta0 + dphi * T) % (2 * np.pi)
        return (th2, cr2, ci2), jnp.sum(yr * yr + yi * yi)

    z = jnp.zeros((B, L - 1), jnp.float32)

    @jax.jit
    def step_G(theta0, r, i, chk):
        mr, mi = mix(r, i, theta0)
        yr, _ = fir_apply_matmul(Cj, z, mr, tile=256)
        yi, _ = fir_apply_matmul(Cj, z, mi, tile=256)
        yr, yi = yr[..., d::down], yi[..., d::down]
        return (theta0 + dphi * T) % (2 * np.pi), \
            chk + jnp.sum(yr * yr + yi * yi)

    def meas(name, trials):
        msps = timed_throughput(trials, B * T) / 1e6
        print(f"{name}: {msps:.1f} Msps")

    c, chk = step_D(params, carry0, xr, xi)
    float(np.asarray(chk))

    def tD(n):
        t0 = time.perf_counter()
        c = carry0
        for _ in range(n):
            c, chk = step_D(params, c, xr, xi)
        float(np.asarray(chk))
        return time.perf_counter() - t0
    meas("D bench-exact    ", tD)

    c, chk = step_E(carry0, xr, xi)
    float(np.asarray(chk))

    def tE(n):
        t0 = time.perf_counter()
        c = carry0
        for _ in range(n):
            c, chk = step_E(c, xr, xi)
        float(np.asarray(chk))
        return time.perf_counter() - t0
    meas("E closed-over    ", tE)

    cF0 = (jnp.float32(0), z, z)
    c, chk = step_F(cF0, xr, xi)
    float(np.asarray(chk))

    def tF(n):
        t0 = time.perf_counter()
        c = cF0
        for _ in range(n):
            c, chk = step_F(c, xr, xi)
        float(np.asarray(chk))
        return time.perf_counter() - t0
    meas("F scalar-theta   ", tF)

    th, chk = step_G(jnp.float32(0), xr, xi, jnp.float32(0))
    float(np.asarray(chk))

    def tG(n):
        t0 = time.perf_counter()
        th, chk = jnp.float32(0), jnp.float32(0)
        for _ in range(n):
            th, chk = step_G(th, xr, xi, chk)
        float(np.asarray(chk))
        return time.perf_counter() - t0
    meas("G stateless      ", tG)


if __name__ == "__main__":
    main()
