"""Experiment: where do the Msps go between complex-interleaved and
structure-of-arrays (planes) execution of the fused headline chain?

Variants (all same math, B=16, T=128k):
  A  complex end-to-end: complex mix -> fused FIR (internal plane stack)
  B  planes mix -> fused FIR matmul per plane -> checksum (no complex ever)
  C  complex mix -> planes split -> matmul -> checksum (isolates the mix)
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from bench import timed_throughput, build_chain
    from liquid_dsp_tpu.ops.fir import fir_apply_matmul

    proc = build_chain()  # fused on TPU
    B, T = 16, 1 << 17
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    params = proc.params
    carry0 = jax.jit(lambda: proc.init(batch_shape=(B,)))()

    @jax.jit
    def step_A(params, c, r, i):
        x = lax.complex(r, i)
        y, c2 = proc.apply(params, c, x)
        return c2, jnp.sum(jnp.real(y) ** 2 + jnp.imag(y) ** 2)

    # fused taps from the public chain metadata
    fstage = proc.children[1] if proc.children else proc
    C = fstage.lti.taps
    d, down = fstage.lti.d, fstage.lti.down
    Cj = jnp.asarray(C)
    L = len(C)
    dphi = 0.125

    def mix_planes(r, i, theta0):
        t = jnp.arange(T, dtype=jnp.float32)
        ph = theta0 + dphi * t
        c, s = jnp.cos(ph), jnp.sin(ph)
        return r * c + i * s, i * c - r * s

    @jax.jit
    def step_B(theta0, r, i, chk):
        mr, mi = mix_planes(r, i, theta0)
        z = jnp.zeros((2, B, L - 1), jnp.float32)
        y, _ = fir_apply_matmul(Cj, z, jnp.stack([mr, mi]), tile=256)
        y = y[..., d::down]
        return (theta0 + dphi * T) % (2 * np.pi), chk + jnp.sum(y * y)

    @jax.jit
    def step_C(theta0, r, i, chk):
        t = jnp.arange(T, dtype=jnp.float32)
        osc = jnp.exp(lax.complex(jnp.float32(0), -(theta0 + dphi * t)))
        m = lax.complex(r, i) * osc
        z = jnp.zeros((2, B, L - 1), jnp.float32)
        y, _ = fir_apply_matmul(Cj, z,
                                jnp.stack([jnp.real(m), jnp.imag(m)]),
                                tile=256)
        y = y[..., d::down]
        return (theta0 + dphi * T) % (2 * np.pi), chk + jnp.sum(y * y)

    def run(name, fn, stateful):
        if stateful:
            c, chk = fn(params, carry0, xr, xi)
            float(np.asarray(chk))

            def trials(n):
                t0 = time.perf_counter()
                c = carry0
                for _ in range(n):
                    c, chk = fn(params, c, xr, xi)
                float(np.asarray(chk))
                return time.perf_counter() - t0
        else:
            th, chk = fn(jnp.float32(0), xr, xi, jnp.float32(0))
            float(np.asarray(chk))

            def trials(n):
                t0 = time.perf_counter()
                th, chk = jnp.float32(0), jnp.float32(0)
                for _ in range(n):
                    th, chk = fn(th, xr, xi, chk)
                float(np.asarray(chk))
                return time.perf_counter() - t0

        msps = timed_throughput(trials, B * T) / 1e6
        print(f"{name}: {msps:.1f} Msps")

    run("A complex chain  ", step_A, True)
    run("B planes all-way ", step_B, False)
    run("C complex mix    ", step_C, False)


if __name__ == "__main__":
    main()
