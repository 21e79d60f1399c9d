"""Symbol timing recovery from a stream with an unknown sampling phase
(reference symsync_crcf_example.c)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import os
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from liquid_dsp_tpu.modem import constellation, modulate
from liquid_dsp_tpu.ops.fir import firinterp
from liquid_dsp_tpu.design.firdes import firdes_prototype
from liquid_dsp_tpu.ops.symsync import symsync

rng = np.random.default_rng(0)
k, m, beta = 2, 7, 0.3
n_sym = 2000
table = constellation("qpsk")
s = np.asarray(modulate(table, jnp.asarray(rng.integers(0, 4, n_sym))))
tx = firinterp(k, firdes_prototype("arkaiser", k, m, beta))
x, _ = tx(jnp.asarray(s.astype(np.complex64)), batch_shape=())
# fractional timing offset: delay by an "unknown" 0.37 samples (freq domain)
x = np.asarray(x)
X = np.fft.fft(x)
w = np.fft.fftfreq(len(x))
x = np.fft.ifft(X * np.exp(-2j * np.pi * w * 0.37)).astype(np.complex64)

q = symsync("arkaiser", k, m, beta, bw=0.02)
(sy, sv), _ = q(jnp.asarray(x), batch_shape=())
syms = np.asarray(sy)[np.asarray(sv)]
tail = syms[-500:]
rms_err = np.sqrt(np.mean((np.abs(tail) - np.mean(np.abs(tail))) ** 2))
print(f"{len(x)} samples -> {len(syms)} symbols")
print(f"recovered constellation radius spread: {rms_err:.4f} "
      f"(clean lock << 0.1)")
