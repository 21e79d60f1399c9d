"""FM modulation/demodulation loopback with AWGN: modulate a multi-tone
message, pass through a noisy channel, demodulate, and report the
recovered-message RMS error (reference freqmodem_example.c)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import os
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from liquid_dsp_tpu.modem.analog import freq_modulator, freq_demodulator
from liquid_dsp_tpu.ops.channel import channel

kf, n, snr_db = 0.1, 4096, 30.0
t = np.arange(n)
msg = (0.6 * np.cos(2 * np.pi * 0.013 * t)
       + 0.3 * np.cos(2 * np.pi * 0.037 * t)).astype(np.float32)

fm = freq_modulator(kf)
x, _ = fm(jnp.asarray(msg), batch_shape=())

ch = channel(snr_db=snr_db, seed=7)
y, _ = ch(jnp.asarray(np.asarray(x)), batch_shape=())

dem = freq_demodulator(kf)
m_hat, _ = dem(jnp.asarray(np.asarray(y)), batch_shape=())
m_hat = np.asarray(m_hat)

# first sample has no phase history; compare the steady region
err = m_hat[1:] - msg[1:]
print(f"FM loopback, kf={kf}, SNR={snr_db:.0f} dB, {n} samples")
print(f"recovered message RMS error: {np.sqrt(np.mean(err ** 2)):.4f} "
      f"(message RMS {np.sqrt(np.mean(msg ** 2)):.3f})")
