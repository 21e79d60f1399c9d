"""Gradient search fitting a parametric model to noisy data
(reference gradsearch_datafit_example.c: fit gauss y = exp(-(x-m)^2/s^2))."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.utils.optim import gradsearch, qnsearch

rng = np.random.default_rng(3)
x = np.linspace(-2, 2, 41)
m_true, s_true, g_true = 0.35, 0.6, 1.2
y = g_true * np.exp(-((x - m_true) ** 2) / s_true ** 2)
y += 0.02 * rng.standard_normal(x.size)


def rmse(p):
    m, s, g = p
    yh = g * np.exp(-((x - m) ** 2) / max(s, 1e-6) ** 2)
    return float(np.sqrt(np.mean((yh - y) ** 2)))


p0 = [0.0, 1.0, 1.0]
p_gs, u_gs = gradsearch(rmse, p0, n_iters=2000, gamma=0.01)
p_qn, u_qn = qnsearch(rmse, p0, n_iters=200)
print(f"true params  : mean {m_true}, std {s_true}, gain {g_true}")
print(f"gradsearch   : mean {p_gs[0]:+.3f}, std {p_gs[1]:+.3f}, "
      f"gain {p_gs[2]:+.3f}, rmse {u_gs:.4f}")
print(f"qnsearch     : mean {p_qn[0]:+.3f}, std {p_qn[1]:+.3f}, "
      f"gain {p_qn[2]:+.3f}, rmse {u_qn:.4f}")
best = min(u_gs, u_qn)
assert best < 0.05, best
