"""Genetic-algorithm search solving a 0/1 knapsack
(reference gasearch_knapsack_example.c: binary chromosome, utility =
packed value, infeasible solutions penalized)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.utils.optim import gasearch

rng = np.random.default_rng(11)
n_items = 16
weights = rng.uniform(0.2, 2.0, n_items)
values = rng.uniform(0.5, 3.0, n_items)
capacity = 0.35 * weights.sum()


def utility(genes):
    # continuous genes in [0,1] thresholded to a bit chromosome
    pick = np.asarray(genes) > 0.5
    w = weights[pick].sum()
    v = values[pick].sum()
    # infeasible packings are strictly worse than any feasible one
    return v if w <= capacity else capacity - w


best, u_best = gasearch(utility, [(0.0, 1.0)] * n_items, n_iters=200,
                        population=48, mutation_rate=0.15, minimize=False,
                        seed=2)
pick = np.asarray(best) > 0.5
print(f"{n_items} items, capacity {capacity:.2f}")
print("picked items :", np.flatnonzero(pick).tolist())
print(f"packed weight: {weights[pick].sum():.2f}")
print(f"packed value : {values[pick].sum():.2f} (utility {u_best:.2f})")

# sanity: feasible and clearly better than a random feasible packing
assert weights[pick].sum() <= capacity + 1e-9
greedy = np.argsort(values / weights)[::-1]
w = v = 0.0
for i in greedy:
    if w + weights[i] <= capacity:
        w += weights[i]
        v += values[i]
print(f"greedy bound : {v:.2f}")
assert values[pick].sum() > 0.8 * v
