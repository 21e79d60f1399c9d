"""Optimization: gradient search, quasi-Newton search, genetic algorithm.

Reference analog (studied, not copied): reference src/optim/src/
gradsearch.c:30+ (finite-difference gradient descent with momentum),
qnsearch.c (quasi-Newton with numerical Hessian updates), gasearch.c /
chromosome.c (bit-string GA).

Host-side numpy utilities (design-time optimization, e.g. the rkaiser
filter search uses a 1-D variant).
"""
from __future__ import annotations

from typing import Callable

import numpy as np

__all__ = ["gradsearch", "qnsearch", "gasearch"]


def _numgrad(u: Callable, x: np.ndarray, dx: float) -> np.ndarray:
    g = np.zeros_like(x)
    f0 = u(x)
    for i in range(len(x)):
        xp = x.copy()
        xp[i] += dx
        g[i] = (u(xp) - f0) / dx
    return g


def gradsearch(u: Callable, x0, n_iters: int = 100, delta: float = 1e-6,
               gamma: float = 0.002, alpha: float = 0.1,
               minimize: bool = True):
    """Finite-difference gradient search with momentum (reference
    gradsearch defaults: delta 1e-6, gamma 2e-3, alpha 0.1).
    Returns (x_opt, u(x_opt))."""
    sign = 1.0 if minimize else -1.0
    x = np.array(x0, np.float64)
    v = np.zeros_like(x)
    gamma_t = gamma
    best = u(x)
    for _ in range(n_iters):
        g = _numgrad(u, x, delta)
        norm = np.linalg.norm(g)
        if norm < 1e-12:
            break
        v = alpha * v - sign * gamma_t * g / norm
        x = x + v
        f = u(x)
        if sign * f > sign * best:
            gamma_t *= 0.99  # shrink step when not improving
        best = min(best, f) if minimize else max(best, f)
    return x, u(x)


def qnsearch(u: Callable, x0, n_iters: int = 60, delta: float = 1e-5,
             minimize: bool = True):
    """Quasi-Newton (BFGS-style) search with numerical gradients
    (reference qnsearch.c)."""
    sign = 1.0 if minimize else -1.0
    x = np.array(x0, np.float64)
    n = len(x)
    H = np.eye(n)
    g = sign * _numgrad(u, x, delta)
    for _ in range(n_iters):
        p = -H @ g
        # backtracking line search
        step = 1.0
        f0 = sign * u(x)
        while step > 1e-10 and sign * u(x + step * p) > f0 - 1e-4 * step * (g @ p) * -1:
            f_new = sign * u(x + step * p)
            if f_new < f0:
                break
            step *= 0.5
        s = step * p
        x_new = x + s
        g_new = sign * _numgrad(u, x_new, delta)
        y = g_new - g
        sy = s @ y
        if abs(sy) > 1e-12:
            rho = 1.0 / sy
            I = np.eye(n)
            H = (I - rho * np.outer(s, y)) @ H @ (I - rho * np.outer(y, s)) \
                + rho * np.outer(s, s)
        x, g = x_new, g_new
        if np.linalg.norm(g) < 1e-10:
            break
    return x, u(x)


def gasearch(u: Callable, bounds, n_iters: int = 60,
             population: int = 32, mutation_rate: float = 0.1,
             minimize: bool = True, seed: int = 0):
    """Genetic algorithm over box-bounded real parameters (reference
    gasearch.c semantics: selection + crossover + mutation).
    bounds: list of (lo, hi) per dimension."""
    rng = np.random.default_rng(seed)
    lo = np.asarray([b[0] for b in bounds])
    hi = np.asarray([b[1] for b in bounds])
    dim = len(bounds)
    pop = rng.uniform(lo, hi, size=(population, dim))
    sign = 1.0 if minimize else -1.0

    def fitness(p):
        return np.asarray([sign * u(ind) for ind in p])

    f = fitness(pop)
    for _ in range(n_iters):
        order = np.argsort(f)
        pop = pop[order]
        f = f[order]
        elite = population // 4
        children = []
        while len(children) < population - elite:
            i, j = rng.integers(0, elite + 1, 2)
            mask = rng.random(dim) < 0.5
            child = np.where(mask, pop[i], pop[j])
            mut = rng.random(dim) < mutation_rate
            child = np.where(mut, rng.uniform(lo, hi), child)
            children.append(child)
        pop = np.concatenate([pop[:elite], np.asarray(children)])
        f = fitness(pop)
    best = int(np.argmin(f))
    return pop[best], u(pop[best])
