"""LDPC belief-propagation (sum-product) decoding.

Reference analog (studied, not copied): reference src/fec/src/
sumproduct.c — internal iterative sum-product message passing over a
sparse parity-check matrix (used experimentally by the reference; not
exposed as a fec scheme).

Implementation: log-domain min-sum/sum-product over a dense or sparse
H, vectorized with numpy; returns hard decisions and a parity-satisfied
flag.
"""
from __future__ import annotations

import numpy as np

__all__ = ["ldpc_sumproduct_decode", "ldpc_encode_systematic",
           "make_regular_ldpc"]


def make_regular_ldpc(n: int, k: int, col_weight: int = 3,
                      seed: int = 0) -> np.ndarray:
    """Random regular-ish parity-check matrix H [(n-k), n] (for tests and
    experimentation; the reference also generates its H internally)."""
    m = n - k
    rng = np.random.default_rng(seed)
    H = np.zeros((m, n), np.uint8)
    for j in range(n):
        rows = rng.choice(m, size=min(col_weight, m), replace=False)
        H[rows, j] = 1
    # ensure no empty rows
    for i in range(m):
        if H[i].sum() == 0:
            H[i, rng.integers(0, n)] = 1
    return H


def ldpc_encode_systematic(H: np.ndarray, msg_bits: np.ndarray):
    """Systematic encode via Gaussian elimination: returns (codeword,
    column permutation) with codeword[perm] ordered as [parity | msg]."""
    H = np.asarray(H, np.uint8) % 2
    m, n = H.shape
    k = n - m
    A = H.copy()
    perm = np.arange(n)
    row = 0
    for col in range(n):
        if row >= m:
            break
        sel = None
        for r in range(row, m):
            if A[r, col]:
                sel = r
                break
        if sel is None:
            continue
        A[[row, sel]] = A[[sel, row]]
        for r in range(m):
            if r != row and A[r, col]:
                A[r] ^= A[row]
        # move pivot column into position `row`
        if col != row:
            A[:, [row, col]] = A[:, [col, row]]
            perm[[row, col]] = perm[[col, row]]
        row += 1
    if row < m:
        raise ValueError("parity-check matrix is rank deficient")
    # A = [I_m | P]; parity = P @ msg
    P = A[:, m:]
    msg_bits = np.asarray(msg_bits, np.uint8) % 2
    if len(msg_bits) != k:
        raise ValueError(f"expected {k} message bits")
    parity = (P @ msg_bits) % 2
    cw_perm = np.concatenate([parity, msg_bits]).astype(np.uint8)
    # un-permute into the original column order
    cw = np.zeros(n, np.uint8)
    cw[perm] = cw_perm
    return cw, perm


def ldpc_sumproduct_decode(H: np.ndarray, llr: np.ndarray,
                           max_iters: int = 50, min_sum: bool = False):
    """Decode soft inputs; llr[i] > 0 means bit i likely 0 (standard
    convention).  Returns (hard_bits, parity_ok, iterations)."""
    H = np.asarray(H, np.uint8)
    m, n = H.shape
    llr = np.asarray(llr, np.float64)
    rows, cols = np.nonzero(H)
    # messages on edges
    Lq = llr[cols].copy()          # variable -> check
    Lr = np.zeros_like(Lq)         # check -> variable
    for it in range(1, max_iters + 1):
        # check update: per row, combine incoming Lq
        for r in range(m):
            e = rows == r
            v = Lq[e]
            if min_sum:
                sgn = np.sign(v)
                sprod = np.prod(sgn) * sgn
                mags = np.abs(v)
                # min excluding self
                order = np.argsort(mags)
                m1 = mags[order[0]]
                m2 = mags[order[1]] if len(mags) > 1 else m1
                mins = np.where(np.arange(len(v)) == order[0], m2, m1)
                Lr[e] = sprod * mins
            else:
                t = np.tanh(np.clip(v / 2, -19, 19))
                prod = np.prod(t)
                with np.errstate(divide="ignore"):
                    ratio = prod / np.where(t == 0, 1e-30, t)
                Lr[e] = 2 * np.arctanh(np.clip(ratio, -1 + 1e-12,
                                               1 - 1e-12))
        # variable update
        post = llr.copy()
        np.add.at(post, cols, Lr)
        Lq = post[cols] - Lr
        hard = (post < 0).astype(np.uint8)
        if not ((H @ hard) % 2).any():
            return hard, True, it
    return hard, False, max_iters
