"""Block interleaver, bit-exact with the reference.

Reference analog (studied, not copied): reference src/fec/src/
interleaver.c:68-283 — M = 1+floor(sqrt(n)), N minimal with M*N >= n;
depth-4 cascade of index-swap permutations, three of them with bit masks
(0x0f, 0x55, 0x33) that swap bit subsets between byte pairs.

Host-side numpy (packet assembly).  The permutation index sequence is
precomputed per (n, M, N) and cached; each pass is then one fancy-index
swap, vectorized where the index sequence allows.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["interleaver_dims", "interleave", "deinterleave"]


def interleaver_dims(n: int):
    """(M, N) block dimensions (reference interleaver.c:89-92)."""
    M = 1 + int(np.floor(np.sqrt(n)))
    N = n // M
    while n >= M * N:
        N += 1
    return M, N


@lru_cache(maxsize=None)
def _perm_pairs(n: int, M: int, N: int):
    """The (i, j) swap sequence of one permutation pass
    (reference interleaver.c interleaver_permute:196-219)."""
    pairs = []
    m = 0
    nn = n // 3
    n2 = n // 2
    for i in range(n2):
        while True:
            j = m * N + nn
            m += 1
            if m == M:
                nn = (nn + 1) % N
                m = 0
            if j < n2:
                break
        pairs.append((i, j))
    return tuple(pairs)


@lru_cache(maxsize=None)
def _perm_index(n: int, M: int, N: int):
    pairs = _perm_pairs(n, M, N)
    ie = np.asarray([2 * i for i, _ in pairs], np.int64)
    io = np.asarray([2 * j + 1 for _, j in pairs], np.int64)
    return ie, io


def _permute(x: np.ndarray, n: int, M: int, N: int):
    from .. import native
    if native.interleave_pass(x, M, N):
        return
    # the swap pairs are disjoint (each even slot once, each odd slot
    # once), so the whole pass is one vectorized exchange — and each pass
    # is an involution, which is why decode replays passes in reverse
    # stage order (reference interleaver.c:160-169)
    ie, io = _perm_index(n, M, N)
    tmp = x[io].copy()
    x[io] = x[ie]
    x[ie] = tmp


def _permute_mask(x: np.ndarray, n: int, M: int, N: int, mask: int):
    from .. import native
    if native.interleave_pass(x, M, N, mask):
        return
    ie, io = _perm_index(n, M, N)
    inv = (~mask) & 0xFF
    a, b = x[ie].copy(), x[io].copy()
    x[ie] = (a & inv) | (b & mask)
    x[io] = (a & mask) | (b & inv)


_STAGES = ((0, None), (2, 0x0F), (4, 0x55), (8, 0x33))


def interleave(msg, depth: int = 4) -> np.ndarray:
    """Forward interleave a byte array (reference interleaver_encode)."""
    x = np.array(msg, np.uint8, copy=True)
    n = len(x)
    if n == 0:
        return x
    M, N = interleaver_dims(n)
    for d, (dn, mask) in enumerate(_STAGES):
        if depth <= d:
            break
        if mask is None:
            _permute(x, n, M, N + dn)
        else:
            _permute_mask(x, n, M, N + dn, mask)
    return x


def deinterleave(msg, depth: int = 4) -> np.ndarray:
    """Inverse interleave (reference interleaver_decode)."""
    x = np.array(msg, np.uint8, copy=True)
    n = len(x)
    if n == 0:
        return x
    M, N = interleaver_dims(n)
    for d in range(min(depth, 4) - 1, -1, -1):
        dn, mask = _STAGES[d]
        if mask is None:
            _permute(x, n, M, N + dn)
        else:
            _permute_mask(x, n, M, N + dn, mask)
    return x


def _soft_pass(xb: np.ndarray, n: int, M: int, N: int,
               mask: int | None):
    """One permutation pass on per-bit soft values xb [n, 8]
    (reference interleaver_permute_soft / _mask_soft)."""
    ie, io = _perm_index(n, M, N)  # byte slots 2i (even), 2j+1 (odd)
    be, bo = ie, io
    if mask is None:
        tmp = xb[bo].copy()
        xb[bo] = xb[be]
        xb[be] = tmp
    else:
        sel = np.asarray([(mask >> (7 - b)) & 1 for b in range(8)],
                         bool)
        a = xb[be].copy()
        b_ = xb[bo].copy()
        xb[be, :] = np.where(sel[None, :], b_, a)
        xb[bo, :] = np.where(sel[None, :], a, b_)
    return xb


def interleave_soft(bits: np.ndarray, depth: int = 4) -> np.ndarray:
    """Forward interleave per-bit soft values [8*n] (reference
    interleaver_encode_soft)."""
    x = np.array(bits, copy=True)
    n = len(x) // 8
    if n == 0:
        return x
    xb = x.reshape(n, 8)
    M, N = interleaver_dims(n)
    for d, (dn, mask) in enumerate(_STAGES):
        if depth <= d:
            break
        _soft_pass(xb, n, M, N + dn, mask)
    return xb.reshape(-1)


def deinterleave_soft(bits: np.ndarray, depth: int = 4) -> np.ndarray:
    """Inverse (reference interleaver_decode_soft)."""
    x = np.array(bits, copy=True)
    n = len(x) // 8
    if n == 0:
        return x
    xb = x.reshape(n, 8)
    M, N = interleaver_dims(n)
    for d in range(min(depth, 4) - 1, -1, -1):
        dn, mask = _STAGES[d]
        _soft_pass(xb, n, M, N + dn, mask)
    return xb.reshape(-1)
