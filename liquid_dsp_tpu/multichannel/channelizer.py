"""Polyphase filterbank channelizers.

Reference analogs (studied, not copied):
  * firpfbch  — src/multichannel/src/firpfbch.c:37-405: maximally
                decimated M-channel analyzer/synthesizer; per-channel
                window + dotprod then M-point (I)FFT (analyzer run at
                :383-405, synthesizer at :314-331).
  * firpfbch2 — src/multichannel/src/firpfbch2.c:36-329: oversampled
                (M/2-sample advance) channelizer, 2x output rate.

TPU design (the "batched polyphase+FFT kernel" of BASELINE.md): the
whole block of frames is processed at once — polyphase branch filtering
is a feature-grouped 1-D convolution [batch, M branches, L frames]
(MXU-shaped), and the channel transform is one batched FFT along the
channel axis.  No per-sample loops; the carry is the (p-1)-frame branch
history.

Channel c of the analyzer is the input mixed down by exp(-j*2*pi*c*n/M),
lowpass-filtered by the prototype, and decimated by M (the reference's
equivalence autotest, src/multichannel/tests/firpfbch_crcf_autotest.c).
Analysis output convention: y[..., c, l] = channel c, frame l.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import Proc
from ..design.firdes import firdes_kaiser

__all__ = ["firpfbch_kaiser_taps", "firpfbch_analyzer",
           "firpfbch_synthesizer", "firpfbch2_analyzer",
           "firpfbch2_synthesizer"]


def firpfbch_kaiser_taps(M: int, m: int = 4, as_db: float = 60.0):
    """Prototype lowpass, length 2*M*m+1, cutoff 0.5/M, un-normalized
    (reference firpfbch_crcf_create_kaiser, firpfbch.c:146-177)."""
    return firdes_kaiser(2 * M * m + 1, 0.5 / M, as_db).astype(np.float32)


def _branch_taps(h: np.ndarray, M: int, p: int):
    """Hb[r, q] = h[q*M + r] — polyphase decomposition, p taps/branch."""
    return np.stack([h[r + np.arange(p) * M] for r in range(M)])  # [M, p]


def _branch_filter(Hb, carry, u):
    """Filter each branch along the frame axis.

    u: [..., L, M]  (frame-major), Hb: [M, p], carry: [..., p-1, M].
    Returns (v [..., L, M], carry').
    """
    M, p = Hb.shape
    if p > 1:
        up = jnp.concatenate([carry, u], axis=-2)   # [..., L+p-1, M]
    else:
        up = u
    L = u.shape[-2]
    # v[l, r] = sum_q Hb[r, q] * up[l + (p-1) - q, r]
    idx = jnp.arange(L)[:, None] + (p - 1 - jnp.arange(p))[None, :]
    win = jnp.take(up, idx, axis=-2)                # [..., L, p, M]
    v = jnp.einsum("...lpm,mp->...lm", win, Hb.astype(u.dtype))
    new_carry = up[..., up.shape[-2] - (p - 1):, :] if p > 1 else carry
    return v, new_carry


def firpfbch_analyzer(M: int, m: int = 4, as_db: float = 60.0, h=None,
                      name: str = "firpfbch_analyzer") -> Proc:
    """M-channel maximally-decimated analysis bank, sample-exact with the
    reference (firpfbch.c _analyzer_execute/_run:346-405).

    Input [..., T] (T % M == 0) -> output [..., M, T//M].
    Structure: window i's stream u_i[l] = x[l*M + M-1-i], branch-filtered
    by taps h[i + n*M]; bin (M-1-i) of a forward FFT across branches.
    """
    if h is None:
        h = firpfbch_kaiser_taps(M, m, as_db)
    h = np.asarray(h)
    p = len(h) // M  # taps per branch (reference p = 2m)
    Hb = jnp.asarray(_branch_taps(h, M, p))

    def init(batch_shape=(), dtype=jnp.complex64):
        return jnp.zeros(batch_shape + (p - 1, M), dtype)

    def apply(params, carry, x):
        T = x.shape[-1]
        if T % M:
            raise ValueError(f"analyzer block length {T} not a multiple "
                             f"of M={M}")
        L = T // M
        xf = x.reshape(x.shape[:-1] + (L, M))
        u = xf[..., ::-1]     # u_i[l] = x[lM + M-1-i]
        v, new_carry = _branch_filter(params["Hb"],
                                      carry.astype(x.dtype), u)
        # X[M-1-i] = v_i, forward FFT across bins (firpfbch.c:401-405)
        X = v[..., ::-1]
        Y = jnp.fft.fft(X, axis=-1)
        return jnp.moveaxis(Y, -1, -2).astype(jnp.complex64), new_carry

    return Proc(params={"Hb": Hb}, init=init, apply=apply,
                rate=(1, 1), name=name)


def firpfbch_synthesizer(M: int, m: int = 4, as_db: float = 60.0, h=None,
                         name: str = "firpfbch_synth") -> Proc:
    """M-channel synthesis bank, sample-exact with the reference
    (firpfbch.c _synthesizer_execute:314-331): unnormalized inverse FFT
    across channels, then per-branch filtering.

    Input [..., M, L] -> output [..., L*M].
    """
    if h is None:
        h = firpfbch_kaiser_taps(M, m, as_db)
    h = np.asarray(h)
    p = len(h) // M
    Hb = jnp.asarray(_branch_taps(h, M, p))

    def init(batch_shape=(), dtype=jnp.complex64):
        return jnp.zeros(batch_shape + (p - 1, M), dtype)

    def apply(params, carry, X):
        L = X.shape[-1]
        Xf = jnp.moveaxis(X, -2, -1)            # [..., L, M]
        w = jnp.fft.ifft(Xf, axis=-1) * M       # unnormalized backward FFT
        v, new_carry = _branch_filter(params["Hb"],
                                      carry.astype(w.dtype), w)
        y = v.reshape(v.shape[:-2] + (L * M,))
        return y.astype(jnp.complex64), new_carry

    return Proc(params={"Hb": Hb}, init=init, apply=apply,
                rate=(1, 1), name=name)


def firpfbch2_analyzer(M: int, m: int = 4, as_db: float = 60.0,
                       name: str = "firpfbch2_analyzer") -> Proc:
    """Oversampled analysis channelizer, sample-exact with the reference
    (firpfbch2.c:244-282): M/2-sample hops, alternating window/filter
    alignment (the `flag` state), sub-sampled filter bank, inverse FFT
    scaled by 1/M.

    Input [..., T] (T % M == 0, i.e. an even number of hops) -> output
    [..., M, 2*T//M].

    Vectorized form: window j's sample stream is u_j[n] =
    x[n*M + M/2-1-(j mod M/2) + (j>=M/2)*M/2]; its filtered stream with
    branch taps g_k[nu] = h[k + nu*M] is one grouped convolution; each
    hop then gathers the right (branch, time) entry per FFT bin — even
    hops use k=j, odd hops k=(j-M/2) mod M with a one-hop lag for the
    opposite window half.
    """
    if M % 2:
        raise ValueError("firpfbch2 requires an even number of channels")
    M2 = M // 2
    # analyzer prototype has twice the synthesizer bandwidth
    # (reference firpfbch2.c create_kaiser: fc = 1/M for the analyzer)
    h = firdes_kaiser(2 * M * m + 1, 1.0 / M, as_db)
    h = (h * M / np.sum(h)).astype(np.float32)
    # branch taps g[k, nu] = h[k + nu*M], k = 0..M-1, nu = 0..2m-1
    G = np.stack([h[k + np.arange(2 * m) * M] for k in range(M)])
    Gj = jnp.asarray(G)

    def init(batch_shape=(), dtype=jnp.complex64):
        # 2m history frames (one more than the filter needs, to supply the
        # one-hop-lagged even stream across block boundaries)
        return jnp.zeros(batch_shape + (2 * m, M), dtype)

    def apply(params, carry, x):
        T = x.shape[-1]
        if T % M:
            raise ValueError(f"firpfbch2 analyzer block length {T} must be "
                             f"a multiple of M={M} (even hop count)")
        L = T // M
        G_ = params["G"]
        # u[..., n, j]: sample for window j at full-rate frame n
        xf = x.reshape(x.shape[:-1] + (L, M))
        jj = np.arange(M)
        samp = (M2 - 1 - (jj % M2)) + (jj >= M2) * M2    # index within frame
        u = xf[..., samp]                                 # [..., L, M]
        # two filtered versions: even-hop taps k=j, odd-hop k=(j-M2)%M
        k_even = jj
        k_odd = (jj - M2) % M
        hist = carry.astype(x.dtype)
        # filter over [hist(2m) | u] -> L+1 outputs; index 0 = "frame -1"
        ue_all, _ = _branch_filter(jnp.take(G_, jnp.asarray(k_even), axis=0),
                                   hist[..., :-1, :],
                                   jnp.concatenate([hist[..., -1:, :], u],
                                                   axis=-2))
        ue = ue_all[..., 1:, :]
        ue_lag = ue_all[..., :-1, :]
        uo, _ = _branch_filter(jnp.take(G_, jnp.asarray(k_odd), axis=0),
                               hist[..., 1:, :], u)
        # (odd stream needs only the last 2m-1 history frames)
        # assemble per hop t: X_j(t)
        #  t = 2n   : j <  M2 -> ue[n, j];   j >= M2 -> ue[n-1, j]
        #  t = 2n+1 : all j   -> uo[n, j]
        X_even = jnp.where(jnp.asarray(jj < M2), ue, ue_lag)
        X_odd = uo
        X = jnp.stack([X_even, X_odd], axis=-2)   # [..., L, 2, M]
        X = X.reshape(X.shape[:-3] + (2 * L, M))
        Y = jnp.fft.ifft(X, axis=-1)              # (1/M falls out of np ifft)
        new_carry = jnp.concatenate([hist, u], axis=-2)[..., -2 * m:, :]
        return jnp.moveaxis(Y, -1, -2).astype(jnp.complex64), new_carry

    return Proc(params={"G": Gj}, init=init, apply=apply,
                rate=(2, 1), name=name)


def firpfbch2_synthesizer(M: int, m: int = 4, as_db: float = 60.0,
                          name: str = "firpfbch2_synth") -> Proc:
    """Oversampled synthesis channelizer, sample-exact with the reference
    (firpfbch2.c:287-337): per hop, IFFT of the M channel inputs scaled
    by M/2, pushed into one of two alternating window banks; each output
    sample sums two sub-filter dot products across the banks.

    Input [..., M, nf] (nf even) -> output [..., nf*M/2].
    """
    if M % 2:
        raise ValueError("firpfbch2 requires an even number of channels")
    M2 = M // 2
    h = firdes_kaiser(2 * M * m + 1, 0.5 / M, as_db)
    h = (h * M / np.sum(h)).astype(np.float32)
    G = np.stack([h[k + np.arange(2 * m) * M] for k in range(M)])
    Gj = jnp.asarray(G)

    def init(batch_shape=(), dtype=jnp.complex64):
        return {"w1": jnp.zeros(batch_shape + (2 * m - 1, M), dtype),
                "w0": jnp.zeros(batch_shape + (2 * m, M), dtype)}

    def apply(params, carry, Xin):
        nf = Xin.shape[-1]
        if nf % 2:
            raise ValueError("firpfbch2 synthesizer needs an even number "
                             "of frames per block")
        L = nf // 2
        G_ = params["G"]
        Xf = jnp.moveaxis(Xin, -2, -1)                # [..., nf, M]
        w = jnp.fft.ifft(Xf, axis=-1) * M2            # ifft*(1/M)*M*M2/M
        # even hops (flag=0) push into w1; odd hops into w0
        w1_in = w[..., 0::2, :]                        # [..., L, M]
        w0_in = w[..., 1::2, :]
        jj = np.arange(M)
        # filtered streams: A[k stream over w1_j], B over w0_j; the taps
        # needed per (hop parity, output index):
        #  even t=2n: y_i = dp[i]@w1[i](n)      + dp[i+M2]@w0[i](n-1)
        #  odd  t   : y_i = dp[i]@w0[i+M2](n)   + dp[i+M2]@w1[i+M2](n)
        A_lo, c1 = _branch_filter(jnp.take(G_, jnp.asarray(jj), axis=0),
                                  carry["w1"].astype(w.dtype), w1_in)
        hist0 = carry["w0"].astype(w.dtype)
        B_all, _ = _branch_filter(
            jnp.take(G_, jnp.asarray((jj + M2) % M), axis=0),
            hist0[..., :-1, :],
            jnp.concatenate([hist0[..., -1:, :], w0_in], axis=-2))
        B_hi = B_all[..., 1:, :]
        B_lag = B_all[..., :-1, :]
        c0 = jnp.concatenate([hist0, w0_in], axis=-2)[..., -2 * m:, :]
        # A_lo[n, j] = g_j * w1_j; B_hi[n, j] = g_{(j+M2)%M} * w0_j
        i = np.arange(M2)
        # even outputs: dp[i]@w1[i] = A_lo[n, i];
        #               dp[i+M2]@w0[i] lagged one hop -> B_lag[n, i]
        y_even = A_lo[..., :, i] + B_lag[..., :, i]               # [..., L, M2]
        # odd outputs: dp[i]@w0[i+M2]: taps i on w0_{i+M2}; B streams have
        # taps (j+M2)%M on w0_j -> j = i+M2 gives taps i  ✓ -> B_hi[n, i+M2]
        #              dp[i+M2]@w1[i+M2] = need taps i+M2 on w1_{i+M2}:
        # A streams have taps j on w1_j -> j = i+M2  ✓ -> A_lo[n, i+M2]
        y_odd = B_hi[..., :, i + M2] + A_lo[..., :, i + M2]
        y = jnp.stack([y_even, y_odd], axis=-2)        # [..., L, 2, M2]
        y = y.reshape(y.shape[:-3] + (nf * M2,))
        return y.astype(jnp.complex64), {"w1": c1, "w0": c0}

    return Proc(params={"G": Gj}, init=init, apply=apply,
                rate=(1, 2), name=name)
