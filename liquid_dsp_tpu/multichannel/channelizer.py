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


def firpfbch_analyzer(M: int, m: int = 4, as_db: float = 60.0, h=None,
                      precision=None,
                      name: str = "firpfbch_analyzer") -> Proc:
    """M-channel maximally-decimated analysis bank, sample-exact with the
    reference (firpfbch.c _analyzer_execute/_run:346-405).

    Input [..., T] (T % M == 0) -> output [..., M, T//M].
    Structure: window i's stream u_i[l] = x[l*M + M-1-i], branch-filtered
    by taps h[i + n*M]; bin (M-1-i) of a forward FFT across branches.

    TPU-fused form (r3, same algebra as firpfbch2_analyzer): the
    p-tap branch filter and the M-point FFT compose into ONE [pM, M]
    matrix A[(d, c), b] = Hb[c, p-1-d] * exp(-2j*pi*(M-1-c)*b/M), so a
    block is four real [L, pM] x [pM, M] MXU matmuls on (re, im)
    planes.  `precision` as in firpfbch2_analyzer (default HIGHEST)."""
    from jax import lax

    if h is None:
        h = firpfbch_kaiser_taps(M, m, as_db)
    h = np.asarray(h)
    if precision is None:
        precision = lax.Precision.HIGHEST
    p = len(h) // M  # taps per branch (reference p = 2m)
    Hb = _branch_taps(h, M, p)                       # [M, p] numpy
    cc = np.arange(M)
    bb = np.arange(M)
    F = np.exp(-2j * np.pi * np.outer((M - 1 - cc), bb) / M)
    A = np.zeros((p, M, M), np.complex64)
    for c in range(M):
        for q in range(p):
            A[p - 1 - q, c, :] = Hb[c, q] * F[c, :]
    A = A.reshape(p * M, M)
    Ar, Ai = A.real.copy(), A.imag.copy()

    def init(batch_shape=(), dtype=jnp.complex64):
        return jnp.zeros(batch_shape + (p - 1, M), dtype)

    def _core(r, i, cr, ci):
        T = r.shape[-1]
        if T % M:
            raise ValueError(f"analyzer block length {T} not a multiple "
                             f"of M={M}")
        L = T // M
        lead = r.shape[:-1]
        ur = r.reshape(lead + (L, M))[..., ::-1]     # u_i[l] = x[lM+M-1-i]
        ui = i.reshape(lead + (L, M))[..., ::-1]
        upr = jnp.concatenate([cr, ur], axis=-2)     # [.., L+p-1, M]
        upi = jnp.concatenate([ci, ui], axis=-2)
        idx = np.arange(L)[:, None] + np.arange(p)[None, :]
        wr = upr[..., idx, :].reshape(lead + (L, p * M))
        wi = upi[..., idx, :].reshape(lead + (L, p * M))
        mm = lambda a, b: jnp.matmul(a, jnp.asarray(b), precision=precision)
        Yr = mm(wr, Ar) - mm(wi, Ai)
        Yi = mm(wr, Ai) + mm(wi, Ar)
        return (jnp.moveaxis(Yr, -1, -2), jnp.moveaxis(Yi, -1, -2),
                upr[..., -(p - 1):, :], upi[..., -(p - 1):, :])

    def apply(params, carry, x):
        c = carry.astype(jnp.complex64)
        Yr, Yi, cr2, ci2 = _core(jnp.real(x), jnp.imag(x),
                                 jnp.real(c), jnp.imag(c))
        return (lax.complex(Yr, Yi).astype(jnp.complex64),
                lax.complex(cr2, ci2).astype(jnp.complex64))

    def planar_init(batch_shape=(), dtype=jnp.float32):
        z = jnp.zeros(batch_shape + (p - 1, M), jnp.float32)
        return (z, z)

    def planar_apply(params, carry, x):
        (r, i), (cr, ci) = x, carry
        Yr, Yi, cr2, ci2 = _core(r, i, cr.astype(r.dtype),
                                 ci.astype(i.dtype))
        return (Yr, Yi), (cr2, ci2)

    return Proc(params=(), init=init, apply=apply,
                planar_init=planar_init, planar_apply=planar_apply,
                rate=(1, 1), name=name)


def firpfbch_synthesizer(M: int, m: int = 4, as_db: float = 60.0, h=None,
                         precision=None,
                         name: str = "firpfbch_synth") -> Proc:
    """M-channel synthesis bank, sample-exact with the reference
    (firpfbch.c _synthesizer_execute:314-331): unnormalized inverse FFT
    across channels, then per-branch filtering.

    Input [..., M, L] -> output [..., L*M].

    TPU-fused form (r3, mirror of firpfbch_analyzer): the unnormalized
    IDFT and the p-tap branch filter compose into ONE [pM, M] matrix
    S[(d, j), r] = Hb[r, p-1-d] * exp(2j*pi*j*r/M) over p-frame windows
    of the channel-symbol stream.  `precision` as in the analyzer
    (default HIGHEST)."""
    from jax import lax

    if h is None:
        h = firpfbch_kaiser_taps(M, m, as_db)
    h = np.asarray(h)
    if precision is None:
        precision = lax.Precision.HIGHEST
    p = len(h) // M
    Hb = _branch_taps(h, M, p)
    jj = np.arange(M)
    W = np.exp(2j * np.pi * np.outer(jj, jj) / M)     # M * ifft
    S = np.zeros((p, M, M), np.complex64)
    for r in range(M):
        for q in range(p):
            S[p - 1 - q, :, r] += Hb[r, q] * W[:, r]
    S = S.reshape(p * M, M)
    Sr, Si = S.real.copy(), S.imag.copy()

    def init(batch_shape=(), dtype=jnp.complex64):
        return jnp.zeros(batch_shape + (p - 1, M), dtype)

    def _core(Xr, Xi, cr, ci):
        L = Xr.shape[-1]
        lead = Xr.shape[:-2]
        ur = jnp.concatenate([cr, jnp.moveaxis(Xr, -2, -1)], axis=-2)
        ui = jnp.concatenate([ci, jnp.moveaxis(Xi, -2, -1)], axis=-2)
        idx = np.arange(L)[:, None] + np.arange(p)[None, :]
        wr = ur[..., idx, :].reshape(lead + (L, p * M))
        wi = ui[..., idx, :].reshape(lead + (L, p * M))
        mm = lambda a, b: jnp.matmul(a, jnp.asarray(b), precision=precision)
        Yr = mm(wr, Sr) - mm(wi, Si)
        Yi = mm(wr, Si) + mm(wi, Sr)
        return (Yr.reshape(lead + (L * M,)), Yi.reshape(lead + (L * M,)),
                ur[..., -(p - 1):, :], ui[..., -(p - 1):, :])

    def apply(params, carry, X):
        c = carry.astype(jnp.complex64)
        Yr, Yi, cr2, ci2 = _core(jnp.real(X), jnp.imag(X),
                                 jnp.real(c), jnp.imag(c))
        return (lax.complex(Yr, Yi).astype(jnp.complex64),
                lax.complex(cr2, ci2).astype(jnp.complex64))

    def planar_init(batch_shape=(), dtype=jnp.float32):
        z = jnp.zeros(batch_shape + (p - 1, M), jnp.float32)
        return (z, z)

    def planar_apply(params, carry, x):
        (Xr, Xi), (cr, ci) = x, carry
        Yr, Yi, cr2, ci2 = _core(Xr, Xi, cr.astype(Xr.dtype),
                                 ci.astype(Xr.dtype))
        return (Yr, Yi), (cr2, ci2)

    return Proc(params=(), init=init, apply=apply,
                planar_init=planar_init, planar_apply=planar_apply,
                rate=(1, 1), name=name)


def firpfbch2_analyzer(M: int, m: int = 4, as_db: float = 60.0,
                       precision=None,
                       name: str = "firpfbch2_analyzer") -> Proc:
    """Oversampled analysis channelizer, sample-exact with the reference
    (firpfbch2.c:244-282): M/2-sample hops, alternating window/filter
    alignment (the `flag` state), sub-sampled filter bank, inverse FFT
    scaled by 1/M.

    Input [..., T] (T % M == 0, i.e. an even number of hops) -> output
    [..., M, 2*T//M].

    TPU-fused form (r3): window j's sample stream is u_j[n] =
    x[n*M + M/2-1-(j mod M/2) + (j>=M/2)*M/2]; even hops filter it with
    branch taps k=j (opposite window half lagged one hop), odd hops
    with k=(j-M/2) mod M; each hop then takes an M-point IFFT across j.
    Both the per-branch filter (contraction length p=2m — far too small
    for the MXU alone) and the IDFT fuse into ONE matrix per hop type:

        X[t, b] = sum_{d, j} w[t, d, j] * A[(d, j), b],
        A_even[(d, j), b] = G[j, p-d-(j>=M/2)] * W[j, b] / M,
        A_odd [(d, j), b] = G[(j-M/2) mod M, p-d] * W[j, b] / M,

    with w the (p+1)-frame sliding window over u — a [(p+1)M, M]
    MXU matmul per hop type (measured 1.7x the grouped-einsum + FFT
    formulation at float32 precision, 5.3x at the default bf16 matmul
    pass; PERF.md "Channelizer").  `precision` pins the matmul
    precision: default HIGHEST (true float32, the golden tolerance is
    2e-4 and DEFAULT's one-pass-bf16 error of 2.4e-3 on chip would
    exceed it); lax.Precision.HIGH measures 1.3e-5 on chip at 1.4x the
    HIGHEST throughput for tolerance-flexible pipelines.

    The planar path (planar.py) runs the same four real matmuls on
    (re, im) planes directly.
    """
    from jax import lax

    if M % 2:
        raise ValueError("firpfbch2 requires an even number of channels")
    if precision is None:
        precision = lax.Precision.HIGHEST
    M2 = M // 2
    p = 2 * m
    # analyzer prototype has twice the synthesizer bandwidth
    # (reference firpfbch2.c create_kaiser: fc = 1/M for the analyzer)
    h = firdes_kaiser(2 * M * m + 1, 1.0 / M, as_db)
    h = (h * M / np.sum(h)).astype(np.float32)
    # branch taps g[k, nu] = h[k + nu*M], k = 0..M-1, nu = 0..2m-1
    G = np.stack([h[k + np.arange(p) * M] for k in range(M)])
    jj = np.arange(M)
    samp = (M2 - 1 - (jj % M2)) + (jj >= M2) * M2    # index within frame
    k_odd = (jj - M2) % M
    W = np.exp(2j * np.pi * np.outer(jj, jj) / M) / M     # IFFT matrix
    A_even = np.zeros((p + 1, M, M), np.complex64)
    A_odd = np.zeros((p + 1, M, M), np.complex64)
    for j in range(M):
        for q in range(p):
            A_even[p - q - (1 if j >= M2 else 0), j, :] += G[j, q] * W[j, :]
            A_odd[p - q, j, :] += G[k_odd[j], q] * W[j, :]
    Ae = A_even.reshape((p + 1) * M, M)
    Ao = A_odd.reshape((p + 1) * M, M)
    Aer, Aei = Ae.real.copy(), Ae.imag.copy()
    Aor, Aoi = Ao.real.copy(), Ao.imag.copy()

    def init(batch_shape=(), dtype=jnp.complex64):
        # p history frames: the newest p frames of u (supplies both the
        # filter memory and the one-hop lag across block boundaries)
        return jnp.zeros(batch_shape + (p, M), dtype)

    def _core(r, i, cr, ci):
        T = r.shape[-1]
        if T % M:
            raise ValueError(f"firpfbch2 analyzer block length {T} must "
                             f"be a multiple of M={M} (even hop count)")
        L = T // M
        lead = r.shape[:-1]
        ur = r.reshape(lead + (L, M))[..., samp]
        ui = i.reshape(lead + (L, M))[..., samp]
        upr = jnp.concatenate([cr, ur], axis=-2)          # [.., L+p, M]
        upi = jnp.concatenate([ci, ui], axis=-2)
        idx = np.arange(L)[:, None] + np.arange(p + 1)[None, :]
        wr = upr[..., idx, :].reshape(lead + (L, (p + 1) * M))
        wi = upi[..., idx, :].reshape(lead + (L, (p + 1) * M))
        mm = lambda a, b: jnp.matmul(a, jnp.asarray(b), precision=precision)
        Xer = mm(wr, Aer) - mm(wi, Aei)
        Xei = mm(wr, Aei) + mm(wi, Aer)
        Xor = mm(wr, Aor) - mm(wi, Aoi)
        Xoi = mm(wr, Aoi) + mm(wi, Aor)
        Yr = jnp.stack([Xer, Xor], axis=-2).reshape(lead + (2 * L, M))
        Yi = jnp.stack([Xei, Xoi], axis=-2).reshape(lead + (2 * L, M))
        return (jnp.moveaxis(Yr, -1, -2), jnp.moveaxis(Yi, -1, -2),
                upr[..., -p:, :], upi[..., -p:, :])

    def apply(params, carry, x):
        c = carry.astype(jnp.complex64)
        Yr, Yi, cr2, ci2 = _core(jnp.real(x), jnp.imag(x),
                                 jnp.real(c), jnp.imag(c))
        return (lax.complex(Yr, Yi).astype(jnp.complex64),
                lax.complex(cr2, ci2).astype(jnp.complex64))

    def planar_init(batch_shape=(), dtype=jnp.float32):
        z = jnp.zeros(batch_shape + (p, M), jnp.float32)
        return (z, z)

    def planar_apply(params, carry, x):
        (r, i), (cr, ci) = x, carry
        Yr, Yi, cr2, ci2 = _core(r, i, cr.astype(r.dtype),
                                 ci.astype(i.dtype))
        return (Yr, Yi), (cr2, ci2)

    return Proc(params=(), init=init, apply=apply,
                planar_init=planar_init, planar_apply=planar_apply,
                rate=(2, 1), name=name)


def firpfbch2_synthesizer(M: int, m: int = 4, as_db: float = 60.0,
                          precision=None,
                          name: str = "firpfbch2_synth") -> Proc:
    """Oversampled synthesis channelizer, sample-exact with the reference
    (firpfbch2.c:287-337): per hop, IFFT of the M channel inputs scaled
    by M/2, pushed into one of two alternating window banks; each output
    sample sums two sub-filter dot products across the banks.

    Input [..., M, nf] (nf even) -> output [..., nf*M/2].

    TPU-fused form (r3, mirror of the analyzer fusion): the per-hop
    IDFT and the two alternating-bank branch filters compose into four
    [(p+1)M, M/2] matrices over (p+1)-frame windows of the even-hop and
    odd-hop channel-symbol streams:

      y_even[n, i] = sum_{q,c} G[i, q]    W2[c, i]    Xe[n-q,   c]
                   + sum_{q,c} G[i+M2, q] W2[c, i]    Xo[n-1-q, c]
      y_odd [n, i] = sum_{q,c} G[i, q]    W2[c, i+M2] Xo[n-q,   c]
                   + sum_{q,c} G[i+M2, q] W2[c, i+M2] Xe[n-q,   c]

    with W2[c, j] = exp(2j*pi*c*j/M)/2 (the M/2-scaled IDFT).  The
    carry holds the last p raw frames of each hop-parity stream.
    `precision` as in firpfbch2_analyzer (default HIGHEST)."""
    from jax import lax

    if M % 2:
        raise ValueError("firpfbch2 requires an even number of channels")
    if precision is None:
        precision = lax.Precision.HIGHEST
    M2 = M // 2
    p = 2 * m
    h = firdes_kaiser(2 * M * m + 1, 0.5 / M, as_db)
    h = (h * M / np.sum(h)).astype(np.float32)
    G = np.stack([h[k + np.arange(p) * M] for k in range(M)])
    cc = np.arange(M)
    W2 = np.exp(2j * np.pi * np.outer(cc, cc) / M) / 2.0
    Ae = np.zeros((p + 1, M, M2), np.complex64)   # Xe -> y_even
    Be = np.zeros((p + 1, M, M2), np.complex64)   # Xo -> y_even (lagged)
    Ao = np.zeros((p + 1, M, M2), np.complex64)   # Xo -> y_odd
    Bo = np.zeros((p + 1, M, M2), np.complex64)   # Xe -> y_odd
    for i in range(M2):
        for q in range(p):
            Ae[p - q, :, i] += G[i, q] * W2[:, i]
            Be[p - 1 - q, :, i] += G[i + M2, q] * W2[:, i]
            Ao[p - q, :, i] += G[i, q] * W2[:, i + M2]
            Bo[p - q, :, i] += G[i + M2, q] * W2[:, i + M2]
    mats = [A.reshape((p + 1) * M, M2) for A in (Ae, Be, Ao, Bo)]
    (Aer, Aei), (Ber, Bei), (Aor, Aoi), (Bor, Boi) = [
        (A.real.copy(), A.imag.copy()) for A in mats]

    def init(batch_shape=(), dtype=jnp.complex64):
        z = jnp.zeros(batch_shape + (p, M), dtype)
        return {"e": z, "o": z}

    def _core(Xr, Xi, cer, cei, cor, coi):
        nf = Xr.shape[-1]
        if nf % 2:
            raise ValueError("firpfbch2 synthesizer needs an even number "
                             "of frames per block")
        L = nf // 2
        lead = Xr.shape[:-2]
        Xfr = jnp.moveaxis(Xr, -2, -1)               # [.., nf, M]
        Xfi = jnp.moveaxis(Xi, -2, -1)
        uer = jnp.concatenate([cer, Xfr[..., 0::2, :]], axis=-2)
        uei = jnp.concatenate([cei, Xfi[..., 0::2, :]], axis=-2)
        uor = jnp.concatenate([cor, Xfr[..., 1::2, :]], axis=-2)
        uoi = jnp.concatenate([coi, Xfi[..., 1::2, :]], axis=-2)
        idx = np.arange(L)[:, None] + np.arange(p + 1)[None, :]
        Wer = uer[..., idx, :].reshape(lead + (L, (p + 1) * M))
        Wei = uei[..., idx, :].reshape(lead + (L, (p + 1) * M))
        Wor = uor[..., idx, :].reshape(lead + (L, (p + 1) * M))
        Woi = uoi[..., idx, :].reshape(lead + (L, (p + 1) * M))
        mm = lambda a, b: jnp.matmul(a, jnp.asarray(b), precision=precision)
        yer = mm(Wer, Aer) - mm(Wei, Aei) + mm(Wor, Ber) - mm(Woi, Bei)
        yei = mm(Wer, Aei) + mm(Wei, Aer) + mm(Wor, Bei) + mm(Woi, Ber)
        yor_ = mm(Wor, Aor) - mm(Woi, Aoi) + mm(Wer, Bor) - mm(Wei, Boi)
        yoi = mm(Wor, Aoi) + mm(Woi, Aor) + mm(Wer, Boi) + mm(Wei, Bor)
        Yr = jnp.stack([yer, yor_], axis=-2).reshape(lead + (nf * M2,))
        Yi = jnp.stack([yei, yoi], axis=-2).reshape(lead + (nf * M2,))
        return (Yr, Yi, uer[..., -p:, :], uei[..., -p:, :],
                uor[..., -p:, :], uoi[..., -p:, :])

    def apply(params, carry, Xin):
        ce = carry["e"].astype(jnp.complex64)
        co = carry["o"].astype(jnp.complex64)
        Yr, Yi, cer, cei, cor, coi = _core(
            jnp.real(Xin), jnp.imag(Xin),
            jnp.real(ce), jnp.imag(ce), jnp.real(co), jnp.imag(co))
        return (lax.complex(Yr, Yi).astype(jnp.complex64),
                {"e": lax.complex(cer, cei).astype(jnp.complex64),
                 "o": lax.complex(cor, coi).astype(jnp.complex64)})

    def planar_init(batch_shape=(), dtype=jnp.float32):
        z = jnp.zeros(batch_shape + (p, M), jnp.float32)
        return {"er": z, "ei": z, "or": z, "oi": z}

    def planar_apply(params, carry, x):
        (Xr, Xi) = x
        Yr, Yi, cer, cei, cor, coi = _core(
            Xr, Xi, carry["er"].astype(Xr.dtype),
            carry["ei"].astype(Xr.dtype), carry["or"].astype(Xr.dtype),
            carry["oi"].astype(Xr.dtype))
        return (Yr, Yi), {"er": cer, "ei": cei, "or": cor, "oi": coi}

    return Proc(params=(), init=init, apply=apply,
                planar_init=planar_init, planar_apply=planar_apply,
                rate=(1, 2), name=name)
