"""framegen64 / framesync64: the fixed 8+64-byte frame PHY pair.

Reference analogs (studied, not copied):
  * framegen64  — src/framing/src/framegen64.c:38-172: 64-symbol BPSK-
    quadrature m-sequence preamble (msequence(7,0x0089,1)), qpacketmodem
    (72B -> 600 QPSK symbols via CRC-24 + Golay(24,12)), qpilotgen
    (600 -> 630 symbols, spacing 21), ARKAISER k=2 m=7 beta=0.3 pulse
    interpolation -> exactly LIQUID_FRAME64_LEN = 1440 samples.
  * framesync64 — src/framing/src/framesync64.c:66-430: qdetector ->
    mixer/matched-filter/decimate -> qpilotsync -> qpacketmodem decode.

TPU design (SURVEY.md §7): the receiver is a block pipeline — detect the
preamble anywhere in the capture with one batched FFT cross-correlation,
then mix/filter/sample the aligned window with gathers (no per-sample
state machine).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core import Proc
from ..design.firdes import firdes_arkaiser
from ..ops.fir import firinterp
from ..utils.sequence import MSequence
from .qpacket import (qpacketmodem_encode, qpacketmodem_decode,
                      qpilot_pilots, qpilotgen, qpilotsync)
from .detector import qdetector_detect

__all__ = ["FRAME64_LEN", "framegen64", "framesync64", "Frame64Result",
           "frame64_preamble", "framesync64_stream", "Framesync64"]

FRAME64_LEN = 1440
_K = 2          # samples/symbol
_M = 7          # filter semi-length (symbols)
_BETA = 0.3     # excess bandwidth
_NPFB = 32      # matched-filter bank resolution


def frame64_preamble() -> np.ndarray:
    """64-symbol p/n preamble (reference framegen64.c:60-66)."""
    ms = MSequence(7, 0x0089, 1)
    out = np.zeros(64, np.complex64)
    s2 = np.sqrt(0.5)
    for i in range(64):
        # NOTE: the reference's two msequence_advance() calls sit in one
        # expression (framegen64.c:62-63) whose evaluation order is
        # unspecified in C; the shipped builds evaluate the imaginary
        # operand first, so the first bit maps to Q, the second to I.
        im = s2 if ms.advance() else -s2
        re = s2 if ms.advance() else -s2
        out[i] = re + 1j * im
    return out


def _interp_taps() -> np.ndarray:
    return firdes_arkaiser(_K, _M, _BETA).astype(np.float32)


def framegen64(header, payload) -> np.ndarray:
    """Generate one frame: 8-byte header + 64-byte payload ->
    1440 complex samples (reference framegen64_execute:130-172)."""
    header = np.asarray(header, np.uint8)
    payload = np.asarray(payload, np.uint8)
    if header.shape != (8,) or payload.shape != (64,):
        raise ValueError("framegen64 takes an 8-byte header and a "
                         "64-byte payload")
    msg = np.concatenate([header, payload])
    syms = np.asarray(qpacketmodem_encode(
        msg, "crc24", "none", "golay2412", "qpsk"))
    assert len(syms) == 600
    frame_syms = qpilotgen(syms, 21)
    assert len(frame_syms) == 630
    # pulse-shape: preamble + payload + settling zeros
    settle = 2 * _M + 2 + 10
    stream = np.concatenate([frame64_preamble(), frame_syms,
                             np.zeros(settle, np.complex64)])
    qi = firinterp(_K, _interp_taps())
    y, _ = qi(jnp.asarray(stream), batch_shape=())
    y = np.asarray(y)
    assert len(y) == FRAME64_LEN
    return y.astype(np.complex64)


def _detector_template() -> np.ndarray:
    """Interpolated preamble + filter tail (reference
    qdetector_cccf_create_linear: s_len = k*(64 + 2m))."""
    qi = firinterp(_K, _interp_taps())
    seq = np.concatenate([frame64_preamble(),
                          np.zeros(2 * _M, np.complex64)])
    y, _ = qi(jnp.asarray(seq), batch_shape=())
    return np.asarray(y).astype(np.complex64)


def _mf_bank() -> np.ndarray:
    """Polyphase matched-filter bank [npfb, Lb] (reference
    framesync64.c:144: firpfb_crcf_create_rnyquist(ARKAISER, 32, 2, 7))."""
    h = firdes_arkaiser(_K * _NPFB, _M, _BETA).astype(np.float32)
    n = len(h) - 1  # 2*k*npfb*m
    Lb = n // _NPFB  # branch length = 2*k*m
    bank = np.stack([h[b + np.arange(Lb) * _NPFB] for b in range(_NPFB)])
    return bank  # [npfb, Lb]


class Frame64Result(NamedTuple):
    detected: bool
    crc_ok: bool
    header: Optional[np.ndarray]
    payload: Optional[np.ndarray]
    evm_db: float
    rssi_db: float
    cfo: float          # radians/sample
    sample_index: int


_TEMPLATE = None
_BANK = None


def framesync64(x, threshold: float = 0.5) -> Frame64Result:
    """Recover a frame64 from a capture buffer [T] (T >= 1440ish).

    Block pipeline: detect -> mix down -> polyphase matched filter at the
    estimated timing phase, decimated 2:1 -> pilot sync -> packet decode.
    """
    global _TEMPLATE, _BANK
    if _TEMPLATE is None:
        _TEMPLATE = _detector_template()
        _BANK = _mf_bank()
    x = np.asarray(x, np.complex64)
    det = qdetector_detect(x, _TEMPLATE, threshold=threshold, range_bins=2)
    if not det.detected:
        return Frame64Result(False, False, None, None, 0.0, 0.0, 0.0, -1)

    # timing: filterbank index + base offset (framesync64.c:299-306)
    tau = det.tau_hat
    if tau > 0:
        b = int(tau * _NPFB) % _NPFB
        off = 0
    else:
        b = int((1.0 + tau) * _NPFB) % _NPFB
        off = -1
    n0 = det.sample_index

    # number of matched-filter symbol outputs needed:
    # 64 preamble + 2m delay + 630 payload
    n_sym = 64 + 2 * _M + 630
    Lb = _BANK.shape[1]
    taps = _BANK[b][::-1].copy()  # newest-first ordering for the window dot

    # sample instants (2 samples/symbol) relative to template start
    base = n0 + off + 2 * np.arange(n_sym)
    idx = base[:, None] + np.arange(Lb)[None, :] - (Lb - 1)
    pad = Lb
    xp = np.concatenate([np.zeros(pad, np.complex64), x,
                         np.zeros(2 * n_sym + pad, np.complex64)])
    # mix down with detector estimates (phase referenced to template start)
    t_idx = idx + pad
    win = xp[t_idx]                                     # [n_sym, Lb]
    tt = (idx - n0).astype(np.float32)
    mix = np.exp(-1j * (det.dphi_hat * tt + det.phi_hat)).astype(np.complex64)
    win = win * mix
    sym = win @ taps.astype(np.complex64)
    sym = sym * (0.5 / max(det.gamma_hat, 1e-12))

    payload_rx = sym[64 + 2 * _M: 64 + 2 * _M + 630]
    payload_sym, dphi2, phi2, g2 = qpilotsync(payload_rx, 600, 21)
    payload_bytes, ok = qpacketmodem_decode(
        payload_sym, 72, "crc24", "none", "golay2412", "qpsk")

    # stats: EVM vs nearest QPSK point
    from ..modem import constellation, demodulate, modulate
    table = constellation("qpsk")
    s_hat = demodulate(table, jnp.asarray(payload_sym))
    ref = np.asarray(modulate(table, s_hat))
    evm = np.sqrt(np.mean(np.abs(payload_sym - ref) ** 2))
    evm_db = float(20 * np.log10(evm + 1e-12))
    rssi_db = float(20 * np.log10(max(det.gamma_hat, 1e-12)))
    # cfo is radians/SAMPLE: dphi_hat already is; qpilotsync's dphi2 is
    # radians per payload symbol at k=2 samples/symbol, so rescale
    return Frame64Result(True, bool(ok),
                         payload_bytes[:8].copy(), payload_bytes[8:].copy(),
                         evm_db, rssi_db, float(det.dphi_hat + dphi2 / _K),
                         n0)


# ---------------------------------------------------------------------------
# TPU-resident streaming multi-frame receiver
# ---------------------------------------------------------------------------
#
# The reference framesync64 (reference src/framing/src/framesync64.c:241-269)
# consumes an unbounded sample stream one sample at a time through a
# detect/rxpreamble/rxpayload state machine and fires a callback per decoded
# frame, re-arming automatically.  The TPU re-design below keeps those
# SEMANTICS (every frame in the stream is decoded exactly once, in order)
# but none of the state machine: each block is processed by a fully
# vectorized detect-everywhere pipeline, and the only inter-block state is
# a fixed sample-history buffer.
#
#   * carry: the last _HIST samples + the absolute index of the buffer
#     head.  _HIST covers the longest look-back any stage needs (frame
#     span 1415 samples from the detection point, 512-sample alignment
#     window), so a frame is emitted in the (unique) block whose emit
#     window contains its start sample.
#   * detection: half-overlapped 512-point FFT segments over the whole
#     buffer, cross-correlated against the frequency-domain template for
#     5 carrier-bin hypotheses (identical math to qdetector_cccf seek,
#     reference qdetector_cccf.c:373-441).  Each buffer position is
#     "owned" by exactly one segment (correlation lags restricted to
#     [0, hop)), which makes detection deterministic across block
#     boundaries: the same absolute sample position always resolves in
#     the same segment geometry, so no cross-block dedup is needed.
#   * emission: candidates whose start position falls in the first T
#     buffer positions — a window that advances by exactly T per block
#     and therefore tiles absolute time: each frame fires exactly once.
#   * decode: up to `max_frames` candidate slots are refined (quadratic
#     timing/carrier interpolation), mixed, matched-filtered at the
#     per-slot polyphase branch, pilot-synced and demodulated as one
#     batched computation with static shapes — invalid slots carry a
#     validity mask, exactly the "fixed max-frames-per-block + mask"
#     design from SURVEY.md §7.
#
# Everything in `apply` is jittable; byte-domain FEC (Golay/CRC) runs in
# the host-side callback wrapper `Framesync64`, mirroring the reference's
# callback contract (the reference also hands decoded bytes to user code;
# the wire bits never need to influence sample-domain control flow).

_HIST = 1536                  # history samples carried between blocks
_DET_NFFT = 512               # detection segment size (2*next_pow2(s_len))
_DET_HOP = _DET_NFFT // 2
_RANGE_BINS = 2
_NSYM_TOT = 64 + 2 * _M + 630   # preamble + filter delay + payload symbols
_PFFT = 64                    # pilot carrier-estimate FFT (qpilotsync nfft)


def _stream_constants():
    """Numpy closure constants for the streaming receiver (complex data
    is kept as float planes: the axon TPU backend cannot materialize
    complex transfers, and numpy closures are inlined by XLA)."""
    s = _detector_template()
    s_len = len(s)
    S = np.fft.fft(s, _DET_NFFT)
    offsets = np.arange(-_RANGE_BINS, _RANGE_BINS + 1)
    So = np.stack([np.roll(S, off) for off in offsets])   # [n_off, NFFT]
    bank = _mf_bank()[:, ::-1].copy()                     # [npfb, Lb] newest-first
    pilots = qpilot_pilots(600, 21)                       # [30]
    pmask = (np.arange(630) % 21 == 0)
    return {
        "s_len": s_len,
        "s2_sum": float(np.sum(np.abs(s) ** 2)),
        "offsets": offsets.astype(np.int32),
        "So_re": So.real.astype(np.float32),
        "So_im": So.imag.astype(np.float32),
        "sconj_re": s.conj().real.astype(np.float32),
        "sconj_im": s.conj().imag.astype(np.float32),
        "bank": bank.astype(np.float32),
        "pil_re": pilots.real.astype(np.float32),
        "pil_im": pilots.imag.astype(np.float32),
        "data_idx": np.nonzero(~pmask)[0].astype(np.int32),  # [600]
        "pil_idx": np.nonzero(pmask)[0].astype(np.int32),    # [30]
    }


class Frame64Block(NamedTuple):
    """Per-block batched detection result: leading axis is the candidate
    slot (fixed max_frames); `valid` masks live slots."""
    valid: jnp.ndarray        # [..., P] bool
    sample_index: jnp.ndarray # [..., P] int32, absolute stream index
    rxy: jnp.ndarray          # [..., P] detection correlation
    cfo: jnp.ndarray          # [..., P] rad/sample (coarse + pilot residual)
    gamma: jnp.ndarray        # [..., P] channel gain
    evm_db: jnp.ndarray       # [..., P] pilot-referenced QPSK EVM (dB)
    symbols: jnp.ndarray      # [..., P, 600] corrected payload symbols


def _quad_peak(ym1, y0, yp1):
    """Quadratic interpolation of a 3-point peak -> (frac offset, value)."""
    a = 0.5 * (yp1 + ym1) - y0
    b = 0.5 * (yp1 - ym1)
    frac = jnp.where(jnp.abs(a) > 1e-20, -b / (2 * jnp.where(
        jnp.abs(a) > 1e-20, a, 1.0)), 0.0)
    return frac, a * frac * frac + b * frac + y0


def framesync64_stream(block_len: int, threshold: float = 0.5,
                       max_frames: int | None = None,
                       name: str = "framesync64_stream") -> Proc:
    """Streaming multi-frame frame64 receiver as a jittable block Proc.

    apply(params, carry, x[..., block_len]) -> (Frame64Block, carry').
    Every frame whose first sample enters the stream is decoded exactly
    once (in arrival order within each block's slot axis); leading batch
    axes process independent channels via vmap.

    block_len must be a multiple of 256 (the detection segment hop, so
    that the absolute segment grid is block-invariant).
    """
    T = int(block_len)
    if T % _DET_HOP != 0:
        raise ValueError("block_len must be a multiple of %d" % _DET_HOP)
    P = max_frames if max_frames is not None else T // FRAME64_LEN + 2
    C = _stream_constants()
    s_len, s2_sum = C["s_len"], C["s2_sum"]
    n_seg = (_HIST + T - _DET_NFFT) // _DET_HOP + 1
    starts = (np.arange(n_seg) * _DET_HOP).astype(np.int32)
    Lb = C["bank"].shape[1]
    npil = len(C["pil_idx"])

    def init(batch_shape=(), dtype=jnp.complex64):
        return {"buf": jnp.zeros(batch_shape + (_HIST,), jnp.complex64),
                "base": jnp.full(batch_shape, -_HIST, jnp.int32),
                # buffer-relative position before which detections are
                # suppressed: the analog of the reference's re-arm-after-
                # frame (its seek state machine consumes the whole frame
                # before looking again, framesync64.c:241-269)
                "last_end": jnp.full(batch_shape, -(1 << 30), jnp.int32)}

    def _apply_1d(carry, x):
        buf = jnp.concatenate([carry["buf"], x.astype(jnp.complex64)],
                              axis=-1)                      # [H+T]
        So = lax.complex(jnp.asarray(C["So_re"]), jnp.asarray(C["So_im"]))
        sconj = lax.complex(jnp.asarray(C["sconj_re"]),
                            jnp.asarray(C["sconj_im"]))
        pilots = lax.complex(jnp.asarray(C["pil_re"]),
                             jnp.asarray(C["pil_im"]))

        # ---- detect everywhere (qdetector seek, batched) ----
        seg_idx = starts[:, None] + np.arange(_DET_NFFT)[None, :]
        segs = buf[jnp.asarray(seg_idx)]                    # [n_seg, NFFT]
        Xf = jnp.fft.fft(segs, axis=-1)
        R = jnp.fft.ifft(Xf[:, None, :] * jnp.conj(So)[None],
                         axis=-1) * _DET_NFFT               # [n_seg,n_off,NFFT]
        x2 = jnp.sum(segs.real ** 2 + segs.imag ** 2, axis=-1)
        g0 = jnp.sqrt(jnp.maximum(x2, 1e-20) * (s_len / _DET_NFFT))
        g = 1.0 / (_DET_NFFT * g0 * np.sqrt(s2_sum))
        # each position is owned by ONE segment: lags [0, hop)
        rxy = jnp.abs(R[..., :_DET_HOP]) * g[:, None, None]
        rxy_flat = rxy.reshape(n_seg, -1)
        seg_arg = jnp.argmax(rxy_flat, axis=-1)
        seg_peak = jnp.take_along_axis(rxy_flat, seg_arg[:, None],
                                       axis=-1)[:, 0]
        seg_off = seg_arg // _DET_HOP                       # offset-bin index
        seg_lag = seg_arg % _DET_HOP
        n0_seg = jnp.asarray(starts) + seg_lag              # buffer position
        # a peak at position p with p % hop == hop-1 has a +-1-sample
        # "twin" owned by the NEXT segment (and vice versa); keep only
        # segments that beat both neighbors so exactly the best-aligned
        # copy survives.  Deterministic across blocks: the segment grid
        # is absolute-aligned (T % hop == 0), so both blocks compare the
        # same numbers.
        neg = jnp.full((1,), -jnp.inf, seg_peak.dtype)
        pk_prev = jnp.concatenate([neg, seg_peak[:-1]])
        pk_next = jnp.concatenate([seg_peak[1:], neg])
        local = (seg_peak > pk_prev) & (seg_peak >= pk_next)
        cand = (seg_peak > threshold) & (n0_seg < T) & local
        # greedy in-order suppression: once a frame is detected, nothing
        # fires again until its span has passed — kills (a) the +-1-sample
        # twin of a peak owned by the neighboring segment or emitted by
        # the next block, and (b) partial-template sidelobes inside the
        # frame body.  Same semantics as the reference's re-arm.
        span = FRAME64_LEN - 8   # small slack for +-1 peak quantization

        def _suppress(last_end, ci):
            c, p = ci
            keep = c & (p >= last_end)
            return jnp.where(keep, p + span, last_end), keep

        _, keeps = lax.scan(_suppress, carry["last_end"], (cand, n0_seg))
        cand = keeps
        n_cand = jnp.sum(cand)
        sel = jnp.nonzero(cand, size=P, fill_value=0)[0]    # first P, in order
        valid = jnp.arange(P) < n_cand
        n0 = n0_seg[sel]                                    # [P]
        off_i = seg_off[sel]
        peak = seg_peak[sel]

        # ---- per-candidate refinement (qdetector align, batched) ----
        xa = buf[n0[:, None] + np.arange(_DET_NFFT)[None, :]]  # [P, NFFT]
        Xa = jnp.fft.fft(xa, axis=-1)
        Ra = jnp.fft.ifft(Xa * jnp.conj(So)[off_i], axis=-1) * _DET_NFFT
        tau, g_pk = _quad_peak(jnp.sqrt(jnp.abs(Ra[:, -1])),
                               jnp.sqrt(jnp.abs(Ra[:, 0])),
                               jnp.sqrt(jnp.abs(Ra[:, 1])))
        gamma = g_pk * g_pk / (_DET_NFFT * s2_sum)
        # fine carrier: FFT of aligned window times conj(template)
        w = xa[:, :s_len] * sconj[None, :]
        W = jnp.fft.fft(w, _DET_NFFT, axis=-1)
        Wm = jnp.abs(W)
        i0 = jnp.argmax(Wm, axis=-1)
        vm1 = jnp.take_along_axis(Wm, ((i0 - 1) % _DET_NFFT)[:, None],
                                  axis=-1)[:, 0]
        v0 = jnp.take_along_axis(Wm, i0[:, None], axis=-1)[:, 0]
        vp1 = jnp.take_along_axis(Wm, ((i0 + 1) % _DET_NFFT)[:, None],
                                  axis=-1)[:, 0]
        frac, _ = _quad_peak(vm1, v0, vp1)
        index = i0 + frac - jnp.where(i0 > _DET_NFFT // 2, _DET_NFFT, 0)
        dphi = index * (2 * np.pi / _DET_NFFT)
        phi = jnp.angle(jnp.take_along_axis(W, i0[:, None], axis=-1)[:, 0])

        # ---- mix + polyphase matched filter + 2:1 sample (batched) ----
        b_idx = jnp.where(
            tau > 0,
            jnp.floor(tau * _NPFB), jnp.floor((1.0 + tau) * _NPFB)
        ).astype(jnp.int32) % _NPFB
        off_s = jnp.where(tau > 0, 0, -1)
        base_t = n0[:, None] + off_s[:, None] + 2 * np.arange(_NSYM_TOT)[None]
        idx = (base_t[:, :, None] + np.arange(Lb)[None, None, :]
               - (Lb - 1))                                  # [P, nsym, Lb]
        win = jnp.take(buf, idx, mode="fill", fill_value=0)
        tt = (idx - n0[:, None, None]).astype(jnp.float32)
        ph = dphi[:, None, None] * tt + phi[:, None, None]
        win = win * lax.complex(jnp.cos(ph), -jnp.sin(ph))
        taps = jnp.asarray(C["bank"])[b_idx]                # [P, Lb]
        sym = jnp.einsum("pnl,pl->pn", win, taps.astype(win.dtype))
        sym = sym * (0.5 / jnp.maximum(gamma, 1e-12))[:, None]
        payload_rx = sym[:, 64 + 2 * _M:]                   # [P, 630]

        # ---- pilot sync (qpilotsync_execute, batched) ----
        rx_pil = payload_rx[:, jnp.asarray(C["pil_idx"])]   # [P, npil]
        v = rx_pil * jnp.conj(pilots)[None, :]
        V = jnp.fft.fft(v, _PFFT, axis=-1)
        Vm = jnp.abs(V)
        j0 = jnp.argmax(Vm, axis=-1)
        um1 = jnp.take_along_axis(Vm, ((j0 - 1) % _PFFT)[:, None],
                                  axis=-1)[:, 0]
        u0 = jnp.take_along_axis(Vm, j0[:, None], axis=-1)[:, 0]
        up1 = jnp.take_along_axis(Vm, ((j0 + 1) % _PFFT)[:, None],
                                  axis=-1)[:, 0]
        frac2, _ = _quad_peak(um1, u0, up1)
        jdx = j0 + frac2 - jnp.where(j0 > _PFFT // 2, _PFFT, 0)
        dphi2 = jdx * (2 * np.pi / (_PFFT * 21))
        rot = dphi2[:, None] * (np.arange(npil) * 21)[None, :]
        metric = jnp.sum(v * lax.complex(jnp.cos(rot), -jnp.sin(rot)),
                         axis=-1)
        phi2 = jnp.angle(metric)
        g2 = jnp.abs(metric) / npil
        i_all = np.arange(630)[None, :]
        ph2 = dphi2[:, None] * i_all + phi2[:, None]
        corr = lax.complex(jnp.cos(ph2), -jnp.sin(ph2)) \
            / jnp.maximum(g2, 1e-12)[:, None]
        frame_corr = payload_rx * corr
        syms = frame_corr[:, jnp.asarray(C["data_idx"])]    # [P, 600]

        # ---- pilot-referenced stats ----
        s2 = np.float32(np.sqrt(0.5))
        near = lax.complex(jnp.sign(syms.real) * s2, jnp.sign(syms.imag) * s2)
        evm = jnp.sqrt(jnp.mean(jnp.abs(syms - near) ** 2, axis=-1))
        evm_db = 20.0 * jnp.log10(evm + 1e-12)

        out = Frame64Block(
            valid=valid,
            sample_index=carry["base"] + n0.astype(jnp.int32),
            rxy=peak, cfo=dphi + dphi2 / _K, gamma=gamma, evm_db=evm_db,
            symbols=syms)
        # advance the suppression watermark into next block's coordinates
        last_n0 = jnp.max(jnp.where(cand, n0_seg, -(1 << 30)))
        new_last = jnp.maximum(carry["last_end"],
                               jnp.where(n_cand > 0, last_n0 + span,
                                         -(1 << 30))) - T
        new_carry = {"buf": buf[..., T:], "base": carry["base"] + T,
                     "last_end": jnp.maximum(new_last, -(1 << 30))}
        return out, new_carry

    def apply(params, carry, x):
        if x.ndim == 1:
            return _apply_1d(carry, x)
        batch = x.shape[:-1]
        xf = x.reshape((-1, T))
        cf = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[len(batch):]), carry)
        out, nc = jax.vmap(_apply_1d)(cf, xf)
        out = jax.tree_util.tree_map(
            lambda a: a.reshape(batch + a.shape[1:]), out)
        nc = jax.tree_util.tree_map(
            lambda a: a.reshape(batch + a.shape[1:]), nc)
        return out, nc

    return Proc(params=(), init=init, apply=apply, rate=(1, 1), name=name)


class Framesync64:
    """Callback-contract wrapper over the streaming Proc: the analog of
    the reference framesync64 object (create/execute/callback-per-frame,
    reference framesync64.c:66-120).  Feed arbitrary-length sample
    arrays via execute(); the callback fires once per decoded frame with
    (header bytes, header_ok, payload bytes, payload_ok, stats dict).
    Byte-domain FEC (Golay+CRC) runs here on host — sample-domain work
    stays on device in the jitted Proc."""

    def __init__(self, callback: Optional[Callable] = None,
                 block_len: int = 4096, threshold: float = 0.5):
        self.callback = callback
        self.block_len = int(block_len)
        self._proc = framesync64_stream(self.block_len, threshold)
        self._carry = self._proc.init()
        self._jit = jax.jit(self._proc.apply)
        self._pending = np.zeros(0, np.complex64)
        self.frames: list = []       # decoded results (also returned)
        self.num_frames_detected = 0

    def execute(self, x):
        """Consume samples; fire the callback per decoded frame.  Any
        remainder shorter than block_len is buffered for the next call."""
        self._pending = np.concatenate(
            [self._pending, np.asarray(x, np.complex64)])
        results = []
        while len(self._pending) >= self.block_len:
            blk = self._pending[:self.block_len]
            self._pending = self._pending[self.block_len:]
            out, self._carry = self._jit((), self._carry, jnp.asarray(blk))
            results.extend(self._drain(out))
        return results

    def flush(self):
        """Process buffered samples (zero-padded) plus enough zero blocks
        to flush frames still inside the history window."""
        tail = int(np.ceil((_HIST + self.block_len) / self.block_len))
        pad = (-len(self._pending)) % self.block_len + tail * self.block_len
        return self.execute(np.zeros(pad, np.complex64))

    def _drain(self, out: Frame64Block):
        o = jax.tree_util.tree_map(np.asarray, out)
        res = []
        for p in range(len(o.valid)):
            if not o.valid[p]:
                continue
            self.num_frames_detected += 1
            payload_bytes, ok = qpacketmodem_decode(
                o.symbols[p], 72, "crc24", "none", "golay2412", "qpsk")
            stats = {"rxy": float(o.rxy[p]),
                     "evm_db": float(o.evm_db[p]),
                     "rssi_db": float(20 * np.log10(max(o.gamma[p], 1e-12))),
                     "cfo": float(o.cfo[p]),
                     "sample_index": int(o.sample_index[p])}
            frame = (payload_bytes[:8].copy(), bool(ok),
                     payload_bytes[8:].copy(), bool(ok), stats)
            self.frames.append(frame)
            if self.callback is not None:
                self.callback(*frame)
            res.append(frame)
        return res
