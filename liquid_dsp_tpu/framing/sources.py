"""Signal sources: symstream (shaped modem symbol stream) and msource
(multi-signal mixer), plus frame statistics containers.

Reference analogs (studied, not copied):
  * symstream — src/framing/src/symstream.c:33+: random modem symbols
    pulse-shaped by an interpolating rnyquist filter at k samples/symbol.
  * msource — src/framing/src/msource.c:57-182: mixer of independent
    sources (tone, noise, modem symstream), each with its own gain and
    center frequency.
  * framesyncstats / framedatastats — src/framing/src/framesyncstats.c:
    per-frame EVM/RSSI/CFO record and aggregate counters.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..design.firdes import firdes_prototype
from ..ops.fir import firinterp
from ..modem import constellation, modulate

__all__ = ["symstream", "msource", "FrameSyncStats", "FrameDataStats"]


def symstream(n_samples: int, ftype: str = "arkaiser", k: int = 2,
              m: int = 7, beta: float = 0.3, ms: str = "qpsk",
              seed: int = 0) -> np.ndarray:
    """Generate n_samples of a pulse-shaped random symbol stream
    (reference symstreamcf_create_linear + _write_samples)."""
    if n_samples % k:
        raise ValueError(f"symstream length {n_samples} must be a "
                         f"multiple of k={k}")
    rng = np.random.default_rng(seed)
    table = constellation(ms)
    n_sym = n_samples // k
    syms = np.asarray(modulate(table, jnp.asarray(
        rng.integers(0, len(table), n_sym))))
    tx = firinterp(k, firdes_prototype(ftype, k, m, beta))
    y, _ = tx(jnp.asarray(syms.astype(np.complex64)), batch_shape=())
    return np.asarray(y).astype(np.complex64)


def msource(n_samples: int, sources=(), seed: int = 0) -> np.ndarray:
    """Mix multiple sources (reference msourcecf):

    sources: list of dicts with key 'kind' in {'tone','noise','modem'},
    and optional 'gain_db' (default 0), 'fc' (center frequency,
    cycles/sample, default 0), plus modem kwargs (ms, k, m, beta).
    """
    out = np.zeros(n_samples, np.complex64)
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples)
    for i, src in enumerate(sources):
        kind = src["kind"]
        g = 10.0 ** (src.get("gain_db", 0.0) / 20.0)
        fc = src.get("fc", 0.0)
        if kind == "tone":
            sig = np.ones(n_samples, np.complex64)
        elif kind == "noise":
            sig = ((rng.standard_normal(n_samples) +
                    1j * rng.standard_normal(n_samples)) / np.sqrt(2))
        elif kind == "modem":
            k = src.get("k", 2)
            n_pad = n_samples + ((-n_samples) % k)
            sig = symstream(n_pad, src.get("ftype", "arkaiser"), k,
                            src.get("m", 7), src.get("beta", 0.3),
                            src.get("ms", "qpsk"),
                            seed=seed + 17 * i)[:n_samples]
        else:
            raise ValueError(f"unknown msource kind {kind!r}")
        out = out + (g * sig * np.exp(2j * np.pi * fc * t)
                     ).astype(np.complex64)
    return out


@dataclass
class FrameSyncStats:
    """Per-frame statistics (reference framesyncstats_s)."""
    evm: float = 0.0          # error vector magnitude [dB]
    rssi: float = 0.0         # received signal strength [dB]
    cfo: float = 0.0          # carrier frequency offset [rad/sample]
    mod_scheme: str = ""      # modulation scheme
    check: str = ""           # CRC scheme
    fec0: str = ""
    fec1: str = ""


@dataclass
class FrameDataStats:
    """Aggregate frame counters (reference framedatastats_s)."""
    num_frames_detected: int = 0
    num_headers_valid: int = 0
    num_payloads_valid: int = 0
    num_bytes_received: int = 0

    def update(self, header_ok: bool, payload_ok: bool, n_bytes: int):
        self.num_frames_detected += 1
        self.num_headers_valid += int(header_ok)
        self.num_payloads_valid += int(payload_ok)
        if payload_ok:
            self.num_bytes_received += n_bytes

    def reset(self):
        self.num_frames_detected = 0
        self.num_headers_valid = 0
        self.num_payloads_valid = 0
        self.num_bytes_received = 0
