"""Block-level debug tap points: the runtime analog of the reference's
compile-time DEBUG_* machinery (reference src/framing/src/framesync64.c:
38-41 DEBUG_FRAMESYNC64 and the debug_x windows :116-118, which dump
internal state to Octave .m files when compiled in).

Here the taps are runtime-gated and dump numpy arrays:

    from liquid_dsp_tpu import debug
    with debug.capture() as store:
        sync.execute(samples)
    store["stream_rx.rxy"]       # list of per-block arrays
    debug.dump("rx_debug.npz")   # or persist for plotting

`tap(name, value)` is free when no capture is active: the flag is
checked at TRACE time, so disabled taps stage nothing into the
compiled program.  Entering capture() clears jax's compilation caches
so already-jitted pipelines re-trace with taps live (the reference
needs a recompile for the same effect); leaving clears them again so
later runs drop the host callbacks.
"""
from __future__ import annotations

from contextlib import contextmanager

import numpy as np

__all__ = ["tap", "capture", "enabled", "dump", "store"]

_ENABLED = False
_STORE: dict[str, list] = {}


def enabled() -> bool:
    """True while a capture() context is active."""
    return _ENABLED


def tap(name: str, value) -> None:
    """Record a named array from inside jitted code (no-op unless a
    capture() is active at trace time)."""
    if not _ENABLED:
        return
    import jax

    def _cb(v):
        _STORE.setdefault(name, []).append(np.asarray(v))

    jax.debug.callback(_cb, value)


def store() -> dict:
    """The current capture store: name -> list of per-call arrays."""
    return _STORE


@contextmanager
def capture():
    """Enable tap points for the duration of the context; yields the
    store dict (name -> list of arrays, one entry per tapped call)."""
    global _ENABLED
    import jax
    _STORE.clear()
    _ENABLED = True
    jax.clear_caches()      # re-trace existing jits with taps live
    try:
        yield _STORE
    finally:
        _ENABLED = False
        jax.clear_caches()  # drop the callback-bearing executables


def dump(path: str) -> None:
    """Persist the capture store as an .npz (stacked per tap name)."""
    arrs = {}
    for k, v in _STORE.items():
        key = k.replace(".", "_")
        try:
            arrs[key] = np.stack(v)
        except ValueError:      # ragged across calls: save individually
            for i, a in enumerate(v):
                arrs[f"{key}_{i}"] = a
    np.savez(path, **arrs)
