"""Support utilities: sequences, buffers, packing (reference src/sequence,
src/buffer, src/utility)."""
from .sequence import (  # noqa: F401
    MSequence, msequence_bits, msequence_symbols, MSEQUENCE_DEFAULT_POLY,
    bsequence_correlate,
)
