"""Soft-bit deinterleaving ahead of a soft Viterbi decoder: a burst of
corrupted soft bits is spread across the codeword so the decoder sees
isolated low-confidence bits (reference interleaver_soft_example.c)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.fec.dispatch import (
    fec_encode, fec_decode_soft, fec_get_enc_msg_length)
from liquid_dsp_tpu.fec.interleave import interleave_soft, deinterleave_soft

rng = np.random.default_rng(3)
n = 32                                   # message bytes
scheme = "v27"                           # K=7 rate-1/2 convolutional
msg = rng.integers(0, 256, n, dtype=np.uint8)
enc = fec_encode(scheme, msg)
n_enc = fec_get_enc_msg_length(scheme, n)

# map coded bits to confident soft bits (0 -> 26, 1 -> 229) and interleave
bits = np.unpackbits(enc)
soft = np.where(bits > 0, 229, 26).astype(np.uint8)
soft_i = interleave_soft(soft, depth=4)

# a contiguous burst erases 40 soft bits (set to "no information" = 128)
burst_at = 200
soft_i[burst_at:burst_at + 40] = 128

# deinterleave: the burst scatters into isolated weak bits
soft_d = deinterleave_soft(soft_i, depth=4)
weak = np.where(soft_d == 128)[0]
gaps = np.diff(weak)
print(f"burst of 40 erased soft bits at {burst_at}")
print(f"after deinterleaving: min spacing {gaps.min()}, "
      f"median spacing {int(np.median(gaps))} bits")

# fec_decode_soft takes float LLRs, positive = bit 1
llr_d = (soft_d.astype(np.float32) - 127.5) / 127.5
dec = fec_decode_soft(scheme, llr_d, n)
errs = int(np.unpackbits(dec ^ msg).sum())
print(f"soft Viterbi decode bit errors: {errs} / {8 * n}")

# without interleaving the same burst hits consecutive coded bits
soft_b = np.where(bits > 0, 229, 26).astype(np.uint8)
soft_b[burst_at:burst_at + 40] = 128
llr_b = (soft_b.astype(np.float32) - 127.5) / 127.5
dec_b = fec_decode_soft(scheme, llr_b, n)
errs_b = int(np.unpackbits(dec_b ^ msg).sum())
print(f"same burst, no interleaver    : {errs_b} / {8 * n} bit errors")
