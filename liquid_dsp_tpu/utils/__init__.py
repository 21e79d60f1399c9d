"""Support utilities: sequences, random/scrambling, matrices, polynomials,
quantization, audio codec, optimization (reference src/{sequence,random,
matrix,math,quantization,audio,optim}; SURVEY.md §2.11)."""
from .sequence import (  # noqa: F401
    MSequence, msequence_bits, msequence_symbols, MSEQUENCE_DEFAULT_POLY,
    bsequence_correlate,
)
from .random import (  # noqa: F401
    randnf, crandnf, randexpf, randweibf, randgammaf, randnakmf,
    randricekf, scramble_data, unscramble_data, jax_awgn, jax_crandn,
)
from .matrix import (  # noqa: F401
    matrix_add, matrix_sub, matrix_mul, matrix_aug, matrix_trans,
    matrix_hermitian, matrix_transmul, matrix_multrans, matrix_inv,
    matrix_linsolve, matrix_cgsolve, matrix_ludecomp, matrix_qrdecomp,
    matrix_chol, matrix_gramschmidt, SMatrix,
)
from .poly import (  # noqa: F401
    poly_val, poly_fit, poly_fit_lagrange, poly_interp_lagrange,
    poly_expandroots, poly_findroots, poly_mul,
)
from .quantization import (  # noqa: F401
    compress_mulaw, expand_mulaw, compress_cf_mulaw, expand_cf_mulaw,
    quantize_adc, quantize_dac,
)
from .audio import cvsd_encode, cvsd_decode  # noqa: F401
from .optim import gradsearch, qnsearch, gasearch  # noqa: F401
from .buffer import Window, CBuffer, WDelay  # noqa: F401
from .checkpoint import save_carry, load_carry  # noqa: F401
