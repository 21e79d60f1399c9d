"""Modems: linear (PSK/DPSK/ASK/QAM/APSK/arb), GMSK, FSK/CPFSK, analog.

Capability parity target: reference src/modem/ (SURVEY.md §2.8).
"""
from .linear import (  # noqa: F401
    MODEM_SCHEMES, constellation, bits_per_symbol,
    gray_encode, gray_decode,
    modulate, demodulate, demodulate_soft, soft_to_hard, phase_error,
    modem_modulator, modem_demodulator, dpsk_modulator, dpsk_demodulator,
)
from .cpm import (  # noqa: F401
    fsk_modulator, fsk_demodulator, fsk_fft_size,
    gmsk_modulator, gmsk_demodulator,
    cpfsk_pulse, cpfsk_modulator, cpfsk_demodulator,
)
from .analog import (  # noqa: F401
    freq_modulator, freq_demodulator, amp_modulator, amp_demodulator,
)
