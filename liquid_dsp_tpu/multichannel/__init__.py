"""Multichannel: polyphase channelizers and OFDM frame PHY
(capability parity with reference src/multichannel/; SURVEY.md §2.9)."""
from .channelizer import (  # noqa: F401
    firpfbch_kaiser_taps, firpfbch_analyzer, firpfbch_synthesizer,
    firpfbch2_analyzer, firpfbch2_synthesizer,
)
from .ofdm import (  # noqa: F401
    ofdm_params, ofdm_generate_frame, ofdm_frame_sync, OFDMParams,
    OFDMSyncResult, default_sctype,
)
