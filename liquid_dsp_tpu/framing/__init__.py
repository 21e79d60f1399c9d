"""Framing layer: packet modems, pilot sync, preamble detection, and
full TX/RX frame PHY chains (capability parity with reference
src/framing/; SURVEY.md §2.10)."""
from .qpacket import (  # noqa: F401
    qpacketmodem_frame_len, qpacketmodem_encode, qpacketmodem_decode,
    qpilot_pilots, qpilot_frame_len, qpilotgen, qpilotsync,
)
from .detector import qdetector_detect, make_template, DetectorResult  # noqa: F401
from .frame64 import (  # noqa: F401
    FRAME64_LEN, framegen64, framesync64, Frame64Result, frame64_preamble,
)
from .flexframe import (  # noqa: F401
    flexframegen, flexframesync, FlexFrameResult, FLEXFRAME_H_USER,
)
from .ofdmflexframe import (  # noqa: F401
    ofdmflexframegen, ofdmflexframesync, OFDMFlexResult,
    OFDMFLEXFRAME_H_USER,
)
from .gmskframe import (  # noqa: F401
    gmskframegen, gmskframesync, GMSKFrameResult, GMSKFRAME_H_USER,
)
from .symtrack import symtrack, SymtrackResult  # noqa: F401
from .sources import (  # noqa: F401
    symstream, msource, FrameSyncStats, FrameDataStats,
)
from .bpacket import (  # noqa: F401
    bpacketgen, bpacketsync, BPacketResult, bsync_correlate,
    bpresync_detect, detector_cccf_detect,
)

# streaming block-Proc receivers (detect-everywhere pipelines) + their
# callback-contract wrappers — the persistent-object API surface
from .stream_rx import preamble_stream, detector_stream  # noqa: F401
from .frame64 import (  # noqa: F401
    framesync64_stream, framesync64_stream_full, Framesync64,
)
from .flexframe import (  # noqa: F401
    flexframe_rx_stream, flexframe_rx_stream_multi, FlexFrameSync,
)
from .gmskframe import gmskframe_rx_stream, GMSKFrameSync  # noqa: F401
from .ofdmflex_stream import (  # noqa: F401
    ofdmflex_rx_stream, OFDMFlexStreamRX,
)
from .symtrack import symtrack_stream, Symtrack  # noqa: F401
