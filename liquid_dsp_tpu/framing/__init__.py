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
