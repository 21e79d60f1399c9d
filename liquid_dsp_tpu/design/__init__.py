from .firdespm import firdespm, firdespm_lowpass  # noqa: F401
from .iirdes import iirdes, iirdes_sos, iirdes_pll_active_lag, iirdes_pll_active_pi  # noqa: F401
