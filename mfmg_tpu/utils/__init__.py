from mfmg_tpu.utils.info_parser import parse_info
from mfmg_tpu.utils.timer import TimerOutput

__all__ = ["parse_info", "TimerOutput"]
