from .logging import LOGI, LOGW, LOGE, set_log_sink, get_logger
from .hashing import fnv1a, hash_combine, Hasher
from .timer import get_current_time_nsecs, FrameTimer
from .timeline_trace import TimelineTraceFile, scoped_timeline_event
from .environment import get_environment, get_environment_int, get_environment_bool
