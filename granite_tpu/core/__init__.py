from .device import Backend, Device, FrameContext, ContextCreationFlags
from .stats import StatSink, TimestampIntervalStats
