"""Logging with Granite's severity API (reference: util/logging.hpp:48-78).

The reference exposes LOGI/LOGW/LOGE macros with a pluggable LoggingInterface
sink routed through a global message queue.  We keep the same three-severity
surface on top of Python logging, with a pluggable sink callback.
"""

from __future__ import annotations

import logging
import sys
from typing import Callable, Optional

_logger = logging.getLogger("granite_tpu")
if not _logger.handlers:
    _handler = logging.StreamHandler(sys.stderr)
    _handler.setFormatter(logging.Formatter("[%(levelname).1s] %(message)s"))
    _logger.addHandler(_handler)
    _logger.setLevel(logging.INFO)

# Optional user sink: callable(severity: str, message: str) -> bool.
# Returning True swallows the message (reference LoggingInterface::log).
_sink: Optional[Callable[[str, str], bool]] = None


def set_log_sink(sink: Optional[Callable[[str, str], bool]]) -> None:
    global _sink
    _sink = sink


def get_logger() -> logging.Logger:
    return _logger


def _log(severity: str, fmt: str, *args) -> None:
    msg = fmt % args if args else fmt
    if _sink is not None and _sink(severity, msg):
        return
    if severity == "info":
        _logger.info(msg)
    elif severity == "warn":
        _logger.warning(msg)
    else:
        _logger.error(msg)


def LOGI(fmt: str, *args) -> None:
    _log("info", fmt, *args)


def LOGW(fmt: str, *args) -> None:
    _log("warn", fmt, *args)


def LOGE(fmt: str, *args) -> None:
    _log("error", fmt, *args)
