"""Leveled logger with pluggable appenders/formatter.

Capability parity with the reference logging layer
(``/root/reference/include/mitsuba/core/logger.h:116`` leveled ``Logger``,
``appender.h:65`` ``StreamAppender``, ``formatter.h``): ETrace..EError
levels, per-component log lines, appenders for console and files (the
im-mts frontend writes one log file per host,
``src/im-mts/mitsuba.cpp:152-160``), and a module-level ``Log`` entry
point.  Built on the stdlib ``logging`` machinery (one process-wide logger
here stands in for the reference's per-thread instances — JAX work is
dispatched from one host thread)."""
from __future__ import annotations

import logging
import sys

ETrace = 5
EDebug = logging.DEBUG
EInfo = logging.INFO
EWarn = logging.WARNING
EError = logging.ERROR

logging.addLevelName(ETrace, "TRACE")

_LOGGER_NAME = "mitsuba_im_tpu"


class DefaultFormatter(logging.Formatter):
    """Reference-style line format: ``2010-01-01 00:00:00 INFO  comp: msg``."""

    def __init__(self):
        super().__init__("%(asctime)s %(levelname)-5s %(name)s: %(message)s",
                         "%Y-%m-%d %H:%M:%S")


def get_logger(component: str | None = None) -> logging.Logger:
    name = _LOGGER_NAME if component is None else f"{_LOGGER_NAME}.{component}"
    return logging.getLogger(name)


def set_log_level(level: int):
    get_logger().setLevel(level)


def add_stream_appender(stream=None, level: int = EInfo) -> logging.Handler:
    h = logging.StreamHandler(stream or sys.stderr)
    h.setFormatter(DefaultFormatter())
    h.setLevel(level)
    root = get_logger()
    root.addHandler(h)
    if root.level == logging.NOTSET or root.level > level:
        root.setLevel(level)
    return h


def add_file_appender(path: str, level: int = EDebug) -> logging.Handler:
    h = logging.FileHandler(path)
    h.setFormatter(DefaultFormatter())
    h.setLevel(level)
    root = get_logger()
    root.addHandler(h)
    if root.level == logging.NOTSET or root.level > level:
        root.setLevel(level)
    return h


def remove_appender(handler: logging.Handler):
    get_logger().removeHandler(handler)


def Log(level: int, msg: str, *args, component: str | None = None):
    """Reference ``SLog``/``Log`` macro analog."""
    get_logger(component).log(level, msg, *args)
