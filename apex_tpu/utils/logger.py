"""Logging setup mirroring the reference's tracing subscriber
(src/logger.rs:29-61): bracketed timestamp + colored level + target,
file:line on DEBUG, level override via APEX_LOG (the RUST_LOG analogue),
INFO default.
"""

from __future__ import annotations

import logging
import os
import sys

_COLORS = {
    "DEBUG": "\x1b[36m",
    "INFO": "\x1b[32m",
    "WARNING": "\x1b[33m",
    "ERROR": "\x1b[31m",
    "CRITICAL": "\x1b[41m",
}
_RESET = "\x1b[0m"


class _BracketFormatter(logging.Formatter):
    def __init__(self, color: bool):
        super().__init__()
        self.color = color

    def format(self, record):
        ts = self.formatTime(record, "%Y-%m-%d %H:%M:%S")
        level = record.levelname
        if self.color and level in _COLORS:
            level = f"{_COLORS[record.levelname]}{level}{_RESET}"
        loc = ""
        if record.levelno <= logging.DEBUG:
            loc = f" {record.filename}:{record.lineno}"
        return f"[{ts}] [{level}] [{record.name}{loc}] {record.getMessage()}"


def init_logger(level: str | None = None) -> logging.Logger:
    """Initialize the apex_tpu logger. Level resolution: explicit arg >
    APEX_LOG env var > INFO."""
    level = level or os.environ.get("APEX_LOG", "INFO")
    logger = logging.getLogger("apex_tpu")
    logger.setLevel(level.upper())
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(_BracketFormatter(color=sys.stderr.isatty()))
        logger.addHandler(h)
    logger.propagate = False
    return logger
