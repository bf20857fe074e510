"""Structured logging + per-frame metrics.

Replacement for the reference's ANSI `[Component]::[LEVEL]::msg` console
convention (ref: src/Tool/ConsoleColor.h, e.g. CubeHandler.cpp:203-209) with
the addition SURVEY §5 calls for: a metrics dict per frame appended to a
JSONL file for offline analysis.
"""

from __future__ import annotations

import json
import sys
import time

_COLORS = {"DEBUG": "\033[34m", "INFO": "\033[32m", "WARN": "\033[33m", "ERROR": "\033[31m"}
_RESET = "\033[0m"

VERBOSITY = 1  # 0 silent, 1 info, 2 debug


def log(component: str, level: str, msg: str) -> None:
    if VERBOSITY == 0 or (level == "DEBUG" and VERBOSITY < 2):
        return
    color = _COLORS.get(level, "")
    print(f"{color}[{component}]::[{level}]::{msg}{_RESET}", file=sys.stderr)


class MetricsLogger:
    """Append per-frame metric dicts to a JSONL file."""

    def __init__(self, path: str | None = None):
        self.path = path
        self._fh = open(path, "a") if path else None
        self.history: list[dict] = []

    def record(self, **metrics) -> None:
        metrics.setdefault("ts", time.time())
        self.history.append(metrics)
        if self._fh:
            self._fh.write(json.dumps(metrics) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
