"""Stdout tee logger (reference: utils/logger.py:4-21 — defined there but
never imported; provided here as a working utility)."""

from __future__ import annotations

import sys


class Logger:
    """Tees writes to the real stdout and a log file. Use:
        sys.stdout = Logger("log/run.txt")
    """

    def __init__(self, path: str, mode: str = "a"):
        self.terminal = sys.stdout
        self.log = open(path, mode, encoding="utf-8")

    def write(self, message: str) -> int:
        n = self.terminal.write(message)
        self.log.write(message)
        return n  # TextIOBase contract: chars written

    def flush(self) -> None:
        self.terminal.flush()
        self.log.flush()

    def close(self) -> None:
        self.log.close()

    def __getattr__(self, name):
        # delegate the rest of the stream protocol (isatty, encoding,
        # fileno, buffer, …) to the real stdout so libraries probing
        # sys.stdout keep working after the tee is installed
        return getattr(self.terminal, name)
