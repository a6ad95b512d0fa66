"""Key-value training log: `name value\\n` text stream (rnn_log_float/int,
recur-nn.h:337-349), consumed unchanged by the reference's ./plot tool and
ours (scripts/plot)."""

from __future__ import annotations

from typing import IO, Optional


class KvLog:
    def __init__(self, path: Optional[str] = None, append: bool = False):
        self.f: Optional[IO[str]] = None
        if path:
            self.f = open(path, "a" if append else "w")

    def set_file(self, path: Optional[str], append: bool = False,
                 generation: int = 0):
        """rnn_set_log_file (recur-nn-init.c:268-283)."""
        if self.f:
            self.f.close()
            self.f = None
        if path:
            self.f = open(path, "a" if append else "w")
            if not append:
                self.log_int("generation", generation)

    def log_float(self, name: str, value: float):
        if self.f:
            self.f.write(f"{name} {value:.5g}\n")

    def log_int(self, name: str, value: int):
        if self.f:
            self.f.write(f"{name} {int(value)}\n")

    def flush(self):
        if self.f:
            self.f.flush()

    def close(self):
        if self.f:
            self.f.close()
            self.f = None
