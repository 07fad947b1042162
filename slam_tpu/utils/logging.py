"""Tagged dual-sink run logger.

Mirrors the reference's ``log_line`` loggers: every line goes to stdout and
to a flushed per-method logfile (``layer_manager.cpp:658-664``,
``simple_layer_manager.cpp:800-807``), with bracketed tags like ``[uct]``,
``[conflict]``, ``[assign]``, ``[reward]`` so runs are grep-able.
"""

from __future__ import annotations

import sys
import time


class RunLogger:
    def __init__(self, path: str | None = None, echo: bool = True):
        self._fp = open(path, "w") if path else None
        self._echo = echo
        self._t0 = time.perf_counter()

    def log(self, tag: str, msg: str = "", **fields) -> None:
        parts = [f"[{tag}]"]
        if msg:
            parts.append(msg)
        parts += [f"{k}={_fmt(v)}" for k, v in fields.items()]
        line = " ".join(parts)
        if self._echo:
            print(line)
            sys.stdout.flush()
        if self._fp:
            self._fp.write(line + "\n")
            self._fp.flush()

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def close(self) -> None:
        if self._fp:
            self._fp.close()
            self._fp = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)
