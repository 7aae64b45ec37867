"""Structured logging setup.

Capability parity with the reference's tracing/tracing-subscriber stack
(src/bin/main.rs:86-97, src/lib.rs:122-153): two layers — pretty stdout at
one level and a `main.log` file at another — plus one-shot warning latches
(the reference's lazy_static AtomicBool pattern,
src/integrator/utils.rs:233-244).
"""

from __future__ import annotations

import logging
import threading

_WARNED: set = set()
_LOCK = threading.Lock()


def setup_logging(stdout_level: str = "WARNING", file_level: str = "INFO",
                  log_file: str = "main.log") -> logging.Logger:
    root = logging.getLogger("pathtracer_tpu")
    root.setLevel(logging.DEBUG)
    root.handlers.clear()
    sh = logging.StreamHandler()
    sh.setLevel(getattr(logging, stdout_level.upper(), logging.WARNING))
    sh.setFormatter(logging.Formatter("%(asctime)s %(levelname)-7s %(name)s: %(message)s"))
    root.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setLevel(getattr(logging, file_level.upper(), logging.INFO))
        fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)-7s %(name)s: %(message)s"))
        root.addHandler(fh)
    return root


def warn_once(logger: logging.Logger, key: str, message: str, *args):
    """Emit a warning only the first time `key` is seen (one-shot latch)."""
    with _LOCK:
        if key in _WARNED:
            return
        _WARNED.add(key)
    logger.warning(message, *args)
