"""Structured logging.

The reference's entire observability story is bare ``print`` statements
(torchrecsys/model.py:131,288,335-336 — SURVEY §5.5). Here every component
logs through a namespaced stdlib logger; ``verbose=True`` paths emit at INFO
so default behavior matches the reference's prints, and libraries embedding
the framework can silence or redirect it normally.
"""

from __future__ import annotations

import logging
import sys

_CONFIGURED = False


def get_logger(name: str = "torchrecsys_tpu") -> logging.Logger:
    global _CONFIGURED
    logger = logging.getLogger(name)
    if not _CONFIGURED:
        root = logging.getLogger("torchrecsys_tpu")
        if not root.handlers:
            h = logging.StreamHandler(sys.stdout)
            h.setFormatter(logging.Formatter("[%(name)s] %(message)s"))
            root.addHandler(h)
            root.setLevel(logging.INFO)
            root.propagate = False
        _CONFIGURED = True
    return logger
