"""Profiling hooks.

Reference analog: ``torch.profiler`` inlined into ``fit`` for epoch 0 when
``profile_epochs > 0`` (torchrecsys/model.py:237-269), printing a CPU-time
table. The TPU equivalent captures a ``jax.profiler`` trace (viewable in
TensorBoard / Perfetto) plus a per-step wall-clock summary; the
``profile_epochs`` knob is kept on both Trainer and the RecSys facade.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

from torchrecsys_tpu.utils.logging import get_logger

log = get_logger("torchrecsys_tpu.profiling")


@contextlib.contextmanager
def trace(trace_dir: str = "/tmp/torchrecsys_tpu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace around a block (device + host timeline)."""
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info(
            "profiler trace captured (%.2fs) -> %s "
            "(view: tensorboard --logdir %s, or Perfetto)",
            time.perf_counter() - t0,
            trace_dir,
            trace_dir,
        )


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the trace timeline (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def op_summary(trace_dir: str, row_limit: int = 20) -> str:
    """In-terminal per-op device-time digest of the latest trace in
    ``trace_dir`` — reference parity with torch.profiler's
    ``key_averages().table(sort_by=..., row_limit=20)`` print
    (torchrecsys/model.py:268-269). Returns the formatted table."""
    from torchrecsys_tpu.utils import xplane

    path = xplane.latest_trace_file(trace_dir)
    if path is None:
        return f"(no xplane.pb trace found under {trace_dir})"
    try:
        return xplane.format_op_table(path, row_limit=row_limit)
    except Exception as e:  # a digest must never break training
        return f"(failed to parse trace {path}: {type(e).__name__}: {e})"
