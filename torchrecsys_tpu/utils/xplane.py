"""Minimal XSpace (jax.profiler trace) reader + per-op time aggregation.

``jax.profiler`` writes traces as XSpace protobufs (``*.xplane.pb``). The
usual consumers are TensorBoard/Perfetto UIs; for the reference-parity
in-terminal digest (the reference prints
``key_averages().table(sort_by="self_cpu_time_total", row_limit=20)``,
torchrecsys/model.py:268-269) the trace must be read programmatically. The
environment's tensorboard profile plugin is ABI-incompatible with its
tensorflow, so this module decodes the protobuf wire format directly — ~60
lines, no dependency beyond the stdlib, decoding only the fields needed:

  XSpace.planes[]        (field 1)
  XPlane.name            (2), .lines[] (3), .event_metadata{} (4)
  XLine.name             (2), .display_name (11), .events[] (6)
  XEvent.metadata_id     (1), .duration_ps (3)
  XEventMetadata.id      (1), .name (2), .display_name (4)

On TPU the device plane ("/device:TPU:0") carries an "XLA Ops" line whose
events are the executed (fused) XLA ops — non-overlapping within the line, so
summing durations per event name gives exact per-op device time.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over one message's bytes."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, i = _varint(buf, i)
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            val = buf[i : i + 4]
            i += 4
        elif wt == 1:  # 64-bit
            val = buf[i : i + 8]
            i += 8
        else:  # groups (3/4) — not used by XSpace
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


class XLine:
    __slots__ = ("name", "events")

    def __init__(self, name: str, events: List[Tuple[int, int]]):
        self.name = name
        self.events = events  # [(event_metadata_id, duration_ps)]


class XPlane:
    __slots__ = ("name", "lines", "event_names")

    def __init__(self, buf: bytes):
        self.name = ""
        self.lines: List[XLine] = []
        self.event_names: Dict[int, str] = {}
        for f, _, v in _fields(buf):
            if f == 2:
                self.name = v.decode("utf-8", "replace")
            elif f == 3:
                self.lines.append(self._line(v))
            elif f == 4:  # map<int64, XEventMetadata> entry
                mid, name = self._meta_entry(v)
                if mid is not None:
                    self.event_names[mid] = name

    @staticmethod
    def _line(buf: bytes) -> XLine:
        name = ""
        display = ""
        events: List[Tuple[int, int]] = []
        for f, _, v in _fields(buf):
            if f == 2:
                name = v.decode("utf-8", "replace")
            elif f == 11:
                display = v.decode("utf-8", "replace")
            elif f == 6:
                mid, dur = 0, 0
                for ef, _, ev in _fields(v):
                    if ef == 1:
                        mid = ev
                    elif ef == 3:
                        dur = ev
                events.append((mid, dur))
        return XLine(display or name, events)

    @staticmethod
    def _meta_entry(buf: bytes) -> Tuple[Optional[int], str]:
        mid: Optional[int] = None
        name = ""
        for f, _, v in _fields(buf):
            if f == 1:
                mid = v
            elif f == 2:  # XEventMetadata
                for mf, _, mv in _fields(v):
                    if mf == 1:
                        mid = mv if mid is None else mid
                    elif mf == 2 and not name:
                        name = mv.decode("utf-8", "replace")
                    elif mf == 4:  # display_name wins when present
                        name = mv.decode("utf-8", "replace")
        return mid, name


def read_planes(xplane_pb_path: str) -> List[XPlane]:
    with open(xplane_pb_path, "rb") as f:
        buf = f.read()
    return [XPlane(v) for f_, _, v in _fields(buf) if f_ == 1]


def latest_trace_file(trace_dir: str) -> Optional[str]:
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    return max(files, key=os.path.getmtime) if files else None


def op_totals(
    xplane_pb_path: str,
    line_filter: Tuple[str, ...] = ("XLA Ops", "XLA Modules"),
    include_host: bool = False,
) -> Dict[str, Dict[str, List]]:
    """Per-op (total_ps, count) per interesting line of each device plane.

    Returns {plane_name: {line_name: [(op_name, total_ps, count), ...]}} with
    each line's list sorted by total time descending.
    """
    out: Dict[str, Dict[str, List]] = {}
    for plane in read_planes(xplane_pb_path):
        device = plane.name.startswith("/device:") or "TPU" in plane.name
        if not device and not (include_host and plane.name.startswith("/host:")):
            continue
        per_line: Dict[str, List] = {}
        for line in plane.lines:
            if line_filter and line.name not in line_filter:
                continue
            agg: Dict[str, List[int]] = {}
            for mid, dur in line.events:
                name = plane.event_names.get(mid, f"op#{mid}")
                a = agg.setdefault(name, [0, 0])
                a[0] += dur
                a[1] += 1
            if agg:
                per_line[line.name] = sorted(
                    ((k, v[0], v[1]) for k, v in agg.items()),
                    key=lambda t: -t[1],
                )
        if per_line:
            out[plane.name] = per_line
    return out


def _fmt_time(ps: float) -> str:
    us = ps / 1e6
    if us >= 1e6:
        return f"{us / 1e6:.3f}s"
    if us >= 1e3:
        return f"{us / 1e3:.3f}ms"
    return f"{us:.1f}us"


def format_op_table(xplane_pb_path: str, row_limit: int = 20) -> str:
    """Reference-parity per-op digest: device-time table, top ``row_limit``
    ops by total self time (analog of torch.profiler's
    ``key_averages().table(sort_by="self_cpu_time_total", row_limit=20)``,
    reference model.py:268-269)."""
    totals = op_totals(xplane_pb_path, line_filter=("XLA Ops",))
    if not totals:
        # CPU traces have no device plane; aggregate the XLA runtime threads
        # of the host plane instead (approximate — threads overlap).
        host = op_totals(xplane_pb_path, line_filter=(), include_host=True)
        for plane_name, per_line in host.items():
            merged: Dict[str, List[int]] = {}
            for line_name, rows in per_line.items():
                if not line_name.startswith(("tf_XLA", "tf_xla")):
                    continue
                for name, tot, cnt in rows:
                    a = merged.setdefault(name, [0, 0])
                    a[0] += tot
                    a[1] += cnt
            if merged:
                totals[plane_name] = {
                    "xla host threads (approx)": sorted(
                        ((k, v[0], v[1]) for k, v in merged.items()),
                        key=lambda t: -t[1],
                    )
                }
    blocks: List[str] = []
    for plane_name, per_line in totals.items():
        for line_name, rows in per_line.items():
            grand = sum(t for _, t, _ in rows) or 1
            w = max([len(r[0][:60]) for r in rows[:row_limit]] + [8])
            hdr = f"{'op':<{w}}  {'total':>10}  {'avg':>10}  {'count':>7}  {'%':>6}"
            lines = [f"[{plane_name} / {line_name}]", hdr, "-" * len(hdr)]
            for name, tot, cnt in rows[:row_limit]:
                lines.append(
                    f"{name[:60]:<{w}}  {_fmt_time(tot):>10}  "
                    f"{_fmt_time(tot / cnt):>10}  {cnt:>7}  {100 * tot / grand:>5.1f}%"
                )
            lines.append(
                f"{'TOTAL':<{w}}  {_fmt_time(grand):>10}"
            )
            blocks.append("\n".join(lines))
    return "\n\n".join(blocks) if blocks else "(no device ops found in trace)"
