"""Minimal XSpace/xplane.pb reader + containment-aware op-time aggregation.

The tensorboard_plugin_profile converter is broken in this environment
(protobuf descriptor/_pywrap mismatches), so this decodes the raw protobuf
wire format directly — XSpace's field layout is stable (tsl/profiler/
protobuf/xplane.proto):

  XSpace.planes = 1 (XPlane)
  XPlane: name = 2, lines = 3 (XLine), event_metadata = 4 (map<int64,
          XEventMetadata>)
  XLine:  name = 2, events = 4 (XEvent)
  XEvent: metadata_id = 1, offset_ps = 2, duration_ps = 3
  XEventMetadata (map value, field 2 of the entry): id = 1, name = 2

Two hard-won parsing rules (round-2 profile work, CLAUDE.md):
  * the device plane's op line must be name == "XLA Ops" EXACTLY — an
    "Async XLA Ops" line also matches substring checks and double-counts DMAs;
  * events on that line are NESTED (a fusion contains the ops it fused);
    summing raw durations inflates totals ~2x. Self time = duration minus
    the time of contained child events, computed with a containment stack
    over offset-sorted events.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Tuple


# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------
def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:                      # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:                    # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:                    # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:                    # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _submessages(buf: bytes, field_no: int) -> List[bytes]:
    return [v for f, w, v in fields(buf) if f == field_no and w == 2]


def _first_str(buf: bytes, field_no: int) -> str:
    for f, w, v in fields(buf):
        if f == field_no and w == 2:
            return v.decode("utf-8", "replace")
    return ""


def _first_varint(buf: bytes, field_no: int, default: int = 0) -> int:
    for f, w, v in fields(buf):
        if f == field_no and w == 0:
            return v
    return default


# ---------------------------------------------------------------------------
# XSpace navigation
# ---------------------------------------------------------------------------
def planes(xspace_path: str) -> List[Tuple[str, bytes]]:
    with open(xspace_path, "rb") as f:
        buf = f.read()
    return [(_first_str(p, 2), p) for p in _submessages(buf, 1)]


def device_plane(xspace_path: str) -> bytes:
    for name, plane in planes(xspace_path):
        if "TPU" in name and "device" in name.lower():
            return plane
    raise ValueError(f"no TPU device plane in {xspace_path}: "
                     f"{[n for n, _ in planes(xspace_path)]}")


def event_names(plane: bytes) -> Dict[int, str]:
    names = {}
    for entry in _submessages(plane, 4):      # map<int64, XEventMetadata>
        key = _first_varint(entry, 1)
        for f, w, v in fields(entry):
            if f == 2 and w == 2:             # value: XEventMetadata
                names[key] = _first_str(v, 2) or _first_str(v, 4)
    return names


def xla_ops_events(plane: bytes) -> List[Tuple[int, int, int]]:
    """(offset_ps, duration_ps, metadata_id) of the EXACT 'XLA Ops' line."""
    for line in _submessages(plane, 3):
        if _first_str(line, 2) != "XLA Ops":  # exact — not 'Async XLA Ops'
            continue
        events = []
        for ev in _submessages(line, 4):
            mid = _first_varint(ev, 1)
            off = _first_varint(ev, 2)
            dur = _first_varint(ev, 3)
            events.append((off, dur, mid))
        return events
    raise ValueError("no 'XLA Ops' line in device plane")


# ---------------------------------------------------------------------------
# containment-aware self time
# ---------------------------------------------------------------------------
def self_times(events: List[Tuple[int, int, int]],
               names: Dict[int, str]) -> List[Tuple[str, int, int]]:
    """[(op_name, self_time_ps, total_time_ps)] per event occurrence.

    Events sorted by (offset, -duration); a stack tracks enclosing events and
    each child's duration is subtracted from its parent's self time.
    """
    order = sorted(events, key=lambda e: (e[0], -e[1]))
    out: List[Tuple[str, int, int]] = []
    stack: List[List] = []   # [offset, end, metadata_id, child_time]
    def pop(entry):
        name = names.get(entry[2], f"op{entry[2]}")
        out.append((name, entry[1] - entry[0] - entry[3],
                    entry[1] - entry[0]))
    for off, dur, mid in order:
        end = off + dur
        while stack and off >= stack[-1][1]:
            pop(stack.pop())
        if stack:
            stack[-1][3] += dur
        stack.append([off, end, mid, 0])
    while stack:
        pop(stack.pop())
    return out


def aggregate(xspace_path: str, classify) -> Dict[str, Dict[str, float]]:
    """Bucket self-times by ``classify(op_name) -> bucket`` over all traced
    steps. Returns {bucket: {"ms": total_self_ms, "events": count}}."""
    plane = device_plane(xspace_path)
    names = event_names(plane)
    rows = self_times(xla_ops_events(plane), names)
    buckets: Dict[str, Dict[str, float]] = {}
    for name, self_ps, _ in rows:
        b = classify(name)
        slot = buckets.setdefault(b, {"ms": 0.0, "events": 0})
        slot["ms"] += self_ps / 1e9
        slot["events"] += 1
    return buckets


def find_xspace(trace_dir: str) -> str:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    return max(paths, key=os.path.getmtime)
