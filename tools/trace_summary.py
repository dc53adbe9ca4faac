"""Summarize a jax.profiler trace (XPlane) without TensorBoard.

Usage:
    python scripts/inference_single.py ... --profile /tmp/prof
    python tools/trace_summary.py /tmp/prof [--top 25] [--iters N]

Reads the newest *.xplane.pb under the given directory, computes per-op SELF
time on the TPU "XLA Ops" line (nested events — while bodies, fusions inside
calls — are subtracted from their parents), and prints a category breakdown
plus the top individual ops. This replaces the reference's ad-hoc cuda timers
(mova/utils/misc.py:39-81) with real compiled-op attribution; the raw trace
also opens in Perfetto / TensorBoard-profile if available.

The XPlane protobuf is decoded with a ~60-line wire-format reader (schema:
tsl/profiler/protobuf/xplane.proto — stable public format), so this tool has
zero dependencies beyond the stdlib.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


# --- minimal protobuf wire decoding -----------------------------------------

def _varint(buf: memoryview, i: int):
    x = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << shift
        if not b & 0x80:
            return x, i
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a serialized message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:          # varint
            v, i = _varint(buf, i)
        elif wt == 1:        # 64-bit
            v, i = bytes(buf[i:i + 8]), i + 8
        elif wt == 2:        # length-delimited
            ln, i = _varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:        # 32-bit
            v, i = bytes(buf[i:i + 4]), i + 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, v


def _parse_event(buf):
    """XEvent: metadata_id=1, offset_ps=2, duration_ps=3."""
    mid = off = dur = 0
    for fnum, _, v in _fields(buf):
        if fnum == 1:
            mid = v
        elif fnum == 2:
            off = v
        elif fnum == 3:
            dur = v
    return mid, off, dur


def _parse_line(buf):
    """XLine: name=2, events=4, timestamp_ns=3."""
    name = ""
    events = []
    for fnum, _, v in _fields(buf):
        if fnum == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif fnum == 4:
            events.append(_parse_event(v))
    return name, events


def _parse_event_metadata(buf):
    """map<int64, XEventMetadata> entry: key=1, value=2{id=1, name=2}."""
    key = None
    name = ""
    for fnum, _, v in _fields(buf):
        if fnum == 1:
            key = v
        elif fnum == 2:
            for f2, _, v2 in _fields(v):
                if f2 == 2:
                    name = bytes(v2).decode("utf-8", "replace")
    return key, name


def _parse_plane(buf):
    """XPlane: name=2, lines=3, event_metadata=4."""
    name = ""
    lines = []
    evmeta = {}
    for fnum, _, v in _fields(buf):
        if fnum == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif fnum == 3:
            lines.append(_parse_line(v))
        elif fnum == 4:
            k, nm = _parse_event_metadata(v)
            if k is not None:
                evmeta[k] = nm
    return name, lines, evmeta


def parse_xspace(path: str):
    """Returns [(plane_name, [(line_name, [(meta_id, offset, dur)])], {id: name})]."""
    buf = memoryview(open(path, "rb").read())
    planes = []
    for fnum, _, v in _fields(buf):
        if fnum == 1:
            planes.append(_parse_plane(v))
    return planes


# --- self-time aggregation ---------------------------------------------------

def self_times(events, evmeta):
    """events: [(meta_id, offset_ps, dur_ps)] on ONE line. Subtract each
    event's direct children (trace events nest) to get self time per op."""
    evs = sorted(((off, off + dur, evmeta.get(mid, "?"))
                  for mid, off, dur in events),
                 key=lambda x: (x[0], -(x[1] - x[0])))
    stack: list = []
    child_sum: dict = {}
    for i, (s, e, _) in enumerate(evs):
        while stack and evs[stack[-1]][1] <= s:
            stack.pop()
        if stack:
            j = stack[-1]
            child_sum[j] = child_sum.get(j, 0) + (e - s)
        stack.append(i)
    agg = collections.Counter()
    cnt = collections.Counter()
    for i, (s, e, name) in enumerate(evs):
        agg[name] += (e - s) - child_sum.get(i, 0)
        cnt[name] += 1
    return agg, cnt


def category(op_name: str) -> str:
    m = re.match(r"%([a-zA-Z\-_.]+)", op_name)
    if not m:
        return op_name[:24]
    cat = m.group(1).rstrip(".0123456789")
    if cat == "closed_call":
        return "custom_call (Pallas kernels)"
    return cat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", help="dir passed to --profile / jax.profiler.trace")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--iters", type=int, default=1,
                    help="divide totals by N traced iterations")
    ap.add_argument("--line", type=str, default="XLA Ops",
                    help="trace line to aggregate (XLA Ops | XLA Modules)")
    args = ap.parse_args()

    pbs = sorted(glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
    if not pbs:
        sys.exit(f"no *.xplane.pb under {args.trace_dir}")
    path = pbs[-1]
    print(f"trace: {path}")

    for plane_name, lines, evmeta in parse_xspace(path):
        if "TPU" not in plane_name or not lines:
            continue
        for line_name, events in lines:
            if line_name != args.line or not events:
                continue
            agg, cnt = self_times(events, evmeta)
            total = sum(agg.values())
            print(f"\n== {plane_name} / {line_name}: "
                  f"{total / 1e9 / args.iters:.1f} ms per iter "
                  f"({len(events)} events)")
            bycat = collections.Counter()
            for name, d in agg.items():
                bycat[category(name)] += d
            print("-- by category --")
            for k, d in bycat.most_common(15):
                print(f"  {d / 1e9 / args.iters:9.2f} ms  {100 * d / total:5.1f}%  {k}")
            print(f"-- top {args.top} ops by self time --")
            for name, d in agg.most_common(args.top):
                print(f"  {d / 1e9 / args.iters:9.2f} ms x{cnt[name]:<5d} {name[:100]}")


if __name__ == "__main__":
    main()
