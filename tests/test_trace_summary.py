"""Trace summarizer: wire-format decoding and nested self-time attribution."""

import struct

from tools.trace_summary import category, parse_xspace, self_times


def _varint(x: int) -> bytes:
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _len_field(fnum: int, payload: bytes) -> bytes:
    return _varint((fnum << 3) | 2) + _varint(len(payload)) + payload


def _varint_field(fnum: int, v: int) -> bytes:
    return _varint(fnum << 3) + _varint(v)


def _event(mid, off, dur):
    return (_varint_field(1, mid) + _varint_field(2, off)
            + _varint_field(3, dur))


def test_wire_roundtrip(tmp_path):
    # XSpace{plane{name="/device:TPU:0", line{name="XLA Ops", events},
    #              event_metadata{1: "%op_a", 2: "%op_b"}}}
    line = _len_field(2, b"XLA Ops") + _len_field(4, _event(1, 0, 100)) \
        + _len_field(4, _event(2, 10, 30))
    meta1 = _len_field(2, _varint_field(1, 1) + _len_field(2, b"%op_a.1"))
    meta2 = _len_field(2, _varint_field(1, 2) + _len_field(2, b"%op_b.2"))
    plane = (_len_field(2, b"/device:TPU:0") + _len_field(3, line)
             + _len_field(4, _varint_field(1, 1) + meta1)
             + _len_field(4, _varint_field(1, 2) + meta2))
    space = _len_field(1, plane)
    p = tmp_path / "t.xplane.pb"
    p.write_bytes(space)

    planes = parse_xspace(str(p))
    assert len(planes) == 1
    name, lines, evmeta = planes[0]
    assert name == "/device:TPU:0"
    assert evmeta == {1: "%op_a.1", 2: "%op_b.2"}
    (lname, events), = lines
    assert lname == "XLA Ops"
    assert events == [(1, 0, 100), (2, 10, 30)]


def test_self_time_subtracts_children():
    # op_a [0, 100) contains op_b [10, 40) which contains op_c [12, 20);
    # op_d [100, 150) is a sibling of op_a.
    evmeta = {1: "%a", 2: "%b", 3: "%c", 4: "%d"}
    events = [(1, 0, 100), (2, 10, 30), (3, 12, 8), (4, 100, 50)]
    agg, cnt = self_times(events, evmeta)
    assert agg["%a"] == 100 - 30
    assert agg["%b"] == 30 - 8
    assert agg["%c"] == 8
    assert agg["%d"] == 50
    assert sum(agg.values()) == 150  # partitions total wall


def test_category():
    assert category("%closed_call.47 = bf16[...]") == "custom_call (Pallas kernels)"
    assert category("%multiply_reduce_fusion.12 = ...") == "multiply_reduce_fusion"
    assert category("%copy-start.9 = ...") == "copy-start"
