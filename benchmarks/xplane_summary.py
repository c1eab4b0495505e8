"""Minimal XPlane (jax.profiler xplane.pb) parser + per-op aggregator.

No tensorboard_plugin_profile in this image, so this hand-parses the
protobuf wire format for the fields we need (XSpace.planes -> XPlane
{name, lines, event_metadata} -> XLine {name, events} -> XEvent
{metadata_id, duration_ps}) and prints the device plane's op-time
ranking — the decomposition tool for chip step profiles.

Usage: python benchmarks/xplane_summary.py <trace_dir_or_xplane.pb> [top_n]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def _varint(b, i):
    x = s = 0
    while True:
        c = b[i]
        i += 1
        x |= (c & 0x7F) << s
        if not c & 0x80:
            return x, i
        s += 7


def _fields(b):
    """Yield (field_number, wire_type, value) over one message's bytes."""
    i, n = 0, len(b)
    while i < n:
        key, i = _varint(b, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(b, i)
        elif wt == 2:
            ln, i = _varint(b, i)
            v = b[i:i + ln]
            i += ln
        elif wt == 5:
            v, i = int.from_bytes(b[i:i + 4], "little"), i + 4
        elif wt == 1:
            v, i = int.from_bytes(b[i:i + 8], "little"), i + 8
        else:  # pragma: no cover
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_planes(space_bytes):
    """XSpace -> [{name, lines: [{name, events}], meta: {id: name}}]."""
    planes = []
    for fn, _, v in _fields(space_bytes):
        if fn != 1:
            continue
        plane = {"name": "", "lines": [], "meta": {}}
        for pf, _, pv in _fields(v):
            if pf == 2:
                plane["name"] = pv.decode()
            elif pf == 3:  # XLine
                line = {"name": "", "events": []}
                for lf, _, lv in _fields(pv):
                    if lf == 2:
                        line["name"] = lv.decode()
                    elif lf == 4:  # XEvent
                        mid = dur = 0
                        for ef, _, ev_ in _fields(lv):
                            if ef == 1:
                                mid = ev_
                            elif ef == 3:
                                dur = ev_
                        line["events"].append((mid, dur))
                plane["lines"].append(line)
            elif pf == 4:  # map<int64, XEventMetadata>
                k = name = None
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2:  # XEventMetadata
                        for ef, _, ev_ in _fields(mv):
                            if ef == 2:
                                name = ev_.decode()
                if k is not None:
                    plane["meta"][k] = name or str(k)
        planes.append(plane)
    return planes


def summarize(path, top_n=30, line_filter="XLA Ops"):
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                                 recursive=True))
        path = cands[-1]
    planes = parse_planes(open(path, "rb").read())
    out = []
    for plane in planes:
        if "TPU" not in plane["name"] and "device" not in plane["name"].lower():
            continue
        for line in plane["lines"]:
            if line_filter and line_filter not in line["name"]:
                continue
            agg = defaultdict(lambda: [0, 0])
            for mid, dur in line["events"]:
                a = agg[plane["meta"].get(mid, str(mid))]
                a[0] += dur
                a[1] += 1
            total = sum(a[0] for a in agg.values())
            out.append((plane["name"], line["name"], total, agg))
    for pname, lname, total, agg in out:
        print(f"\n== {pname} / {lname}: total {total / 1e9:.3f} ms")
        for name, (dur, cnt) in sorted(agg.items(), key=lambda x: -x[1][0])[
                :top_n]:
            print(f"  {dur / 1e9:8.3f} ms  x{cnt:<5d} {name[:100]}")
    return out


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
