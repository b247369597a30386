"""Minimal pure-stdlib parser for jax.profiler XSpace (.xplane.pb) dumps.

The perfetto trace.json export of a remote-TPU (axon) capture collapses the
device timeline into one opaque "Steps" block, but the .xplane.pb retains the
full per-op planes.  No tensorflow/tensorboard wheel exists in this image, so
this decodes the protobuf wire format directly against the (stable) xplane
schema (tsl/profiler/protobuf/xplane.proto):

  XSpace{planes=1} XPlane{id=1,name=2,lines=3,event_metadata=4(map),
  stat_metadata=5} XLine{id=1,name=2,timestamp_ns=3,events=4}
  XEvent{metadata_id=1,offset_ps=2,duration_ps=3,stats=4}
  XEventMetadata{id=1,name=2,metadata=3,display_name=4}
  XStat{metadata_id=1,double=2,uint64=3,int64=4,str=5,bytes=6,ref=7}
"""

from __future__ import annotations

from collections import defaultdict


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def _parse_event(buf):
    mid = off = dur = 0
    for fn, wt, v in _fields(buf):
        if fn == 1:
            mid = v
        elif fn == 2:
            off = v
        elif fn == 3:
            dur = v
    return mid, off, dur


def _parse_line(buf):
    name = ""
    events = []
    for fn, wt, v in _fields(buf):
        if fn == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 4:
            events.append(_parse_event(v))
    return name, events


def _parse_event_metadata(buf):
    mid = 0
    name = ""
    for fn, wt, v in _fields(buf):
        if fn == 1:
            mid = v
        elif fn == 2:
            name = v.decode("utf-8", "replace")
    return mid, name


def _parse_map_entry(buf):
    k = 0
    val = b""
    for fn, wt, v in _fields(buf):
        if fn == 1:
            k = v
        elif fn == 2:
            val = v
    return k, val


def _parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fn, wt, v in _fields(buf):
        if fn == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 3:
            lines.append(_parse_line(v))
        elif fn == 4:
            k, val = _parse_map_entry(v)
            mid, mname = _parse_event_metadata(val)
            meta[k or mid] = mname
    return {"name": name, "lines": lines, "event_metadata": meta}


def parse_xspace(path):
    buf = open(path, "rb").read()
    planes = []
    for fn, wt, v in _fields(buf):
        if fn == 1:
            planes.append(_parse_plane(v))
    return planes


def op_table(planes, plane_filter=lambda n: "TPU" in n or "device" in n):
    """Aggregate event durations by (plane, line, op name).

    Returns {plane_name: {line_name: [(op, total_ps, count), ...]}}."""
    out = {}
    for p in planes:
        if not plane_filter(p["name"]):
            continue
        meta = p["event_metadata"]
        lines = {}
        for lname, events in p["lines"]:
            acc = defaultdict(lambda: [0, 0])
            for mid, off, dur in events:
                name = meta.get(mid, str(mid))
                acc[name][0] += dur
                acc[name][1] += 1
            rows = sorted(((k, v[0], v[1]) for k, v in acc.items()),
                          key=lambda r: -r[1])
            lines[lname] = rows
        out[p["name"]] = lines
    return out


if __name__ == "__main__":
    import sys
    planes = parse_xspace(sys.argv[1])
    for p in planes:
        n_ev = sum(len(e) for _, e in p["lines"])
        print(f"plane {p['name']!r}: {len(p['lines'])} lines, {n_ev} events, "
              f"{len(p['event_metadata'])} metadata")
        for lname, events in p["lines"][:8]:
            print(f"  line {lname!r}: {len(events)} events")


def self_time_table(planes, line_name="XLA Ops",
                    plane_filter=lambda n: "TPU" in n):
    """Per-op SELF time (duration minus nested children) on a single
    timeline lane: events nest by [offset, offset+dur) containment, so a
    stack pass over offset-sorted events attributes each interval once.
    Returns {plane: [(op, self_ps, total_ps, count), ...]} sorted by self."""
    from collections import defaultdict
    out = {}
    for p in planes:
        if not plane_filter(p["name"]):
            continue
        meta = p["event_metadata"]
        for lname, events in p["lines"]:
            if lname != line_name:
                continue
            evs = sorted(events, key=lambda e: (e[1], -e[2]))
            acc = defaultdict(lambda: [0, 0, 0])
            stack = []  # (end_ps, child_sum_holder)
            for mid, off, dur in evs:
                end = off + dur
                while stack and stack[-1][0] <= off:
                    stack.pop()
                if stack:
                    stack[-1][1][0] += dur   # add to parent's child sum
                holder = [0]
                stack.append((end, holder))
                name = meta.get(mid, str(mid))
                acc[name][1] += dur
                acc[name][2] += 1
                acc[name][0] += dur - 0  # placeholder; fixed below
                # store holder ref to subtract after pass: emulate by
                # deferred correction list
                acc[name].append(holder)
            rows = []
            for name, rec in acc.items():
                self_ps = rec[1] - sum(h[0] for h in rec[3:])
                rows.append((name, self_ps, rec[1], rec[2]))
            rows.sort(key=lambda r: -r[1])
            out[p["name"]] = rows
    return out
