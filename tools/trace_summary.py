"""Summarize a jax.profiler xplane trace: top device ops by total time.

Usage: python tools/trace_summary.py /tmp/fwd_trace [--iters 20] [--top 40]

The image has no importable xplane_pb2 (tensorboard_plugin_profile ships
without generated protos and TF hides its copy), so this decodes the
protobuf wire format directly — only the fields we need:

  XSpace.planes=1 / XPlane{name=2, lines=3, event_metadata=4}
  XLine{name=2, events=4} / XEvent{metadata_id=1, duration_ps=3}
  XEventMetadata map entry {key=1, value=2} / XEventMetadata{id=1, name=2}
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a message's fields."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
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
        yield fno, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fno, _, v in fields(buf):
        if fno == 2:
            name = v.decode()
        elif fno == 3:
            lines.append(v)
        elif fno == 4:  # map<int64, XEventMetadata>
            mid, mname = None, ""
            for f2, _, v2 in fields(v):
                if f2 == 1:
                    mid = v2
                elif f2 == 2:
                    for f3, _, v3 in fields(v2):
                        if f3 == 1:
                            mid = v3
                        elif f3 == 2:
                            mname = v3.decode()
            if mid is not None:
                meta[mid] = mname
    return name, lines, meta


def summarize(trace_dir, iters, top):
    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    if not pbs:
        sys.exit(f"no .xplane.pb under {trace_dir}")
    data = open(max(pbs, key=os.path.getmtime), "rb").read()
    for fno, _, plane_buf in fields(data):
        if fno != 1:
            continue
        name, lines, meta = parse_plane(plane_buf)
        if "TPU" not in name and "/device:" not in name:
            continue
        tot = collections.Counter()
        cnt = collections.Counter()
        for line_buf in lines:
            lname, events = "", []
            for f2, _, v2 in fields(line_buf):
                if f2 == 2:
                    lname = v2.decode()
                elif f2 == 4:
                    events.append(v2)
            if lname not in ("XLA Ops", "XLA Modules", "Steps"):
                continue
            for ev in events:
                mid = dur = 0
                for f3, _, v3 in fields(ev):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 3:
                        dur = v3
                key = (lname, meta.get(mid, f"#{mid}"))
                tot[key] += dur
                cnt[key] += 1
        print(f"== plane: {name} ==")
        mod_ms = sum(v for (ln, _), v in tot.items()
                     if ln == "XLA Modules") / 1e9
        print(f"module total: {mod_ms / iters:.3f} ms/iter")
        print(f"{'ms/iter':>8s} {'count':>6s}  op")
        shown = top
        for (ln, nm), v in tot.most_common():
            if ln != "XLA Ops":
                continue
            if shown <= 0:
                break
            shown -= 1
            print(f"{v / 1e9 / iters:8.4f} {cnt[(ln, nm)]:6d}  {nm[:100]}")

        # unit-category rollup: which hardware the device time sits on.
        # Classification by HLO op kind: dot/conv = MXU systolic array;
        # fusion/sort/reduce/scatter = VPU vector ops; tpu custom-calls =
        # our Mosaic/Pallas kernels (VPU+VMEM by design, ops/slab.py);
        # copy/transpose/bitcast = data movement (DMA/relayout); while =
        # sequential loop shells (FPS) whose bodies are fused VPU work.
        cats = collections.Counter()
        for (ln, nm), v in tot.items():
            if ln != "XLA Ops":
                continue
            n = nm.lower()
            if "custom-call" in n or "custom_call" in n or "tpu_" in n:
                cat = "pallas/mosaic kernels (VPU+VMEM)"
            elif n.startswith(("dot", "convolution")) or ".dot" in n:
                cat = "MXU (dot/conv)"
            elif n.startswith(("copy", "transpose", "bitcast",
                               "reshape", "dynamic-update-slice",
                               "dynamic-slice", "concatenate", "slice")):
                cat = "data movement (copy/relayout)"
            elif n.startswith("sort"):
                cat = "VPU sort"
            elif n.startswith(("while", "conditional")):
                cat = "loop shells (FPS/scan bodies)"
            elif n.startswith(("all-reduce", "all-gather",
                               "reduce-scatter", "collective")):
                cat = "collectives (ICI)"
            else:
                cat = "VPU fusions/elementwise"
            cats[cat] += v
        dev_total = sum(cats.values())
        if dev_total:
            print("\nunit-category rollup (XLA Ops line):")
            for cat, v in cats.most_common():
                print(f"{v / 1e9 / iters:8.4f} ms/iter "
                      f"({100 * v / dev_total:5.1f}%)  {cat}")
            print(f"{dev_total / 1e9 / iters:8.4f} ms/iter (100.0%)  "
                  f"device-op total")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--top", type=int, default=40)
    a = p.parse_args()
    summarize(a.trace_dir, a.iters, a.top)
