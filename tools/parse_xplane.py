"""Parse a jax.profiler xplane trace into a per-op time table.

The tensorboard trace converter is broken in this image; this parses the
raw ``*.xplane.pb`` protobufs directly (recipe from round 1, see
``.claude/skills/verify/SKILL.md``).

Usage:
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/parse_xplane.py /tmp/jtrace [--top 40] [--plane tpu]

Aggregates event durations per line (op) within each plane, prints the
top-N by total time.  ``display_name`` (or the line name) holds the HLO op
text.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict


def load_xspaces(logdir: str):
    # NOTE: do NOT force PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python —
    # the default (upb/C++) parses a 300 MB trace in seconds; pure-python
    # takes >10 min on this 1-core box.
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    spaces = []
    for p in sorted(paths)[-1:]:  # latest capture only
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def summarise(logdir: str, top: int = 40, plane_filter: str = ""):
    spaces = load_xspaces(logdir)
    for path, xs in spaces:
        print(f"== {path}")
        for plane in xs.planes:
            if plane_filter and plane_filter.lower() not in plane.name.lower():
                continue
            ev_meta = plane.event_metadata
            totals = defaultdict(float)  # name -> total ps
            counts = defaultdict(int)
            plane_total = 0.0
            for line in plane.lines:
                for ev in line.events:
                    md = ev_meta.get(ev.metadata_id)
                    name = (md.display_name or md.name) if md else str(ev.metadata_id)
                    totals[name] += ev.duration_ps
                    counts[name] += 1
                    plane_total += ev.duration_ps
            if not totals:
                continue
            print(f"-- plane: {plane.name}  (sum of events {plane_total/1e12:.4f} s)")
            for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
                print(
                    f"  {ps/1e12*1e3:10.3f} ms  x{counts[name]:<6d} {name[:140]}"
                )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--plane", default="")
    a = ap.parse_args()
    summarise(a.logdir, a.top, a.plane)
