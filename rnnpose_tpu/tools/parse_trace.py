"""Aggregate device-op self-times from a jax.profiler xplane trace.

Companion to `tools/profile_components.py --trace DIR`: parses the
`.xplane.pb` the TPU runtime writes and prints per-op and per-family
self-time totals for the `/device:TPU:0` plane.

Hard-won parsing rules (round 4):
  * Aggregate the **"XLA Ops" line only**. The "XLA Modules" line carries
    module-level events that span every op inside them — including both
    lines double-counts everything (~4x inflation observed).
  * `%copy-start` durations measure the full **async** DMA window, which
    overlaps compute — they are NOT additive with op self-times and are
    excluded from the total by default (shown separately).
  * The proto lives at `tensorflow.tsl.profiler.protobuf.xplane_pb2` in
    this image (not `tensorflow.core.profiler...`).

Usage:
  python -m rnnpose_tpu.tools.parse_trace /tmp/trace_dir [--top 25]
"""
from __future__ import annotations

import argparse
import collections
import glob


def aggregate(trace_dir: str):
    """Return (per_op: Counter[name -> ms], async_copy_ms, plane_names)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    per_op: collections.Counter = collections.Counter()
    async_copy_ms = 0.0
    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                ms = ev.duration_ps / 1e9
                if name.startswith("%copy-start"):
                    async_copy_ms += ms
                else:
                    per_op[name] += ms
    return per_op, async_copy_ms, [p.name for p in xs.planes]


def family(name: str) -> str:
    """Coarse grouping key: fusion kind / custom-call name, shapes stripped."""
    head = name.split(" = ")[0]
    return head.split(".")[0]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--ops", action="store_true",
                   help="print individual ops instead of families")
    args = p.parse_args(argv)

    per_op, async_copy_ms, planes = aggregate(args.trace_dir)
    total = sum(per_op.values())
    print(f"planes: {planes}")
    print(f"device op self-time total: {total:.2f} ms "
          f"(+{async_copy_ms:.2f} ms async copy-start windows, overlapped)")
    agg = per_op if args.ops else _by_family(per_op)
    for name, t in agg.most_common(args.top):
        print(f"{t:8.3f} ms  {100 * t / max(total, 1e-9):5.1f}%  {name[:140]}")


def _by_family(per_op):
    import collections as _c

    fam = _c.Counter()
    for name, t in per_op.items():
        fam[family(name)] += t
    return fam


if __name__ == "__main__":
    main()
