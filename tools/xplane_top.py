"""Aggregate a jax.profiler xplane trace: top ops by device self-time.

Usage: python tools/xplane_top.py LOGDIR [-k 30] [--group]

Finds the newest ``*.xplane.pb`` under LOGDIR, sums event durations per
event name on the TPU/device planes, and prints the top-k with occurrence
counts and (when the trace carries them) flops / bytes_accessed stats.
``--group`` collapses XLA fusion names to their leading op kind (fusion,
convolution, dynamic-update-slice, ...) for a coarse picture.

Works with the tensorflow-bundled xplane proto (no xprof install needed).
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def load_xspace(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs, paths[-1]


def device_planes(xs):
    for plane in xs.planes:
        n = plane.name.lower()
        if "tpu" in n or "device" in n or "/device:" in n:
            if "host" not in n:
                yield plane


def aggregate(xs, group: bool = False):
    agg = collections.defaultdict(lambda: [0.0, 0, 0.0, 0.0])
    for plane in device_planes(xs):
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        stmeta = {m.id: m.name for m in plane.stat_metadata.values()}
        for line in plane.lines:
            lname = line.name.lower()
            # Only the serialized core-execution line: 'XLA Modules' is the
            # whole-program row (double counts everything) and 'Async XLA
            # Ops' are DMA-queue copies that overlap compute — summing
            # either inflates totals ~3x (r03 decode trace: 909 ms Ops,
            # 909 ms Modules, 1409 ms Async for a 3x303 ms capture).
            if lname != "xla ops":
                continue
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, str(ev.metadata_id))
                if group:
                    name = re.split(r"[.\d]", name, 1)[0]
                dur_us = ev.duration_ps / 1e6
                rec = agg[name]
                rec[0] += dur_us
                rec[1] += 1
                for st in ev.stats:
                    sname = stmeta.get(st.metadata_id, "")
                    if sname in ("flops", "model_flops"):
                        rec[2] += float(st.uint64_value or st.int64_value)
                    elif sname == "bytes_accessed":
                        rec[3] += float(st.uint64_value or st.int64_value)
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("-k", type=int, default=30)
    ap.add_argument("--group", action="store_true")
    args = ap.parse_args()

    xs, path = load_xspace(args.logdir)
    agg = aggregate(xs, group=args.group)
    total = sum(v[0] for v in agg.values())
    print(f"# {path}")
    print(f"# total device op time: {total / 1e3:.3f} ms "
          f"({len(agg)} distinct names)")
    print(f"{'us':>12} {'%':>6} {'n':>6}  {'GFLOP':>9} {'GB':>8}  name")
    for name, (us, n, fl, by) in sorted(
            agg.items(), key=lambda kv: -kv[1][0])[: args.k]:
        print(f"{us:12.1f} {100 * us / max(total, 1e-9):6.2f} {n:6d}  "
              f"{fl / 1e9:9.2f} {by / 2**30:8.3f}  {name[:110]}")


if __name__ == "__main__":
    main()
