"""Trace the headline train step and print an op-level time breakdown.

The reference has no profiler at all (SURVEY.md §5.1 — manual
cuda.synchronize timing only, /root/reference/eval_throughput.py:109-119).
This tool is the TPU-native equivalent of "where does the step go":
it runs bench.py's step under ``jax.profiler.trace`` and parses the
resulting xplane protobuf directly (no TensorBoard round-trip), printing
self-time per XLA op/fusion on the device plane.

Usage:
    python tools/profile_step.py                     # default bench config
    python tools/profile_step.py --batch 64 --remat none
    python tools/profile_step.py --top 40 --group    # group by op kind
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(logdir: str, plane_filter: str = "TPU"):
    """Yield (line_name, event_name, total_self_ps, occurrences) from
    the device plane of the newest xplane.pb under logdir.

    Events on an XLA Ops line NEST (a while's event spans its whole
    body; the accumulation loop nests three deep in this codebase), so
    raw durations double-count massively — a naive sum reported ~4x
    the measured step time. Self time = duration minus the time covered
    by immediate children, computed with a containment sweep."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if plane_filter not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            agg = collections.Counter()
            occ = collections.Counter()
            evs = sorted(
                ((ev.offset_ps, ev.duration_ps,
                  ev_meta[ev.metadata_id].name) for ev in line.events),
                key=lambda t: (t[0], -t[1]))
            stack = []  # [start, end, name, covered_by_children_ps]

            def commit(frame):
                s, e, name, covered = frame
                agg[name] += max(e - s - covered, 0)
                occ[name] += 1
                if stack:
                    stack[-1][3] += e - s

            for start, dur, name in evs:
                end = start + dur
                while stack and stack[-1][1] <= start:
                    commit(stack.pop())
                stack.append([start, end, name, 0])
            while stack:
                commit(stack.pop())
            for name, ps in agg.items():
                yield plane.name, line.name, name, ps, occ[name]


GROUPS = (
    ("fusion", "fusion"),
    ("dot", "matmul/conv"),
    ("conv", "matmul/conv"),
    ("dynamic-update-slice", "dyn-update-slice"),
    ("dynamic_update_slice", "dyn-update-slice"),
    ("copy", "copy"),
    ("custom-call", "custom-call (pallas/...)"),
    ("all-gather", "collective"),
    ("all-reduce", "collective"),
    ("reduce", "reduce"),
    ("transpose", "transpose"),
    ("rng", "rng"),
)


def group_of(name: str) -> str:
    low = name.lower()
    for key, g in GROUPS:
        if key in low:
            return g
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--accum", type=int, default=16)
    ap.add_argument("--seq", type=int, default=136)
    # 136 = the recipe workload shape (bench.py --workload recipe)
    ap.add_argument("--queue_size", type=int, default=131072)
    ap.add_argument("--remat", default="none")
    ap.add_argument("--attention", default="flash_block")
    ap.add_argument("--gelu", default="gelu_tanh")
    ap.add_argument("--ffn", default="fused")
    ap.add_argument("--layer_loop", default="python",
                    choices=("scan", "python"))
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--dropout", type=float, default=0.1,
                    help="encoder dropout rate; 0 gives the dropout-off "
                         "kernel A/B for the VPU-cost measurement")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--keep", action="store_true",
                    help="keep the trace dir for TensorBoard")
    args = ap.parse_args()

    import jax
    import bench

    logdir = args.logdir or tempfile.mkdtemp(prefix="czt_profile_")
    step_fn, st, b, cfg = bench.build(
        args.batch, args.accum, args.seq, args.queue_size, args.remat,
        args.attention, args.gelu, ffn_impl=args.ffn,
        scan_layers=args.layer_loop == "scan", dropout=args.dropout)
    rng = jax.random.key(1, impl=cfg.prng_impl)
    for _ in range(3):  # compile + warmup
        st, stats = step_fn(st, b, rng)
    float(stats["loss"])

    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            st, stats = step_fn(st, b, rng)
        float(stats["loss"])  # sync (see bench.py note on the axon tunnel)

    rows = [r for r in parse_xplane(logdir) if "XLA Op" in r[1]]
    if not rows:  # fall back to all device lines
        rows = list(parse_xplane(logdir))
    total_ms = sum(r[3] for r in rows) / 1e9
    print(f"device plane total: {total_ms:.1f} ms over {args.steps} steps "
          f"({total_ms / args.steps:.1f} ms/step)\n")

    by_group = collections.Counter()
    for _, _, name, ps, _ in rows:
        by_group[group_of(name)] += ps
    print("by kind:")
    for g, ps in by_group.most_common():
        print(f"  {ps / 1e9 / args.steps:9.2f} ms/step  "
              f"{100 * ps / (total_ms * 1e9):5.1f}%  {g}")

    print(f"\ntop {args.top} ops (self time):")
    rows.sort(key=lambda r: -r[3])
    for _, _, name, ps, n in rows[:args.top]:
        print(f"  {ps / 1e9 / args.steps:9.3f} ms/step  x{n:<5d} "
              f"{name[:110]}")

    if args.keep:
        print(f"\ntrace kept at {logdir}")
    else:
        import shutil
        shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
