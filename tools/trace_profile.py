#!/usr/bin/env python
"""Per-op TPU profile of the bench pipeline via jax.profiler + xprof.

Captures a trace of a few steady-state bench iterations and prints the
top-N HLO ops by self time (device), so optimization targets are measured
rather than guessed. Uses tensorboard_plugin_profile's converter on the
captured .xplane.pb — no TensorBoard server needed.

    python tools/trace_profile.py [--top 40] [--batch 8]

Env knobs honored from bench.py (BENCH_STEPS, BENCH_NO_DECODE, ...).
"""

from __future__ import annotations

import argparse
import csv
import glob
import io
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--logdir", default="tmp/trace")
    args = ap.parse_args()

    import jax

    from bench import build_pipeline

    fn, imgs = build_pipeline(args.batch)
    rng = np.random.RandomState(0)
    import jax.numpy as jnp

    data = jnp.asarray(rng.rand(*imgs.shape), jnp.float32)
    # warmup / compile
    jax.block_until_ready(fn(data))
    jax.block_until_ready(fn(data))

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for _ in range(args.iters):
            out = fn(data)
        jax.block_until_ready(out)

    pbs = sorted(glob.glob(f"{args.logdir}/**/*.xplane.pb", recursive=True),
                 key=os.path.getmtime)
    if not pbs:
        print("no xplane.pb captured", file=sys.stderr)
        return 1
    pb = pbs[-1]
    with open(pb, "rb") as f:
        raw = f.read()

    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:  # older env
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    params = {"tqx": "out:csv;"}
    data_csv, _ = rtd.xspace_to_tool_data([pb], "framework_op_stats^", params)
    if isinstance(data_csv, bytes):
        data_csv = data_csv.decode()
    rows = list(csv.DictReader(io.StringIO(data_csv)))
    if not rows:
        print("empty op stats", file=sys.stderr)
        return 1

    def f(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return 0.0

    # column names vary across plugin versions; probe
    cols = rows[0].keys()
    time_col = next(
        (c for c in cols if "total_self_time" in c.lower() or
         c.lower() in ("total self time (us)", "self time (us)", "self_time")),
        None,
    )
    occ_col = next((c for c in cols if "occurrence" in c.lower()), None)
    name_col = next((c for c in cols if c.lower() in ("operation", "op name", "op_name", "name")), None)
    if time_col is None or name_col is None:
        print(f"unrecognized columns: {list(cols)}", file=sys.stderr)
        print(json.dumps(rows[:3], indent=1))
        return 1
    rows.sort(key=lambda r: -f(r[time_col]))
    total = sum(f(r[time_col]) for r in rows)
    print(f"total self time: {total/1e3:.2f} ms over {args.iters} iters "
          f"({total/1e3/args.iters:.2f} ms/iter)")
    print(f"{'self_us':>12} {'%':>5} {'n':>5}  op")
    for r in rows[: args.top]:
        t = f(r[time_col])
        n = int(f(r[occ_col])) if occ_col else -1
        print(f"{t:12.0f} {100*t/max(total,1e-9):5.1f} {n:5d}  {r[name_col][:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
