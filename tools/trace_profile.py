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

# must be set before jax import to share bench.py's persistent compilation
# cache (bench sets it too, but only when imported before jax)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

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

    data, _ = rtd.xspace_to_tool_data([pb], "framework_op_stats", {})
    tab = json.loads(data)
    tab = tab[0] if isinstance(tab, list) else tab
    cols = [c["id"] for c in tab["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in r["c"]])) for r in tab["rows"]]
    dev = [
        r for r in rows
        if str(r.get("host_or_device", "")).lower().startswith("d")
    ]
    if not dev:
        print("no device rows", file=sys.stderr)
        return 1
    dev.sort(key=lambda r: -(r.get("total_self_time") or 0))
    total = sum(r.get("total_self_time") or 0 for r in dev)
    print(f"total device self time: {total/1e3:.2f} ms over {args.iters} "
          f"iters ({total/1e3/args.iters:.2f} ms/iter)")
    print(f"{'self_us':>12} {'%':>5} {'n':>6}  type / op")
    for r in dev[: args.top]:
        t = r.get("total_self_time") or 0
        n = int(r.get("occurrences") or 0)
        print(
            f"{t:12.0f} {100*t/max(total,1e-9):5.1f} {n:6d}  "
            f"{str(r.get('type'))[:22]:22s} {str(r.get('operation'))[:95]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
