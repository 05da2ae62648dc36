"""End-to-end throughput benchmark on the flagship eval pipeline.

Measures images/sec for HigherHRNet-w48 @ 640 single-scale inference:
backbone -> NMS/top-K detection -> kNN graph -> 10-step MPN -> on-device
grouping (threshold CC) + refine + quarter-adjust — the full decode, one jit.

The PyTorch reference publishes no throughput (BASELINE.md); its eval loop is
batch=1 python with host round-trips for clustering/refine
(reference: src/valid.py:94-135). ``vs_baseline`` is measured against a
documented estimate of 6.0 img/s for that pipeline on the reference's single
16GB GPU (HRNet-w48 640 + MPN + CPU grouping); the driver's BASELINE.json
target is >=10x that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: the full pipeline takes minutes to
# compile cold; cached recompiles are seconds (must be set pre-jax-import)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

# Reference throughput estimate — derivation in BASELINE.md "Throughput
# baseline derivation" (the reference publishes no speed numbers; this is an
# estimate for its single-GPU per-image eval loop at w48/640 single-scale).
# MFU is reported alongside as the auditable absolute number.
REFERENCE_IMAGES_PER_SEC = 6.0

# bf16 peak TFLOP/s per chip by TPU generation (public spec sheets)
_TPU_PEAK_TFLOPS = {
    "v4": 275.0,
    "v5 lite": 197.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6 lite": 918.0,
    "v6e": 918.0,
}


def _peak_tflops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, val in _TPU_PEAK_TFLOPS.items():
        if key in kind:
            return val
    return None


def build_pipeline(batch_size: int, input_size: int = 640, dtype_name: str = "bfloat16"):
    import jax
    import jax.numpy as jnp

    from pemp_tpu.config import get_config, update_config
    from pemp_tpu.decode.assembly import decode_poses
    from pemp_tpu.models import build_pose_model

    cfg = get_config()
    cfg = update_config(cfg, "configs/hrnet/w48_640.yaml")
    cfg.defrost()
    cfg.DATASET.INPUT_SIZE = input_size
    cfg.DATASET.OUTPUT_SIZE = [input_size // 4, input_size // 2]
    cfg.TPU.COLLECT_AUX = False  # eval-only: skip aux-step stacks/heads
    if os.environ.get("BENCH_CAP_IN"):
        cfg.TPU.KNN_CAP_IN = int(os.environ["BENCH_CAP_IN"])
    if os.environ.get("BENCH_STEPS"):
        cfg.MODEL.MPN.STEPS = int(os.environ["BENCH_STEPS"])
    if os.environ.get("BENCH_K"):
        cfg.TPU.NODES_PER_TYPE = int(os.environ["BENCH_K"])
    if os.environ.get("BENCH_MSG_PASS"):
        cfg.TPU.MSG_PASS = os.environ["BENCH_MSG_PASS"]
    if os.environ.get("BENCH_COMPILE_BUDGET"):
        cfg.TPU.COMPILE_BUDGET = os.environ["BENCH_COMPILE_BUDGET"]
    cfg.freeze()

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = build_pose_model(cfg, dtype=dtype)
    if os.environ.get("BENCH_UNROLL"):
        # flax dataclass attrs are frozen; mpn_cfg is a plain dict we can
        # tune in place before init/jit
        model.mpn_cfg["_SCAN_UNROLL"] = int(os.environ["BENCH_UNROLL"])
    imgs = jnp.zeros((batch_size, input_size, input_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    num_joints = cfg.DATASET.NUM_JOINTS
    node_threshold = cfg.MODEL.MPN.NODE_THRESHOLD
    n_per_img = num_joints * cfg.TPU.NODES_PER_TYPE

    def forward(images):
        scoremaps, output = model.apply(variables, images, train=False)
        g = output["graph"]
        edge_pred = jax.nn.sigmoid(output["preds"]["edge"][-1])
        node_pred = jax.nn.sigmoid(output["preds"]["node"][-1])
        class_prob = jax.nn.softmax(output["preds"]["class"][-1], axis=-1)

        b = images.shape[0]
        e_per = g["edge_index"].shape[1] // b
        # decode consumes the model's native NHWC maps directly
        # (channels_last) — no (B, J, H, W) transpose copies
        sm = scoremaps
        tg = output["graph"]["tags"]

        def decode_one(i):
            sl_n = jax.lax.dynamic_slice_in_dim
            nodes = sl_n(g["nodes"], i * n_per_img, n_per_img, 0)
            nscore = sl_n(node_pred, i * n_per_img, n_per_img, 0)
            nvalid = sl_n(g["node_valid"], i * n_per_img, n_per_img, 0)
            ei = sl_n(g["edge_index"], i * e_per, e_per, 1) - i * n_per_img
            ev = sl_n(g["edge_valid"], i * e_per, e_per, 0)
            ep = sl_n(edge_pred, i * e_per, e_per, 0)
            cp = sl_n(class_prob, i * n_per_img, n_per_img, 0)
            blocked = (
                e_per // n_per_img
                if cfg.MODEL.GC.GRAPH_TYPE == "knn"
                and cfg.TPU.TARGET_MAJOR
                and e_per % n_per_img == 0
                else 0
            )
            return decode_poses(
                sm[i], tg[i], nodes, nscore, ei, ev, ep, nvalid,
                node_threshold=node_threshold, num_joints=num_joints,
                class_probs=cp,
                with_refine=os.environ.get("BENCH_NO_REFINE") != "1",
                with_adjust=True,
                blocked_c=blocked,
                channels_last=True,
            )

        if os.environ.get("BENCH_NO_DECODE") == "1":
            # differential profiling knob: backbone+graph+MPN only
            return node_pred, edge_pred
        persons, valid = jax.vmap(decode_one)(jnp.arange(b))
        return persons, valid

    return jax.jit(forward), imgs


def main():
    import jax

    platform = jax.devices()[0].platform
    batch_size = int(os.environ.get("BENCH_BATCH", 8))
    warmup, iters = 2, int(os.environ.get("BENCH_ITERS", 10))
    if platform == "cpu":
        batch_size, warmup, iters = 1, 1, 2

    last_err = None
    compile_t0 = time.perf_counter()
    for bs in (batch_size, 4, 2, 1):
        try:
            fn, imgs = build_pipeline(bs)
            out = fn(imgs)
            # a host fetch surfaces OOM/compile failures reliably
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            batch_size = bs
            # breadcrumb for the documented compile-time cliffs (full scan
            # unroll; Mosaic at sub>1/nb=16): first build+compile seconds
            compile_s = time.perf_counter() - compile_t0
            break
        except Exception as e:  # noqa: BLE001 — fall back to smaller batch
            last_err = e
            fn = None
    if fn is None:
        raise last_err

    rng = np.random.RandomState(0)
    import jax.numpy as jnp

    def fetch(out):
        # force completion: on remote-tunnel platforms block_until_ready can
        # return before execution finishes; a host fetch of the final result
        # drains the (in-order) device queue
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf).ravel()[:1]

    data = jnp.asarray(rng.rand(*imgs.shape), jnp.float32)
    for _ in range(warmup):
        fetch(fn(data))
    # size the measurement window to >=10s (or BENCH_ITERS if set)
    t0 = time.perf_counter()
    fetch(fn(data))
    dt1 = time.perf_counter() - t0
    if "BENCH_ITERS" not in os.environ and platform != "cpu":
        iters = max(10, int(10.0 / max(dt1, 1e-3)))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(data)
    fetch(out)
    dt = time.perf_counter() - t0

    ips = batch_size * iters / dt

    # MFU from XLA's own flop count for the compiled pipeline — the
    # auditable absolute efficiency number (the 6.0 img/s denominator is an
    # estimate; see BASELINE.md)
    mfu = flops_per_img = None
    try:
        ca = fn.lower(data).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        total_flops = float(ca.get("flops", 0.0))
        peak = _peak_tflops(jax.devices()[0])
        if total_flops > 0:
            flops_per_img = total_flops / batch_size
            if peak:
                mfu = (total_flops / (dt / iters)) / (peak * 1e12)
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass
    print(
        json.dumps(
            {
                "metric": "images/sec end-to-end (backbone+MPN+grouping), HRNet-w48 640 single-scale",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(ips / REFERENCE_IMAGES_PER_SEC, 2),
            }
        )
    )
    extra = ""
    if mfu is not None:
        extra = f" mfu={mfu:.3f} gflops/img={flops_per_img / 1e9:.1f}"
    print(
        f"# platform={platform} batch={batch_size} iters={iters} "
        f"total={dt:.2f}s compile={compile_s:.0f}s{extra}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
