#!/usr/bin/env python
"""Stage-by-stage timing of the flagship eval pipeline on the current device."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, args, iters=6, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from pemp_tpu.config import get_config, update_config
    from pemp_tpu.decode.assembly import decode_poses
    from pemp_tpu.graph.constructor import construct_graph_batch
    from pemp_tpu.models import build_pose_model

    batch = int(os.environ.get("BATCH", 8))
    size = int(os.environ.get("SIZE", 640))
    cfg = get_config()
    cfg = update_config(cfg, "configs/hrnet/w48_640.yaml")
    cfg.defrost()
    cfg.DATASET.INPUT_SIZE = size
    cfg.DATASET.OUTPUT_SIZE = [size // 4, size // 2]
    cfg.freeze()
    model = build_pose_model(cfg, dtype=jnp.bfloat16)
    imgs = jnp.asarray(np.random.RandomState(0).rand(batch, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs[:1], train=False)

    bb = jax.jit(
        lambda im: model.apply(variables, im, train=False, method=model.backbone_forward)
    )
    t_bb = timed(bb, (imgs,))
    print(f"backbone+feature_gather: {t_bb * 1000:.1f} ms/batch")

    _, sm, feat, tags = bb(imgs)

    gc_fn = jax.jit(
        lambda s, f, t: construct_graph_batch(model.gc, s, f, t, testing=True)
    )
    t_gc = timed(gc_fn, (sm, feat, tags))
    print(f"graph constructor:       {t_gc * 1000:.1f} ms/batch")

    gb = gc_fn(sm, feat, tags)
    mpn_fn = jax.jit(lambda g: model.apply(variables, g, train=False, method=model.mpn_forward))
    t_mpn = timed(mpn_fn, (gb,))
    print(f"MPN (10 steps + heads):  {t_mpn * 1000:.1f} ms/batch")

    preds = mpn_fn(gb)
    nj = cfg.DATASET.NUM_JOINTS
    npt = nj * cfg.TPU.NODES_PER_TYPE

    def dec(sm_, tags_, gb_, edge_logit, node_logit, class_logit):
        ep = jax.nn.sigmoid(edge_logit)
        np_ = jax.nn.sigmoid(node_logit)
        cp = jax.nn.softmax(class_logit, axis=-1)
        smT = jnp.transpose(sm_, (0, 3, 1, 2))
        tgT = jnp.transpose(tags_, (0, 3, 1, 2))
        b = sm_.shape[0]
        e_per = gb_.edge_index.shape[1] // b

        def one(i):
            sl = jax.lax.dynamic_slice_in_dim
            return decode_poses(
                smT[i], tgT[i],
                sl(gb_.joint_det, i * npt, npt, 0),
                sl(np_, i * npt, npt, 0),
                sl(gb_.edge_index, i * e_per, e_per, 1) - i * npt,
                sl(gb_.edge_valid, i * e_per, e_per, 0),
                sl(ep, i * e_per, e_per, 0),
                sl(gb_.node_valid, i * npt, npt, 0),
                node_threshold=0.1, num_joints=nj,
                class_probs=sl(cp, i * npt, npt, 0),
            )

        return jax.vmap(one)(jnp.arange(b))

    dec_fn = jax.jit(dec)
    t_dec = timed(
        dec_fn,
        (sm, tags, gb, preds["edge"][-1], preds["node"][-1], preds["class"][-1]),
    )
    print(f"decode (CC+refine+adj):  {t_dec * 1000:.1f} ms/batch")
    total = t_bb + t_gc + t_mpn + t_dec
    print(f"sum: {total * 1000:.1f} ms/batch -> {batch / total:.2f} img/s (unfused stages)")


if __name__ == "__main__":
    main()
