"""Multi-scale + flip test-time augmentation, TPU-batched.

Re-design of the reference's multi_scale_inference
(reference: src/Models/PoseEstimation/PoseEstimation.py:147-253,
src/Utils/hr_utils/multi_scales_testing.py:1-389). The reference loops
scales in python at batch=1, warps on the host with cv2, and crosses
device<->host per scale. Here:

  * host does only the cheap resize of the input image per scale (numpy warp,
    reference-exact 64-multiple sizing) and pads to a shape *bucket* so XLA
    compiles a handful of shapes instead of one per image
  * the device runs forward + flip-forward, remaps flipped channels
    (FLIP_CONFIG), projects every scale's heatmaps/tags/features onto the
    common base canvas with jax.image.scale_and_translate (dynamic scale,
    static shapes), and accumulates
  * graph construction + MPN + decode then run once on the aggregate, with
    the base-region validity mask doubling as the detection crowd mask

Tag channels follow the reference exactly: the scale-1 pass (or the single
configured scale) contributes its original and flipped tag maps as separate
channels — (H, W, J, S) with S = 2 if flip else 1 — and every downstream
consumer (AE edge features, refine, AE grouping) uses vector norms over S
(reference: multi_scales_testing.py:148-161, Utils.py:1100).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pemp_tpu.data.transforms import FLIP_CONFIG
from pemp_tpu.geometry import (
    get_affine_transform,
    get_multi_scale_size,
    get_multi_scale_size_hourglass,
    get_scaling_type,
    warp_affine,
)


def _head_probs(preds, gb):
    """Sigmoid/softmax of the final head outputs with variant-safe fallbacks:
    edge-less variants (tag regressors) get zero edge confidence, node-less
    variants (edge-only MPNs) fall back to detector scores as node scores
    (mirrors the reference's handling in valid.py:105-131)."""
    edge_logit = preds["edge"][-1] if preds["edge"] else None
    node_logit = preds["node"][-1] if preds["node"] else None
    edge_pred = (
        jax.nn.sigmoid(edge_logit)
        if edge_logit is not None
        else jnp.zeros(gb.edge_valid.shape, jnp.float32)
    )
    node_pred = (
        jax.nn.sigmoid(node_logit)
        if node_logit is not None
        else gb.joint_scores.astype(jnp.float32)
    )
    class_logit = preds["class"][-1] if preds.get("class") else None
    class_prob = (
        jax.nn.softmax(class_logit, axis=-1) if class_logit is not None else None
    )
    return edge_pred, node_pred, class_prob


def _blocked_c(cfg, num_edges: int, num_nodes: int) -> int:
    """Target-major blocked slot count for the decode fast path (0 = generic).

    Only the knn+target_major builder guarantees edge_index[1] == slot // C;
    every other graph type must use the generic scatter path.
    """
    if (
        cfg.MODEL.GC.GRAPH_TYPE == "knn"
        and bool(cfg.TPU.TARGET_MAJOR)
        and num_edges % num_nodes == 0
    ):
        return num_edges // num_nodes
    return 0


def _bucket(x: int, granularity: int = 128) -> int:
    return int(-(-x // granularity) * granularity)


def project_region(x, src_h, src_w, out_h: int, out_w: int,
                   tgt_h=None, tgt_w=None):
    """Bilinear projection of the valid ``[0:src_h, 0:src_w]`` region of a
    padded (H, W, C) tensor onto the ``[0:tgt_h, 0:tgt_w]`` region of a
    static ``(out_h, out_w)`` buffer (``tgt`` defaults to the full buffer;
    pass dynamic per-image canvas dims when batching over mixed sizes).

    Matches the reference's ``F.interpolate(mode='bilinear',
    align_corners=False)`` (multi_scales_testing.py:42-195 projection chain)
    with *dynamic* source dims inside a static padded tensor: scale_and_
    translate with translation 0 is exactly the half-pixel convention for a
    region anchored at the origin. ``antialias=False`` is required for
    parity — torch's bilinear interpolate never widens the kernel, even when
    downscaling (scales > 1 project DOWN to the base canvas), and the
    antialiased kernel diverges by ~3e-1 there (tests/
    test_tta_projection_golden.py pins both directions). The only remaining
    deviation is a <=1-px border band where the kernel reads padding zeros
    instead of clamping at the true edge; the golden test bounds it.
    """
    if tgt_h is None:
        tgt_h, tgt_w = out_h, out_w
    scale_vec = jnp.stack(
        [tgt_h / src_h, tgt_w / src_w]
    ).astype(jnp.float32)
    return jax.image.scale_and_translate(
        x, (out_h, out_w, x.shape[2]), (0, 1), scale_vec,
        jnp.zeros((2,), jnp.float32), method="bilinear", antialias=False,
    )


class TTAPipeline:
    """Host orchestration + cached per-bucket jitted device programs.

    ``mesh``: optional 1-D ``data`` jax.sharding.Mesh — when given,
    ``run_batched`` shards the image batch across its devices (eval fan-out;
    SURVEY §2.3: the reference has no distributed eval at all).
    """

    def __init__(self, model, variables, config, with_decode: bool = True,
                 maps_only: bool = False, mesh=None):
        self.maps_only = maps_only  # aggregate heat/tags only (valid_hr path)
        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) else None
        self.model = model
        self.variables = variables
        self.config = config
        self.input_size = config.DATASET.INPUT_SIZE
        self.scales = sorted(config.TEST.SCALE_FACTOR, reverse=True)
        self.min_scale = min(config.TEST.SCALE_FACTOR)
        self.flip = bool(config.TEST.FLIP_TEST)
        dataset = "COCO" if "coco" in config.DATASET.DATASET else "CROWDPOSE"
        if not config.TEST.FLIP_AND_REARANGE:
            dataset = "COCO_WITHOUT_REARANGING"
        self.flip_index = np.asarray(FLIP_CONFIG[dataset], np.int32)
        self.num_joints = config.DATASET.NUM_JOINTS
        self.with_decode = with_decode
        self.node_threshold = config.MODEL.MPN.NODE_THRESHOLD
        # PROJECT2IMAGE: aggregate at full input resolution and reverse-map
        # with "short_with_resize"; otherwise at scoremap resolution with
        # "short" / "long" (reference: valid.py:25-33). SCALING_TYPE=long is
        # the hourglass path (square max-side canvas, output at input/4;
        # reference: PoseEstimationHourglass.py:111-147)
        self.project2image = bool(config.TEST.PROJECT2IMAGE)
        self.scaling_long = config.DATASET.SCALING_TYPE == "long"
        self.scaling_type_str = get_scaling_type(config)
        self.size_fn = (
            get_multi_scale_size_hourglass if self.scaling_long else get_multi_scale_size
        )
        # scoremap-resolution divisor: 2 for HigherHRNet (output at input/2),
        # 4 for hourglass (output at input/4)
        self.out_ratio = self.input_size / float(max(config.DATASET.OUTPUT_SIZE))
        self._scale_fns = {}
        self._head_fns = {}
        self._batch_fns = {}

    # ------------------------------------------------------------------ host
    def _prepare(self, image: np.ndarray):
        """Resize per reference sizing; normalize; pad to buckets."""
        h, w = image.shape[:2]
        # long (hourglass): the aggregation canvas is the largest scale's
        # square input (reference: PoseEstimationHourglass.py:121-147 +
        # transformations.py long_with_multiscale reverse map)
        base_scale = max(self.scales) if self.scaling_long else 1.0
        base_size, center, scale = self.size_fn(
            h, w, self.input_size, base_scale, self.min_scale
        )
        base_w, base_h = base_size  # network-input space at scale min
        prepared = []
        # keyed on input dtype, not observed values: a near-black uint8 image
        # must still be scaled by 255 (reference ToTensor semantics)
        is_uint = np.issubdtype(image.dtype, np.integer)
        for s in self.scales:
            size_resized, _, sc = self.size_fn(h, w, self.input_size, s, self.min_scale)
            mat = get_affine_transform(center, sc, size_resized)
            img_r = warp_affine(image.astype(np.float32), mat, size_resized)
            if is_uint:
                img_r = img_r / 255.0
            img_r = (img_r - np.array([0.485, 0.456, 0.406], np.float32)) / np.array(
                [0.229, 0.224, 0.225], np.float32
            )
            ws, hs = size_resized
            hb, wb = _bucket(hs), _bucket(ws)
            padded = np.zeros((hb, wb, 3), np.float32)
            padded[:hs, :ws] = img_r
            flipped = np.zeros_like(padded)
            flipped[:hs, :ws] = img_r[:, ::-1]
            prepared.append(dict(padded=padded, flipped=flipped, hs=hs, ws=ws))
        return prepared, (base_h, base_w)

    # ---------------------------------------------------------------- device
    def _get_scale_fn(self, in_shape, out_shape):
        key = (in_shape, out_shape)
        if key in self._scale_fns:
            return self._scale_fns[key]

        model, variables = self.model, self.variables
        flip_index = jnp.asarray(self.flip_index)
        j = self.num_joints
        bh, bw = out_shape
        use_flip = self.flip

        def run(padded, flipped, dims):
            hs, ws, base_h, base_w = dims  # traced scalars (f32)

            def forward(img):
                _, scoremaps, features, tags = model.apply(
                    variables, img[None], train=False,
                    method=model.backbone_forward,
                )
                return scoremaps[0], features[0], tags[0]

            sm, feat, tg = forward(padded)
            n_acc = 1.0
            tag_vars = [tg]
            if use_flip:
                sm_f, _, tg_f = forward(flipped)
                # un-flip: valid region [0, ws/2) maps back after flip+roll
                half_w = sm_f.shape[1]
                shift = (half_w - jnp.round(ws / 2.0)).astype(jnp.int32)
                sm_f = jnp.roll(jnp.flip(sm_f, axis=1), -shift, axis=1)
                tg_f = jnp.roll(jnp.flip(tg_f, axis=1), -shift, axis=1)
                sm = sm + sm_f[:, :, flip_index]
                # tags are NOT averaged: orig + flipped stay separate channels
                # (reference aggregate_results_mpn: multi_scales_testing.py:148-161)
                tag_vars.append(tg_f[:, :, flip_index])
                n_acc = 2.0
            sm = sm / n_acc
            tg = jnp.stack(tag_vars, axis=-1)  # (h, w, J, F)

            # project onto the base canvas (scale_and_translate: dynamic
            # scale, static shapes) — reference project2image + aggregate
            def project(x):
                hh, ww = x.shape[0], x.shape[1]
                # valid subregion of this tensor is (hs/2, ws/2) when the
                # backbone output is half-res; infer from ratios
                src_h = hs * (hh / float(in_shape[0]))
                src_w = ws * (ww / float(in_shape[1]))
                return project_region(
                    x, src_h, src_w, bh, bw, tgt_h=base_h, tgt_w=base_w
                )

            f = tg.shape[-1]
            tg_flat = tg.reshape(tg.shape[0], tg.shape[1], -1)
            tg_proj = project(tg_flat).reshape(bh, bw, j, f)
            return project(sm), project(feat), tg_proj

        fn = jax.jit(run)
        self._scale_fns[key] = fn
        return fn

    def _get_head_fn(self, out_shape):
        if out_shape in self._head_fns:
            return self._head_fns[out_shape]
        from pemp_tpu.decode.assembly import decode_poses
        from pemp_tpu.graph.constructor import construct_graph_batch

        model, variables = self.model, self.variables
        gc = model.gc
        nt = self.node_threshold
        j = self.num_joints
        with_decode = self.with_decode
        cfg = self.config

        def head(heat, feat, tags, base_hw):
            base_h, base_w = base_hw
            bh, bw = heat.shape[0], heat.shape[1]
            yy = jnp.arange(bh)[:, None]
            xx = jnp.arange(bw)[None, :]
            base_mask = ((yy < base_h) & (xx < base_w)).astype(jnp.float32)

            gb = construct_graph_batch(
                gc, heat[None], feat[None], tags[None],
                masks=base_mask[None], testing=True,
            )
            preds = model.apply(
                variables, gb, train=False, method=model.mpn_forward
            )
            edge_pred, node_pred, class_prob = _head_probs(preds, gb)
            out = dict(
                nodes=gb.joint_det, node_scores=node_pred,
                detector_scores=gb.joint_scores,
                edge_index=gb.edge_index, edge_valid=gb.edge_valid,
                edge_pred=edge_pred, node_valid=gb.node_valid,
                class_prob=class_prob,
            )
            # tag-regression variants: per-node tag predictions ride along so
            # eval can group by tag matching (reference valid.py:105-131)
            tag_pred = preds.get("tag", [None])[-1]
            if tag_pred is not None:
                out["tag_pred"] = tag_pred
            if with_decode:
                persons, person_valid = decode_poses(
                    heat, tags,  # native NHWC (channels_last) — no transpose
                    gb.joint_det, node_pred, gb.edge_index, gb.edge_valid,
                    edge_pred, gb.node_valid,
                    node_threshold=nt, num_joints=j,
                    class_probs=class_prob,
                    with_fill_mean=cfg.TEST.FILL_MEAN,
                    with_refine=cfg.TEST.WITH_REFINE,
                    with_adjust=cfg.TEST.ADJUST,
                    blocked_c=_blocked_c(
                        cfg, gb.edge_index.shape[1], gb.joint_det.shape[0]
                    ),
                    channels_last=True,
                )
                out["persons"] = persons
                out["person_valid"] = person_valid
            return out

        fn = jax.jit(head)
        self._head_fns[out_shape] = fn
        return fn

    # -------------------------------------------------------- batched device
    def _get_batch_fn(self, sig, batch):
        """One jit for a whole image batch: every scale's forward (+flip),
        per-image projection onto the common canvas, graph + MPN, and the
        on-device decode — replacing the reference's per-image python eval
        loop (reference: src/valid.py:94-135)."""
        key = (sig, batch)
        if key in self._batch_fns:
            return self._batch_fns[key]
        from pemp_tpu.decode.assembly import decode_poses
        from pemp_tpu.graph.constructor import construct_graph_batch

        in_shapes, (bh, bw) = sig
        model, variables = self.model, self.variables
        flip_index = jnp.asarray(self.flip_index)
        use_flip = self.flip
        with_decode = self.with_decode
        maps_only = self.maps_only
        cfg = self.config
        gc = None if maps_only else model.gc
        nt = self.node_threshold
        j = self.num_joints
        n_scales = len(in_shapes)
        scales = self.scales

        def forward(imgs):
            _, scoremaps, features, tags = model.apply(
                variables, imgs, train=False, method=model.backbone_forward
            )
            return scoremaps, features, tags

        def unflip(x, ws):
            half_w = x.shape[1]
            shift = (half_w - jnp.round(ws / 2.0)).astype(jnp.int32)
            return jnp.roll(jnp.flip(x, axis=1), -shift, axis=1)

        def run(padded_all, flipped_all, scale_dims, canvas):
            # padded_all/flipped_all: tuple per scale of (B, H_s, W_s, 3)
            # scale_dims: (n_scales, B, 2) = per-image (hs, ws) per scale
            # canvas: (B, 2) = per-image (canvas_h, canvas_w)
            heat_acc = feat_acc = tag_acc = None
            for s in range(n_scales):
                sm, feat, tg = forward(padded_all[s])
                tag_vars = [tg]
                if use_flip:
                    sm_f, _, tg_f = forward(flipped_all[s])
                    sm_f = jax.vmap(unflip)(sm_f, scale_dims[s, :, 1])
                    tg_f = jax.vmap(unflip)(tg_f, scale_dims[s, :, 1])
                    sm = (sm + sm_f[:, :, :, flip_index]) / 2.0
                    # tags stay separate channels (multi_scales_testing.py:148-161)
                    tag_vars.append(tg_f[:, :, :, flip_index])
                tg = jnp.stack(tag_vars, axis=-1)  # (B, h, w, J, F)

                ih, iw = in_shapes[s]

                def project(x, hs, ws, base_h, base_w):
                    hh, ww = x.shape[0], x.shape[1]
                    src_h = hs * (hh / float(ih))
                    src_w = ws * (ww / float(iw))
                    return project_region(
                        x, src_h, src_w, bh, bw, tgt_h=base_h, tgt_w=base_w
                    )

                def proj(arr):
                    return jax.vmap(project)(
                        arr, scale_dims[s, :, 0], scale_dims[s, :, 1],
                        canvas[:, 0], canvas[:, 1],
                    )

                heat_acc = proj(sm) if heat_acc is None else heat_acc + proj(sm)
                feat_acc = proj(feat) if feat_acc is None else feat_acc + proj(feat)
                # only the scale-1 pass contributes tags (reference
                # aggregate_results_mpn: multi_scales_testing.py:148-150)
                if scales[s] == 1.0 or n_scales == 1 or (
                    tag_acc is None and s == n_scales - 1
                ):
                    f = tg.shape[-1]
                    tgf = tg.reshape(tg.shape[0], tg.shape[1], tg.shape[2], -1)
                    tag_acc = proj(tgf).reshape(batch, bh, bw, -1, f)
            heat_acc = heat_acc / float(n_scales)
            feat_acc = feat_acc / float(n_scales)

            if maps_only:
                # valid_hr path: aggregated heat/tags only, no graph/MPN
                return dict(scoremaps=heat_acc, tags=tag_acc)

            yy = jnp.arange(bh, dtype=jnp.float32)[None, :, None]
            xx = jnp.arange(bw, dtype=jnp.float32)[None, None, :]
            base_mask = (
                (yy < canvas[:, 0, None, None]) & (xx < canvas[:, 1, None, None])
            ).astype(jnp.float32)

            gb = construct_graph_batch(
                gc, heat_acc, feat_acc, tag_acc, masks=base_mask, testing=True
            )
            preds = model.apply(
                variables, gb, train=False, method=model.mpn_forward
            )
            edge_pred, node_pred, class_prob = _head_probs(preds, gb)

            b = batch
            n_per = gb.joint_det.shape[0] // b
            e_per = gb.edge_index.shape[1] // b
            rebase = (jnp.arange(b, dtype=gb.edge_index.dtype) * n_per)[None, :, None]
            out = dict(
                nodes=gb.joint_det.reshape(b, n_per, 3),
                node_scores=node_pred.reshape(b, n_per),
                detector_scores=gb.joint_scores.reshape(b, n_per),
                node_valid=gb.node_valid.reshape(b, n_per),
                edge_index=jnp.transpose(
                    gb.edge_index.reshape(2, b, e_per) - rebase, (1, 0, 2)
                ),
                edge_valid=gb.edge_valid.reshape(b, e_per),
                edge_pred=edge_pred.reshape(b, e_per),
                class_prob=(
                    class_prob.reshape(b, n_per, -1) if class_prob is not None else None
                ),
                scoremaps=heat_acc,
                tags=tag_acc,
            )
            tag_pred = preds.get("tag", [None])[-1]
            if tag_pred is not None:
                out["tag_pred"] = tag_pred.reshape(b, n_per, -1)
            if with_decode:
                def decode_one(i):
                    cp = out["class_prob"][i] if class_prob is not None else None
                    return decode_poses(
                        # native NHWC (channels_last) — no transpose copies
                        heat_acc[i], tag_acc[i],
                        out["nodes"][i], out["node_scores"][i],
                        out["edge_index"][i], out["edge_valid"][i],
                        out["edge_pred"][i], out["node_valid"][i],
                        node_threshold=nt, num_joints=j, class_probs=cp,
                        with_fill_mean=cfg.TEST.FILL_MEAN,
                        with_refine=cfg.TEST.WITH_REFINE,
                        with_adjust=cfg.TEST.ADJUST,
                        blocked_c=_blocked_c(cfg, e_per, n_per),
                        channels_last=True,
                    )

                persons, person_valid = jax.vmap(decode_one)(jnp.arange(b))
                out["persons"] = persons
                out["person_valid"] = person_valid
            return out

        if self.mesh is not None:
            # eval fan-out: batch dim sharded over the data mesh axis — each
            # device runs its slice of images through the whole pipeline
            from jax.sharding import NamedSharding, PartitionSpec as P

            bsh = NamedSharding(self.mesh, P("data"))
            fn = jax.jit(
                run,
                in_shardings=(
                    tuple(bsh for _ in range(n_scales)),
                    tuple(bsh for _ in range(n_scales)),
                    NamedSharding(self.mesh, P(None, "data")),
                    bsh,
                ),
            )
        else:
            fn = jax.jit(run)
        self._batch_fns[key] = fn
        return fn

    def run_batched(self, images, batch_size: int = 8):
        """Evaluate a list of images with device batching.

        Images are grouped by their padded shape signature (per-scale input
        buckets + canvas bucket) and processed in power-of-two chunks so XLA
        compiles a handful of programs. Returns per-image dicts identical to
        __call__'s contract.
        """
        preps, metas = [], []
        for image in images:
            prepared, (base_h, base_w) = self._prepare(np.asarray(image))
            if self.project2image:
                canvas_h, canvas_w = float(base_h), float(base_w)
            else:
                canvas_h = base_h / self.out_ratio
                canvas_w = base_w / self.out_ratio
            bh, bw = _bucket(int(canvas_h)), _bucket(int(canvas_w))
            sig = (
                tuple(p["padded"].shape[:2] for p in prepared),
                (bh, bw),
            )
            preps.append(prepared)
            metas.append(dict(
                sig=sig, canvas=(canvas_h, canvas_w), base=(base_w, base_h)
            ))

        groups: dict = {}
        for idx, m in enumerate(metas):
            groups.setdefault(m["sig"], []).append(idx)

        outs: list = [None] * len(images)
        for sig, idxs in groups.items():
            for start in range(0, len(idxs), batch_size):
                chunk = idxs[start:start + batch_size]
                b = 1
                while b < len(chunk):
                    b *= 2
                if self.mesh is not None:
                    # batch must divide evenly across the data axis
                    n_dev = int(self.mesh.devices.size)
                    b = max(b, n_dev)
                    if b % n_dev:
                        b = n_dev * (-(-b // n_dev))
                filled = chunk + [chunk[-1]] * (b - len(chunk))
                n_scales = len(sig[0])
                padded_all, flipped_all = [], []
                for s in range(n_scales):
                    padded_all.append(
                        jnp.asarray(np.stack([preps[i][s]["padded"] for i in filled]))
                    )
                    flipped_all.append(
                        jnp.asarray(np.stack([preps[i][s]["flipped"] for i in filled]))
                    )
                scale_dims = jnp.asarray(
                    np.array(
                        [[[preps[i][s]["hs"], preps[i][s]["ws"]] for i in filled]
                         for s in range(n_scales)],
                        np.float32,
                    )
                )
                canvas = jnp.asarray(
                    np.array([metas[i]["canvas"] for i in filled], np.float32)
                )
                fn = self._get_batch_fn(sig, b)
                out = fn(tuple(padded_all), tuple(flipped_all), scale_dims, canvas)
                for k, idx in enumerate(chunk):
                    o = {
                        kk: (vv[k] if vv is not None else None)
                        for kk, vv in out.items()
                    }
                    o["base_size"] = metas[idx]["base"]
                    # actual (unbucketed) canvas extent — consumers crop the
                    # padded maps to this before host grouping
                    o["canvas_size"] = (
                        int(metas[idx]["canvas"][0]),
                        int(metas[idx]["canvas"][1]),
                    )
                    o["scaling_type"] = self.scaling_type_str
                    outs[idx] = o
        return outs

    # ------------------------------------------------------------------ run
    def __call__(self, image: np.ndarray):
        prepared, (base_h, base_w) = self._prepare(image)
        if self.project2image:
            canvas_h, canvas_w = float(base_h), float(base_w)
        else:
            canvas_h = base_h / self.out_ratio
            canvas_w = base_w / self.out_ratio
        bh, bw = _bucket(int(canvas_h)), _bucket(int(canvas_w))
        heat_acc = feat_acc = tag_acc = None
        single_scale = len(self.scales) == 1
        for s, p in zip(self.scales, prepared):
            in_shape = p["padded"].shape[:2]
            fn = self._get_scale_fn(in_shape, (bh, bw))
            dims = jnp.asarray(
                [p["hs"], p["ws"], canvas_h, canvas_w], jnp.float32
            )
            heat, feat, tg = fn(
                jnp.asarray(p["padded"]), jnp.asarray(p["flipped"]), dims
            )
            heat_acc = heat if heat_acc is None else heat_acc + heat
            feat_acc = feat if feat_acc is None else feat_acc + feat
            # only the scale-1 pass contributes tag channels (reference
            # aggregate_results_mpn: multi_scales_testing.py:148-150)
            if s == 1.0 or single_scale:
                tag_acc = tg
        n = float(len(self.scales))
        heat_acc = heat_acc / n
        feat_acc = feat_acc / n
        if tag_acc is None:  # no scale-1 pass configured: fall back to last
            tag_acc = tg

        if self.maps_only:
            out = {}
        else:
            head = self._get_head_fn((bh, bw))
            out = head(heat_acc, feat_acc, tag_acc,
                       jnp.asarray([canvas_h, canvas_w], jnp.float32))
        out["base_size"] = (base_w, base_h)
        out["canvas_size"] = (int(canvas_h), int(canvas_w))
        out["scaling_type"] = self.scaling_type_str
        out["scoremaps"] = heat_acc
        out["tags"] = tag_acc
        return out
