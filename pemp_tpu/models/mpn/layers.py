"""Message-passing network layers on padded, static-shape graphs.

TPU-native re-design of the reference MPN layers
(reference: src/Models/MessagePassingNetwork/layers.py). Key differences:

  * graphs are padded to a fixed (N nodes, E edges) with validity masks —
    no torch_geometric, no dynamic shapes
  * the reference's per-type aggregation python loop (17 scatters per step,
    layers.py:234-240) is one combined-index segment op
  * the reference's per-type MLPs (17 nn.Linear selected by boolean indexing,
    layers.py:260-303) are a single batched parameter tensor contracted on
    the MXU and gathered per element
  * BatchNorm over nodes/edges is masked so padded elements never pollute
    statistics
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pemp_tpu.ops.segment import (
    blocked_aggregate,
    blocked_per_type_aggregate,
    blocked_per_type_attention_aggregate,
    per_type_aggregate,
    per_type_attention_aggregate,
    segment_aggregate,
)

# COCO joint order: nose, eye_l, eye_r, ear_l, ear_r, sho_l, sho_r, elb_l,
# elb_r, wri_l, wri_r, hip_l, hip_r, kne_l, kne_r, ank_l, ank_r
_LEFT_RIGHT = [0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8]
_PER_BODY_PART = [0, 0, 0, 0, 0, 1, 1, 2, 3, 2, 3, 4, 5, 4, 5, 4, 5]


def sum_node_types(node_summary: str, node_types):
    """reference: src/Models/MessagePassingNetwork/utils.py:6-19"""
    if node_summary == "not":
        return node_types
    if node_summary == "left_right":
        return jnp.asarray(_LEFT_RIGHT, dtype=node_types.dtype)[node_types]
    if node_summary == "per_body_part":
        return jnp.asarray(_PER_BODY_PART, dtype=node_types.dtype)[node_types]
    raise NotImplementedError(node_summary)


def num_summary_types(node_summary: str, num_joints: int) -> int:
    if node_summary == "not":
        return num_joints
    if node_summary == "left_right":
        return 9
    if node_summary == "per_body_part":
        return 6
    raise NotImplementedError(node_summary)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the element axis with a validity mask.

    Matches torch BatchNorm1d semantics (biased variance for normalization,
    unbiased for the running update, momentum 0.1) but computes statistics
    over valid elements only so padding is inert.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, valid=None, train: bool = False):
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if train:
            xf = x.astype(jnp.float32)
            if valid is not None:
                w = valid.astype(jnp.float32)[:, None]
                count = jnp.maximum(w.sum(), 1.0)
                mean = (xf * w).sum(axis=0) / count
                var = (jnp.square(xf - mean) * w).sum(axis=0) / count
            else:
                count = jnp.float32(x.shape[0])
                mean = xf.mean(axis=0)
                var = jnp.square(xf - mean).mean(axis=0)
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jnp.asarray(1.0, jnp.float32) / jnp.sqrt(var + self.epsilon)
        out = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return out.astype(self.dtype)


class MLP(nn.Module):
    """reference _make_mlp (layers.py:8-29): Linear / ReLU / BN stacks.

    Layer order mirrors the reference exactly: ReLU precedes BN; the final
    Linear gets neither unless end_with_relu.
    """

    hidden_dims: Sequence[int]
    bn: bool = False
    init_trick: bool = False
    end_with_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, valid=None, train: bool = False):
        dims = list(self.hidden_dims)
        n = len(dims)
        x = nn.Dense(dims[0], dtype=self.dtype, name="lin0")(x)
        if n != 1:
            x = nn.relu(x)
            if self.bn:
                x = MaskedBatchNorm(dtype=self.dtype, name="bn0")(x, valid, train)
        for i in range(1, n):
            last = i == n - 1
            bias_init = (
                nn.initializers.constant(-2.0) if (last and self.init_trick) else nn.initializers.zeros
            )
            x = nn.Dense(dims[i], dtype=self.dtype, bias_init=bias_init, name=f"lin{i}")(x)
            if not last:
                x = nn.relu(x)
                if self.bn:
                    x = MaskedBatchNorm(dtype=self.dtype, name=f"bn{i}")(x, valid, train)
        if self.end_with_relu:
            x = nn.relu(x)
            if self.bn:
                x = MaskedBatchNorm(dtype=self.dtype, name="bn_end")(x, valid, train)
        return x


class TypeAwareLinear(nn.Module):
    """num_types parallel Linear layers selected per element by type.

    Replaces the reference's ModuleList-of-Linear + boolean indexing
    (layers.py:260-303) with one batched weight tensor: the contraction runs
    as a single (E, Din) x (Din, T*Dout) matmul on the MXU, then a gather
    picks each element's type slice. Computation runs in ``dtype``.
    """

    num_types: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, types):
        din = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (self.num_types, din, self.features),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_types, self.features)
        )
        kernel = jnp.asarray(kernel, self.dtype)
        y = jnp.einsum("ei,tio->eto", x.astype(self.dtype), kernel)
        out = jnp.take_along_axis(y, types[:, None, None], axis=1)[:, 0]
        # jnp.take keeps this valid when params arrive as host numpy arrays
        # (checkpoint restore) and the index is a tracer
        return out + jnp.take(jnp.asarray(bias, self.dtype), types, axis=0)


class TypeAwareSplitLinear(nn.Module):
    """Type-selected Linear over a concat [node_part, edge_part] input where
    the node part repeats across a node's edges.

    Exploits that distinct (node, type) pairs number N*T << E: the node-part
    contraction is computed once per (node, type) and gathered per edge,
    leaving only the (smaller) edge part in the E-major per-type matmul.
    Mathematically identical to TypeAwareLinear on the concatenation.

    With ``rev_perm`` (the reverse-edge involution from
    ops.knn.reverse_edge_perm; requires the symmetric target-major layout
    with type-blocked detections), the edge-part projection runs with ZERO
    type waste: permuting edge features by rev_perm groups each slot's
    SOURCE type into static blocks (slot f's source = target of its reverse
    = node f // C, whose raw type is statically (f // (K*C)) mod J), so the
    per-type contraction is a (B, J, K*C, De) x (J, De, F) batched matmul
    instead of an (E, De) x (De, T*F) all-types matmul + select — a T-fold
    FLOP reduction on the MPN's hottest op.
    """

    num_types: int
    features: int
    raw_blocks: int = 0   # J: raw type blocks per image (type-blocked nodes)
    block_slots: int = 0  # K*C: edge slots per raw type block
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, node_part, node_of_edge, edge_part, types,
                 rev_perm=None, sum_map=None):
        dn = node_part.shape[-1]
        de = edge_part.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (self.num_types, dn + de, self.features),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_types, self.features)
        )
        kernel = jnp.asarray(kernel, self.dtype)
        wn, we = kernel[:, :dn], kernel[:, dn:]
        # node part: (N, T, D) — tiny — then one flat (node, type) gather per
        # edge; never materializes an (E, T, D) tensor
        a = jnp.einsum("ni,tio->nto", node_part.astype(self.dtype), wn)
        a_flat = a.reshape(-1, self.features)
        a_sel = a_flat[node_of_edge * self.num_types + types]
        if rev_perm is not None and self.raw_blocks and self.block_slots:
            # zero-waste typed projection via the reverse-edge permutation:
            # c[f] = edge_part[R[f]] uses block f//(K*C)'s (raw) type, and
            # b_sel[e] = (c @ W)[R[e]] == edge_part[e] @ we[type(src(e))]
            # since R is an involution on the symmetric layout
            e = edge_part.shape[0]
            j, kc = self.raw_blocks, self.block_slots
            wj = we if sum_map is None else jnp.take(we, sum_map, axis=0)
            cperm = edge_part[rev_perm].astype(self.dtype)
            cperm = cperm.reshape(e // (j * kc), j, kc, de)
            bj = jnp.einsum("bjkd,jdf->bjkf", cperm, wj)
            b_sel = bj.reshape(e, self.features)[rev_perm]
        else:
            # edge part: per-type matmul on the smaller edge features only
            b = jnp.einsum("ei,tio->eto", edge_part.astype(self.dtype), we)
            b_sel = jnp.take_along_axis(b, types[:, None, None], axis=1)[:, 0]
        return a_sel + b_sel + jnp.take(jnp.asarray(bias, self.dtype), types, axis=0)


class TypeAwareEdgeUpdate(nn.Module):
    """Per-type edge MLP. reference: layers.py:276-303"""

    num_types: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_i, x_j, edges, types_i, types_j):
        t1 = TypeAwareLinear(self.num_types, self.output_dim, name="layer_1")(x_i, types_i)
        t2 = TypeAwareLinear(self.num_types, self.output_dim, name="layer_2")(x_j, types_j)
        e = nn.Dense(self.output_dim, dtype=self.dtype, name="edge_layer")(edges)
        h = nn.relu(jnp.concatenate([t1, t2, e], axis=-1))
        h = nn.Dense(self.output_dim, dtype=self.dtype, name="out")(h)
        return nn.relu(h)


class HierarchUpdateMlp(nn.Module):
    """Skeleton-hierarchy update over the (N, T, D) per-type tensor.

    reference: layers.py:89-128.
    """

    node_dim: int
    num_joints: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, update):
        n = update.shape[0]
        half = self.node_dim // 2
        if self.num_joints == 17:
            order_1 = [(0, 1, 2, 3, 4), (5, 6), (7, 9), (8, 10), (11, 12), (13, 15), (14, 16)]
        else:
            order_1 = [(0, 1), (2, 3), (4, 6), (5, 7), (8, 9), (10, 12), (11, 13)]
        order_2 = [(0, 1), (1, 2), (1, 3), (1, 4), (4, 5), (4, 6)]

        out_1 = []
        for i, types in enumerate(order_1):
            inp = update[:, list(types)].reshape(n, -1)
            out_1.append(nn.relu(nn.Dense(half, dtype=self.dtype, name=f"first_{i}")(inp)))
        out_1 = jnp.stack(out_1, axis=1)  # (N, 7, half)
        out_2 = []
        for i, types in enumerate(order_2):
            inp = out_1[:, list(types)].reshape(n, -1)
            out_2.append(nn.relu(nn.Dense(half, dtype=self.dtype, name=f"second_{i}")(inp)))
        out_2 = jnp.concatenate(out_2, axis=1).reshape(n, -1)
        return nn.relu(nn.Dense(self.node_dim, dtype=self.dtype, name="final")(out_2))


class MPLayer(nn.Module):
    """Type-agnostic message-passing layer. reference: layers.py:32-86"""

    node_feature_dim: int
    edge_feature_dim: int
    edge_feature_hidden: int
    aggr: str = "max"
    use_node_update_mlp: bool = False
    edge_mlp: str = "agnostic"
    num_types: int = 17
    blocked_c: int = 0  # >0: edges are target-major blocks of this size
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types=None, edge_valid=None,
                 pre=None):
        num_nodes = x.shape[0]
        j, i = edge_index[0], edge_index[1]  # message flows j -> i
        if self.blocked_c:
            # blocked layout: target index is statically slot // C
            i = jnp.repeat(jnp.arange(num_nodes, dtype=edge_index.dtype), self.blocked_c)
            x_i = jnp.repeat(x, self.blocked_c, axis=0)
        else:
            x_i = x[i]
        x_j = x[j]
        pre = pre or {}

        if self.edge_mlp == "agnostic":
            h = jnp.concatenate([x_i, x_j, edge_attr], axis=-1)
            h = nn.Dense(self.edge_feature_hidden, dtype=self.dtype, name="mlp_edge_0")(h)
            h = nn.relu(h)
            h = nn.Dense(self.edge_feature_dim, dtype=self.dtype, name="mlp_edge_1")(h)
            new_edge = nn.relu(h)
        elif self.edge_mlp == "per_type":
            dst_type = pre.get("dst_type")
            src_type = pre.get("src_type")
            if dst_type is None:
                dst_type = node_types[i]
            if src_type is None:
                src_type = node_types[j]
            new_edge = TypeAwareEdgeUpdate(
                self.num_types, self.edge_feature_hidden, dtype=self.dtype, name="mlp_edge"
            )(x_i, x_j, edge_attr, dst_type, src_type)
        else:
            raise NotImplementedError(self.edge_mlp)

        m = jnp.concatenate([x_i, new_edge], axis=-1)
        m = nn.Dense(self.node_feature_dim, dtype=self.dtype, name="mlp_node")(m)
        m = nn.relu(m)

        if self.blocked_c:
            aggr_out = blocked_aggregate(m, num_nodes, self.aggr, edge_valid)
        else:
            aggr_out = segment_aggregate(m, i, num_nodes, self.aggr, edge_valid)
        if self.use_node_update_mlp:
            aggr_out = nn.relu(
                nn.Dense(self.node_feature_dim, dtype=self.dtype, name="update_mlp")(aggr_out)
            )
        return aggr_out, new_edge


class TypeAwareMPNLayer(nn.Module):
    """Flagship layer: per-source-type aggregation with optional per-edge
    attention and a type-concat update MLP. reference: layers.py:157-258.
    """

    node_feature_dim: int
    edge_feature_dim: int
    edge_feature_hidden: int
    aggr: str = "add"
    edge_mlp: str = "agnostic"
    num_types: int = 17
    aggr_sub: str = "None"
    update_type: str = "mlp"
    blocked_c: int = 0  # >0: edges are target-major blocks of this size
    use_fused_kernel: bool = False  # Pallas fused message+aggregate (TPU)
    pallas_interpret: bool = False  # run the kernel in interpret mode (tests)
    raw_types: int = 0       # J: raw joint types (type-blocked detections)
    nodes_per_type: int = 0  # K: detections per type (0 = unknown layout)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, edge_valid=None,
                 pre=None):
        """``pre``: optional dict of loop-invariant precomputations hoisted
        out of the scanned step (src_type, dst_type, src_type2d, valid2d) —
        the gathers/layout casts are identical every step, so recomputing
        them inside the scan body wastes ~40% of the MPN's device time."""
        num_nodes = x.shape[0]
        j, i = edge_index[0], edge_index[1]
        if self.blocked_c:
            # target-major blocked layout: edge_index[1] == slot // C by
            # construction (ops.knn.knn_edges_target_major), so the target
            # side never needs a data-dependent gather
            i = jnp.repeat(jnp.arange(num_nodes, dtype=edge_index.dtype), self.blocked_c)
        pre = pre or {}
        src_type = pre.get("src_type")
        if src_type is None:
            src_type = node_types[j]

        if (
            self.use_fused_kernel
            and self.blocked_c
            and self.aggr_sub == "node_edge_attn"
            and self.edge_mlp == "agnostic"
            and pre.get("fused_step")
            and pre.get("src_local2d") is not None
            and pre.get("valid2d") is not None
            and pre.get("init_edge_dim", 0) > 0
            and self.raw_types
            and self.nodes_per_type
            and fused_tile_ok(num_nodes, self.blocked_c, self.num_types)
        ):
            # FULLY-fused step: x_j gather + both edge-MLP stages + typed
            # message + attention aggregation in one Pallas kernel — the
            # E-sized XLA-side chain (gather, stage-1 sum, stage-2 dot)
            # never touches HBM. Loop-invariant halves (h_init, p_init, the
            # init-edge projection q) are CSE'd by XLA under the unrolled
            # scan exactly like the split-MLP path.
            from pemp_tpu.ops.pallas.fused_step import fused_mpn_step

            dn = x.shape[-1]
            da = edge_attr.shape[-1]
            dec = pre["init_edge_dim"]
            h_dim = self.edge_feature_hidden
            k0, b0 = _DenseParams(2 * dn + da, h_dim, name="mlp_edge_0")()
            k1, b1 = _DenseParams(
                h_dim, self.edge_feature_dim, name="mlp_edge_1"
            )()
            kernel, kbias = _TypedParams(
                self.num_types, dn + self.edge_feature_dim,
                self.node_feature_dim, name="mlp_node",
            )()
            ak, _ab = _DenseParams(self.edge_feature_dim, 1, name="attn_net")()
            k0 = jnp.asarray(k0, self.dtype)
            xd = x.astype(self.dtype)
            h_node = xd @ k0[:dn] + jnp.asarray(b0, self.dtype)      # (N, H)
            p = xd @ k0[dn:2 * dn]                                   # (N, H)
            q = edge_attr[:, :dec].astype(self.dtype) @ k0[2 * dn:2 * dn + dec]
            cur = edge_attr[:, dec:].astype(self.dtype)
            wn = jnp.asarray(kernel[:, :dn], self.dtype)
            we = jnp.asarray(kernel[:, dn:], self.dtype)
            a = jnp.einsum("ni,tio->nto", xd, wn)
            a = a + jnp.asarray(kbias, self.dtype)[None]
            we_flat = jnp.transpose(we, (1, 0, 2)).reshape(
                self.edge_feature_dim, self.num_types * self.node_feature_dim
            )
            updates, new_edge = fused_mpn_step(
                p, h_node, q, cur, a,
                pre["src_local2d"], pre["src_type2d"], pre["valid2d"],
                k0[2 * dn + dec:], jnp.asarray(k1, self.dtype),
                jnp.asarray(b1, self.dtype), we_flat,
                jnp.asarray(ak, self.dtype),
                num_nodes, self.num_types,
                self.raw_types * self.nodes_per_type,
                interpret=self.pallas_interpret,
            )
            if self.update_type == "mlp":
                flat = updates.reshape(num_nodes, -1)
                out = nn.relu(
                    nn.Dense(
                        self.node_feature_dim, dtype=self.dtype,
                        name="update_mlp",
                    )(flat)
                )
            else:
                out = HierarchUpdateMlp(
                    self.node_feature_dim, self.num_types, dtype=self.dtype,
                    name="update_mlp",
                )(updates)
            return out, new_edge

        if self.edge_mlp == "agnostic":
            if self.blocked_c:
                # split the concat-matmul: the x_i part collapses to one
                # node-level dot broadcast over each node's C slots — the
                # E-level x_i copy (100+MB/step) never materializes. Params
                # stay a single Dense("mlp_edge_0") for checkpoint parity.
                dn = x.shape[-1]
                da = edge_attr.shape[-1]
                k0, b0 = _DenseParams(
                    2 * dn + da, self.edge_feature_hidden, name="mlp_edge_0"
                )()
                k0 = jnp.asarray(k0, self.dtype)
                b0 = jnp.asarray(b0, self.dtype)
                h_node = x.astype(self.dtype) @ k0[:dn] + b0          # (N, H)
                di = pre.get("init_dim", 0)
                xj_init = pre.get("xj_init")
                # matmul-transpose backward where the blocked layout allows:
                # the (E, D) row scatter-add in the gather's autodiff
                # transpose is 10% of train-step device time; a per-image
                # one-hot MXU contraction is exact and ~20x faster
                # (eligibility rule lives in ops/gather_mm.py)
                from pemp_tpu.ops.gather_mm import gather_rows_mm_or_plain

                n_img = self.raw_types * self.nodes_per_type
                gather = lambda t, idx: gather_rows_mm_or_plain(t, idx, n_img)  # noqa: E731
                if di and xj_init is not None:
                    # skip-connection split: the init half of x_j is
                    # loop-invariant and pre-gathered; only the current half
                    # is gathered per step (halves the gather bytes).
                    # project the current half N-major BEFORE the gather:
                    # (x @ W)[j] == x[j] @ W but the matmul shrinks from
                    # E-major to N-major (C x fewer FLOPs, same gather bytes)
                    xproj = x[:, di:].astype(self.dtype) @ k0[dn + di:2 * dn]
                    h_edge = (
                        xj_init.astype(self.dtype) @ k0[dn:dn + di]
                        + gather(xproj, j)
                        + edge_attr.astype(self.dtype) @ k0[2 * dn:]
                    )                                                 # (E, H)
                else:
                    x_j = gather(x, j)
                    h_edge = (
                        x_j.astype(self.dtype) @ k0[dn:2 * dn]
                        + edge_attr.astype(self.dtype) @ k0[2 * dn:]
                    )                                                 # (E, H)
                # repeat-add instead of reshape-add: the (E,H)->(N,C,H)
                # reshape forces a column-major relayout copy (~0.7ms/step)
                # at C=82; with 8-aligned C the reshape is a free bitcast —
                # PEMP_EDGE3D=1 selects the broadcast-add form for tuning
                import os as _os

                if (
                    _os.environ.get("PEMP_EDGE3D") == "1"
                    and self.blocked_c % 8 == 0
                ):
                    n_nodes_ = x.shape[0]
                    h3 = h_edge.reshape(n_nodes_, self.blocked_c, -1)
                    h = nn.relu(h3 + h_node[:, None, :]).reshape(h_edge.shape)
                else:
                    h = nn.relu(
                        h_edge + jnp.repeat(h_node, self.blocked_c, axis=0)
                    )
            else:
                x_i = x[i]
                x_j = x[j]
                h = jnp.concatenate([x_i, x_j, edge_attr], axis=-1)
                h = nn.Dense(self.edge_feature_hidden, dtype=self.dtype, name="mlp_edge_0")(h)
                h = nn.relu(h)
            h = nn.Dense(self.edge_feature_dim, dtype=self.dtype, name="mlp_edge_1")(h)
            new_edge = nn.relu(h)
        elif self.edge_mlp in ("per_type", "per_type_2"):
            dst_type = pre.get("dst_type")
            if dst_type is None:
                dst_type = node_types[i]
            x_j = x[j]
            x_i = (
                jnp.repeat(x, self.blocked_c, axis=0) if self.blocked_c else x[i]
            )
            new_edge = TypeAwareEdgeUpdate(
                self.num_types, self.edge_feature_hidden, dtype=self.dtype, name="mlp_edge"
            )(x_i, x_j, edge_attr, dst_type, src_type)
        else:
            raise NotImplementedError(self.edge_mlp)

        # fused Pallas path: typed message MLP + attention aggregation in one
        # VMEM-resident kernel (3x the jnp path on TPU). Falls back whenever
        # the configuration or tiling doesn't fit.
        if (
            self.use_fused_kernel
            and self.blocked_c
            and self.aggr_sub == "node_edge_attn"
            and fused_tile_ok(num_nodes, self.blocked_c, self.num_types)
        ):
            from pemp_tpu.ops.pallas.fused_typed_message import (
                fused_typed_message_aggregate,
            )

            kernel, bias = _TypedParams(
                self.num_types, x.shape[-1] + new_edge.shape[-1],
                self.node_feature_dim, name="mlp_node",
            )()
            ak, _ab = _DenseParams(new_edge.shape[-1], 1, name="attn_net")()
            # attention bias is constant within each softmax group -> dropped
            dn = x.shape[-1]
            wn = jnp.asarray(kernel[:, :dn], self.dtype)
            we = jnp.asarray(kernel[:, dn:], self.dtype)
            a = jnp.einsum("ni,tio->nto", x.astype(self.dtype), wn)
            a = a + jnp.asarray(bias, self.dtype)[None]
            kt = pre.get("src_type2d")
            kv = pre.get("valid2d")
            if kt is None:
                kt = src_type
            if kv is None:
                kv = edge_valid if edge_valid is not None else jnp.ones(
                    new_edge.shape[0], bool
                )
            rev_perm = pre.get("rev_perm")
            if rev_perm is not None and self.raw_types and self.nodes_per_type:
                # HYBRID: zero-waste typed projection outside (reverse-edge
                # involution groups sources into static raw-type blocks) +
                # slim in-kernel selection/softmax/aggregation. The in-kernel
                # chunked all-types projection costs ~2.1ms/step of the full
                # kernel's ~4.9ms at flagship shapes; this removes it.
                from pemp_tpu.ops.pallas.fused_typed_message import (
                    fused_attn_aggregate,
                )

                e = new_edge.shape[0]
                jraw, kc = self.raw_types, self.nodes_per_type * self.blocked_c
                sum_map = pre.get("type_sum_map")
                wj = we if sum_map is None else jnp.take(we, sum_map, axis=0)
                ne = new_edge.astype(self.dtype)
                cperm = ne[rev_perm].reshape(e // (jraw * kc), jraw, kc, -1)
                bsel = jnp.einsum("bjkd,jdf->bjkf", cperm, wj)
                bsel = bsel.reshape(e, self.node_feature_dim)[rev_perm]
                logits = ne @ jnp.asarray(ak, self.dtype)
                updates = fused_attn_aggregate(
                    bsel, a, kt, kv, logits,
                    num_nodes, self.num_types,
                    interpret=self.pallas_interpret,
                )
            else:
                we_flat = jnp.transpose(we, (1, 0, 2)).reshape(
                    new_edge.shape[-1], self.num_types * self.node_feature_dim
                )
                updates = fused_typed_message_aggregate(
                    new_edge.astype(self.dtype), a, kt, kv,
                    we_flat, jnp.asarray(ak, self.dtype),
                    num_nodes, self.num_types,
                    interpret=self.pallas_interpret,
                )
            if self.update_type == "mlp":
                flat = updates.reshape(num_nodes, -1)
                out = nn.relu(
                    nn.Dense(self.node_feature_dim, dtype=self.dtype, name="update_mlp")(flat)
                )
            else:
                out = HierarchUpdateMlp(
                    self.node_feature_dim, self.num_types, dtype=self.dtype,
                    name="update_mlp",
                )(updates)
            return out, new_edge

        # per-source-type message MLP (reference TypeAwareNodeUpdate); the
        # split form computes the target-node contraction once per
        # (node, type) instead of per edge
        m = TypeAwareSplitLinear(
            self.num_types, self.node_feature_dim,
            raw_blocks=self.raw_types,
            block_slots=self.nodes_per_type * self.blocked_c,
            dtype=self.dtype, name="mlp_node",
        )(x, i, new_edge, src_type,
          rev_perm=pre.get("rev_perm"), sum_map=pre.get("type_sum_map"))
        m = nn.relu(m)

        if self.aggr_sub in ("node_edge_attn", "node_edge_attn_per_type"):
            heads = 1 if self.aggr_sub == "node_edge_attn" else self.num_types
            scores = nn.Dense(heads, dtype=self.dtype, name="attn_net")(new_edge)
            if heads == 1:
                per_edge_score = scores[:, 0]
            else:
                per_edge_score = jnp.take_along_axis(scores, src_type[:, None], axis=1)[:, 0]
            if self.blocked_c:
                updates = blocked_per_type_attention_aggregate(
                    m, per_edge_score, src_type, num_nodes, self.num_types, edge_valid
                )
            else:
                updates = per_type_attention_aggregate(
                    m, per_edge_score, i, src_type, num_nodes, self.num_types, edge_valid
                )
        else:
            if self.blocked_c:
                updates = blocked_per_type_aggregate(
                    m, src_type, num_nodes, self.num_types, self.aggr, edge_valid
                )
            else:
                updates = per_type_aggregate(
                    m, i, src_type, num_nodes, self.num_types, self.aggr, edge_valid
                )

        if self.update_type == "mlp":
            flat = updates.reshape(num_nodes, -1)
            out = nn.relu(
                nn.Dense(self.node_feature_dim, dtype=self.dtype, name="update_mlp")(flat)
            )
        elif self.update_type == "hierarch_mlp":
            out = HierarchUpdateMlp(
                self.node_feature_dim, self.num_types, dtype=self.dtype, name="update_mlp"
            )(updates)
        else:
            raise NotImplementedError(self.update_type)

        return out, new_edge


class _TypedParams(nn.Module):
    """Raw parameter holder matching TypeAwareSplitLinear's scope layout, so
    the fused-kernel path shares checkpoints with the jnp path."""

    num_types: int
    din: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (self.num_types, self.din, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.num_types, self.features))
        return kernel, bias


class _DenseParams(nn.Module):
    """Raw Dense parameters under the same scope layout as nn.Dense."""

    din: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.din, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def fused_tile_ok(num_nodes: int, c: int, num_types: int, node_tile: int = 8) -> bool:
    nb = node_tile
    while nb > 0:
        if num_nodes % nb == 0 and (nb * num_types) % 8 == 0 and (nb * c) % 8 == 0:
            return True
        nb -= 1
    return False
