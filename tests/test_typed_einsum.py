"""Tests for the zero-waste typed message projection path.

Covers: symmetric truncation in knn_edges_target_major, the reverse-edge
involution (ops.knn.reverse_edge_perm), TypeAwareSplitLinear's blocked
einsum projection vs the all-types dots path, and flagship-model output
equality between MSG_PASS settings.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pemp_tpu.ops.knn import knn_edges_target_major, reverse_edge_perm


def _blocked_graph(rng, num_types=5, k_per_type=4, k=6, cap_in=None):
    n = num_types * k_per_type
    pos = rng.rand(n, 2).astype(np.float32) * 50
    valid = rng.rand(n) > 0.2
    ei, ev = knn_edges_target_major(
        jnp.asarray(pos), jnp.asarray(valid), k,
        cap_in=cap_in, symmetric=True,
    )
    return np.asarray(ei), np.asarray(ev), n


def test_symmetric_layout_edge_set_is_symmetric():
    rng = np.random.RandomState(0)
    for cap in (2, 3, None):  # small caps force truncation
        ei, ev, _ = _blocked_graph(rng, cap_in=cap)
        edges = {(int(s), int(d)) for s, d in zip(ei[0][ev], ei[1][ev])}
        rev = {(d, s) for s, d in edges}
        assert edges == rev, cap


def test_symmetric_matches_asymmetric_when_cap_never_binds():
    rng = np.random.RandomState(1)
    n, k = 30, 5
    pos = rng.rand(n, 2).astype(np.float32) * 50
    valid = rng.rand(n) > 0.2
    a = knn_edges_target_major(
        jnp.asarray(pos), jnp.asarray(valid), k, cap_in=n, symmetric=False
    )
    b = knn_edges_target_major(
        jnp.asarray(pos), jnp.asarray(valid), k, cap_in=n, symmetric=True
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_reverse_edge_perm_is_involution_with_swapped_endpoints():
    rng = np.random.RandomState(2)
    for cap in (2, None):
        ei, ev, n = _blocked_graph(rng, cap_in=cap)
        c = ei.shape[1] // n
        r = np.asarray(reverse_edge_perm(
            jnp.asarray(ei[0]), jnp.asarray(ev), n, c
        ))
        e_idx = np.nonzero(ev)[0]
        assert len(e_idx) > 0
        # reverse slots are valid, swap endpoints, and R is an involution
        assert ev[r[e_idx]].all()
        np.testing.assert_array_equal(ei[0][r[e_idx]], ei[1][e_idx])
        np.testing.assert_array_equal(ei[1][r[e_idx]], ei[0][e_idx])
        np.testing.assert_array_equal(r[r[e_idx]], e_idx)


def test_split_linear_einsum_path_matches_dots_path():
    from pemp_tpu.models.mpn.layers import TypeAwareSplitLinear

    rng = np.random.RandomState(3)
    num_types, kpt, k = 6, 4, 5
    ei, ev, n = _blocked_graph(rng, num_types=num_types, k_per_type=kpt, k=k,
                               cap_in=3)
    c = ei.shape[1] // n
    e = ei.shape[1]
    x = rng.randn(n, 8).astype(np.float32)
    ef = rng.randn(e, 7).astype(np.float32)
    types = (np.arange(n) // kpt).astype(np.int32)
    src_type = types[ei[0]]
    rp = reverse_edge_perm(jnp.asarray(ei[0]), jnp.asarray(ev), n, c)

    mod = TypeAwareSplitLinear(num_types, 9, raw_blocks=num_types,
                               block_slots=kpt * c)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      jnp.asarray(ei[1]), jnp.asarray(ef),
                      jnp.asarray(src_type))
    base = mod.apply(params, jnp.asarray(x), jnp.asarray(ei[1]),
                     jnp.asarray(ef), jnp.asarray(src_type))
    fast = mod.apply(params, jnp.asarray(x), jnp.asarray(ei[1]),
                     jnp.asarray(ef), jnp.asarray(src_type), rev_perm=rp)
    np.testing.assert_allclose(
        np.asarray(fast)[ev], np.asarray(base)[ev], rtol=1e-5, atol=1e-5
    )


def test_split_linear_einsum_path_with_summary_map():
    """per_body_part summary: summary types select weights; blocked grouping
    stays in raw-type space via sum_map."""
    from pemp_tpu.models.mpn.layers import TypeAwareSplitLinear

    rng = np.random.RandomState(4)
    raw, kpt, k = 6, 3, 4
    ei, ev, n = _blocked_graph(rng, num_types=raw, k_per_type=kpt, k=k,
                               cap_in=2)
    c = ei.shape[1] // n
    e = ei.shape[1]
    sum_map = np.array([0, 0, 1, 1, 2, 2], np.int32)  # raw -> 3 summaries
    x = rng.randn(n, 5).astype(np.float32)
    ef = rng.randn(e, 4).astype(np.float32)
    raw_types = (np.arange(n) // kpt).astype(np.int32)
    src_sum = sum_map[raw_types[ei[0]]]
    rp = reverse_edge_perm(jnp.asarray(ei[0]), jnp.asarray(ev), n, c)

    mod = TypeAwareSplitLinear(3, 6, raw_blocks=raw, block_slots=kpt * c)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x),
                      jnp.asarray(ei[1]), jnp.asarray(ef),
                      jnp.asarray(src_sum))
    base = mod.apply(params, jnp.asarray(x), jnp.asarray(ei[1]),
                     jnp.asarray(ef), jnp.asarray(src_sum))
    fast = mod.apply(params, jnp.asarray(x), jnp.asarray(ei[1]),
                     jnp.asarray(ef), jnp.asarray(src_sum),
                     rev_perm=rp, sum_map=jnp.asarray(sum_map))
    np.testing.assert_allclose(
        np.asarray(fast)[ev], np.asarray(base)[ev], rtol=1e-5, atol=1e-5
    )


def test_slim_attn_kernel_grad_matches_jnp():
    """Custom VJP of the slim aggregation kernel (hybrid path) vs autodiff
    of an equivalent jnp formulation, in interpret mode."""
    from pemp_tpu.ops.pallas.fused_typed_message import fused_attn_aggregate

    rng = np.random.RandomState(9)
    n, c, t, d = 16, 8, 4, 8
    e = n * c
    b = jnp.asarray(rng.randn(e, d), jnp.float32)
    a = jnp.asarray(rng.randn(n, t, d), jnp.float32)
    types = jnp.asarray(rng.randint(0, t, e), jnp.int32)
    valid = jnp.asarray(rng.rand(e) > 0.2)
    logits = jnp.asarray(rng.randn(e), jnp.float32)

    def jnp_ref(b_, a_, l_):
        dst = jnp.repeat(jnp.arange(n), c)
        a_sel = a_.reshape(n * t, d)[dst * t + types]
        m = jax.nn.relu(a_sel + b_)
        from pemp_tpu.ops.segment import blocked_per_type_attention_aggregate

        # weight by softmax within (node, type) groups over valid slots
        return blocked_per_type_attention_aggregate(
            m, l_, types, n, t, valid
        )

    def kern(b_, a_, l_):
        return fused_attn_aggregate(
            b_, a_, types, valid, l_, n, t, interpret=True
        )

    out_ref = jnp_ref(b, a, logits)
    out_k = kern(b, a, logits)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )

    def loss_ref(args):
        return jnp.sum(jnp_ref(*args) ** 2)

    def loss_k(args):
        return jnp.sum(kern(*args) ** 2)

    g_ref = jax.grad(loss_ref)((b, a, logits))
    g_k = jax.grad(loss_k)((b, a, logits))
    for gr, gk, name in zip(g_ref, g_k, ("db", "da", "dlogit")):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_flagship_msg_pass_einsum_matches_dots():
    """Full flagship MPN forward: MSG_PASS=einsum output == dots output."""
    from pemp_tpu.config import get_config, update_config
    from pemp_tpu.graph.constructor import GCConfig, construct_graph_batch
    from pemp_tpu.models.mpn.models import get_mpn_model, mpn_cfg_from_config

    cfg = get_config()
    cfg = update_config(
        cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml"
    )
    cfg.defrost()
    cfg.MODEL.MPN.STEPS = 2
    cfg.TPU.NODES_PER_TYPE = 3
    cfg.TPU.KNN_K = 8
    cfg.TPU.KNN_CAP_IN = 4
    cfg.freeze()

    rng = np.random.RandomState(5)
    gc = GCConfig.from_config(cfg)
    assert gc.knn_symmetric  # default MSG_PASS=einsum forces it
    sm = rng.rand(1, 32, 32, 17).astype(np.float32) * 0.5
    feats = rng.randn(1, 32, 32, 128).astype(np.float32)
    tags = rng.randn(1, 32, 32, 17).astype(np.float32)
    gb = construct_graph_batch(gc, jnp.asarray(sm), jnp.asarray(feats),
                               jnp.asarray(tags), testing=True)

    outs = {}
    for mode in ("dots", "einsum", "hybrid"):
        mpn_cfg = mpn_cfg_from_config(cfg.MODEL.MPN)
        n_nodes = gc.num_joints * gc.nodes_per_type
        k_eff = min(gc.knn_k, max(n_nodes - 1, 1))
        mpn_cfg["_BLOCKED_C"] = k_eff + gc.knn_cap_in
        mpn_cfg["_NODES_PER_TYPE"] = gc.nodes_per_type
        mpn_cfg["_COLLECT_AUX"] = False
        if mode == "einsum":
            mpn_cfg["_TYPED_EINSUM"] = True
        elif mode == "hybrid":
            # rev-perm einsum projection + slim aggregation kernel
            # (interpret mode: runs the Pallas kernel on CPU)
            mpn_cfg["_TYPED_EINSUM"] = True
            mpn_cfg["_USE_PALLAS"] = True
            mpn_cfg["_PALLAS_INTERPRET"] = True
        model = get_mpn_model(mpn_cfg)
        variables = model.init(
            jax.random.PRNGKey(7), gb.x, gb.edge_attr, gb.edge_index,
            node_types=gb.joint_det[:, 2], node_valid=gb.node_valid,
            edge_valid=gb.edge_valid, joint_tags=gb.joint_tags,
        )
        outs[mode] = model.apply(
            variables, gb.x, gb.edge_attr, gb.edge_index,
            node_types=gb.joint_det[:, 2], node_valid=gb.node_valid,
            edge_valid=gb.edge_valid, joint_tags=gb.joint_tags,
        )

    ev = np.asarray(gb.edge_valid)
    nv = np.asarray(gb.node_valid)
    for mode in ("einsum", "hybrid"):
        np.testing.assert_allclose(
            np.asarray(outs[mode]["edge"][-1])[ev],
            np.asarray(outs["dots"]["edge"][-1])[ev],
            rtol=2e-4, atol=2e-4, err_msg=mode,
        )
        np.testing.assert_allclose(
            np.asarray(outs[mode]["node"][-1])[nv],
            np.asarray(outs["dots"]["node"][-1])[nv],
            rtol=2e-4, atol=2e-4, err_msg=mode,
        )
        np.testing.assert_allclose(
            np.asarray(outs[mode]["class"][-1])[nv],
            np.asarray(outs["dots"]["class"][-1])[nv],
            rtol=2e-4, atol=2e-4, err_msg=mode,
        )
