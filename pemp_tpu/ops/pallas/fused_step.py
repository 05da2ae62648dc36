"""Pallas TPU kernel: one FULLY-fused flagship MPN step.

Extends ops.pallas.fused_typed_message (typed message + attention
aggregation) upward through the whole per-step edge pipeline, so one kernel
per step replaces the XLA-side chain

    x_j gather -> edge-MLP stage-1 sum + relu -> edge-MLP stage-2 + relu
    -> [fused typed message kernel]

whose E-sized HBM round trips dominate the MPN outside the kernel
(~0.8ms/step for the (E, 64) bf16 x_j row gather alone at flagship shapes —
small-row gathers run at ~70GB/s, an order below HBM peak). In-kernel the
gather becomes a one-hot MXU contraction against the per-image node
projection table (~28M MACs/tile ≈ sub-microsecond), and the edge-MLP dots
ride the same VMEM residency as the typed projection.

Streaming per step: q (E,H) loop-invariant edge part, cur (E,Dc) edge carry,
per-node tables p/h_node/a, and the (E,1) index/type/valid columns; out:
updates (N,T,D) and the new edge carry (E,De). Everything else never leaves
VMEM.

The source gather is exact (not approximate): source indices are always
in-range within their image (ops.knn.knn_edges_target_major clips), so the
one-hot contraction reproduces ``p[src]`` bit-for-bit, including on invalid
slots.

reference semantics: src/Models/MessagePassingNetwork/layers.py:157-258
(TypeAwareMPNLayer with agnostic edge MLP + node_edge_attn aggregation);
this kernel is its whole step body minus embeddings/update-MLP/heads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pemp_tpu.ops.pallas.fused_typed_message import (
    _pick_tile,
    _tile_forward,
    env_int,
)


def _step_kernel(p_ref, hn_ref, q_ref, cur_ref, a_ref, src_ref, types_ref,
                 valid_ref, wcur_ref, we1_ref, be1_ref, wet_ref, wa_ref,
                 ne_ref, out_ref, *, nb, c, t, d, h, sub, n_img):
    nbc = nb * c
    nbt = nb * t
    p = p_ref[:]                                     # (n_img, H)
    # everything below runs per nb-sized sub-tile: a group-level (gc, n_img)
    # one-hot (plus its i32 iota) blows the 16MB scoped-VMEM stack at sub=5
    # (26.08M measured), and Mosaic's stack allocator SUMS across an
    # unrolled python loop (23.16M measured even with nb-sized chunks) — so
    # the sub loop must be a lax.fori_loop, whose iterations share one set
    # of temporaries, while the grid still shrinks by `sub` (the p block is
    # fetched once per group)
    def _sub_body(s, carry):
        nc, nt = s * nbc, s * nbt
        src = src_ref[pl.ds(nc, nbc)]                # (nbc, 1) i32
        # one-hot source gather: G[s, n] = (src[s] == n); exact vs p[src]
        n_iota = jax.lax.broadcasted_iota(jnp.int32, (nbc, n_img), 1)
        g1h = (src == n_iota).astype(p.dtype)        # (nbc, n_img)
        p_sel = jax.lax.dot_general(
            g1h, p, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (nbc, H)
        # target-node broadcast: U[s, m] = (s // c == m), m over tile nodes
        u_row = jax.lax.broadcasted_iota(jnp.int32, (nbc, nb), 0) // c
        u_col = jax.lax.broadcasted_iota(jnp.int32, (nbc, nb), 1)
        u = (u_row == u_col).astype(p.dtype)
        hn_sel = jax.lax.dot_general(
            u, hn_ref[pl.ds(s * nb, nb)].astype(p.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (nbc, H)
        cur_h = jax.lax.dot_general(
            cur_ref[pl.ds(nc, nbc)], wcur_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (nbc, H)
        hh = jax.nn.relu(
            p_sel + hn_sel + cur_h
            + q_ref[pl.ds(nc, nbc)].astype(jnp.float32)
        ).astype(cur_ref.dtype)
        ef = jax.nn.relu(
            jax.lax.dot_general(
                hh, we1_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + be1_ref[:].astype(jnp.float32)
        ).astype(ne_ref.dtype)                       # (nbc, De)
        ne_ref[pl.ds(nc, nbc)] = ef

        out = _tile_forward(
            ef,
            a_ref[pl.ds(nt, nbt)],
            types_ref[pl.ds(nc, nbc)],
            valid_ref[pl.ds(nc, nbc)],
            wet_ref, wa_ref, nb=nb, c=c, t=t, d=d,
        )[4]
        out_ref[pl.ds(nt, nbt)] = out.astype(out_ref.dtype)
        return carry

    if sub == 1:
        _sub_body(0, 0)
    elif env_int("PEMP_STEP_SUB_UNROLL", 0):
        # unrolled variant: static slices let Mosaic software-pipeline the
        # sub-tiles, but its stack allocator SUMS the iterations' temporaries
        # (23.2MB at sub=5) — needs the raised vmem_limit_bytes
        for s in range(sub):
            _sub_body(s, 0)
    else:
        jax.lax.fori_loop(0, sub, _sub_body, 0)


def _pick_sub(n_img: int, nb: int, want: int) -> int:
    sub = max(1, want)
    while sub > 1 and (n_img % (nb * sub)):
        sub -= 1
    return sub


def step_reference(p, h_node, q, cur, a, src_local, types, valid,
                   w_cur, w_e1, b_e1, we, w_attn,
                   num_nodes, num_types, n_img):
    """jnp reference of the fused step (tests + VJP fallback).

    Mirrors the jnp blocked path's math: bf16 dots with f32 accumulation is
    NOT reproduced (XLA dots accumulate f32 anyway for bf16 inputs), so
    outputs match the kernel to bf16 rounding.
    """
    e = cur.shape[0]
    c = e // num_nodes
    d = a.shape[-1]
    src = src_local.reshape(-1).astype(jnp.int32)
    img_base = (jnp.arange(e, dtype=jnp.int32) // (n_img * c)) * n_img
    p_sel = p[img_base + src]
    hn_sel = jnp.repeat(h_node, c, axis=0)
    hh = jax.nn.relu(
        (
            p_sel.astype(jnp.float32)
            + hn_sel.astype(jnp.float32)
            + cur.astype(jnp.float32) @ w_cur.astype(jnp.float32)
            + q.astype(jnp.float32)
        )
    ).astype(cur.dtype)
    ef = jax.nn.relu(
        hh.astype(jnp.float32) @ w_e1.astype(jnp.float32)
        + b_e1.reshape(-1).astype(jnp.float32)
    ).astype(cur.dtype)

    tv = types.reshape(-1).astype(jnp.int32)
    vv = valid.reshape(-1).astype(jnp.float32)
    # typed projection + selection
    wet = we.reshape(ef.shape[-1], num_types, d)
    b_all = jnp.einsum(
        "ei,itd->etd", ef.astype(jnp.float32), wet.astype(jnp.float32)
    )
    b_sel = jnp.take_along_axis(b_all, tv[:, None, None], axis=1)[:, 0]
    node_of_edge = jnp.arange(e, dtype=jnp.int32) // c
    a_flat = a.reshape(num_nodes * num_types, d).astype(jnp.float32)
    a_sel = a_flat[node_of_edge * num_types + tv]
    m = jax.nn.relu(a_sel + b_sel)
    logits = (ef.astype(jnp.float32) @ w_attn.astype(jnp.float32))[:, 0]
    # per-(node, type) softmax over each node's C slots
    lg = logits.reshape(num_nodes, c)
    tg = tv.reshape(num_nodes, c)
    vg = vv.reshape(num_nodes, c)
    hot = (tg[:, :, None] == jnp.arange(num_types)[None, None, :]) & (
        vg[:, :, None] > 0
    )                                                # (N, C, T)
    neg = jnp.float32(-1e30)
    sc = jnp.where(hot, lg[:, :, None], neg)
    mx = jnp.max(sc, axis=1, keepdims=True)
    mx = jnp.where(mx <= neg / 2, 0.0, mx)
    ex = jnp.where(hot, jnp.exp(sc - mx), 0.0)
    den = jnp.maximum(ex.sum(axis=1), 1e-16)         # (N, T)
    mm = m.reshape(num_nodes, c, d)
    num = jnp.einsum("nct,ncd->ntd", ex, mm)
    out = num / den[:, :, None]
    return out.astype(jnp.float32), ef


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def _step_vjp(p, h_node, q, cur, a, src_local, types, valid,
              w_cur, w_e1, b_e1, we, w_attn,
              num_nodes, num_types, n_img, node_tile, interpret):
    return _step_forward(p, h_node, q, cur, a, src_local, types, valid,
                         w_cur, w_e1, b_e1, we, w_attn,
                         num_nodes, num_types, n_img, node_tile, interpret)


def _step_fwd_rule(p, h_node, q, cur, a, src_local, types, valid,
                   w_cur, w_e1, b_e1, we, w_attn,
                   num_nodes, num_types, n_img, node_tile, interpret):
    out = _step_forward(p, h_node, q, cur, a, src_local, types, valid,
                        w_cur, w_e1, b_e1, we, w_attn,
                        num_nodes, num_types, n_img, node_tile, interpret)
    return out, (p, h_node, q, cur, a, src_local, types, valid,
                 w_cur, w_e1, b_e1, we, w_attn)


def _step_bwd_rule(num_nodes, num_types, n_img, node_tile, interpret, res, g):
    """Backward = jax.vjp of the jnp reference (the fused-step path targets
    eval; training keeps the per-op path whose backward Pallas kernel is
    already tuned — this rule exists so an accidental grad is correct, not
    fast)."""
    (p, h_node, q, cur, a, src_local, types, valid,
     w_cur, w_e1, b_e1, we, w_attn) = res

    def f(p_, hn_, q_, cur_, a_, wc_, w1_, b1_, we_, wa_):
        return step_reference(p_, hn_, q_, cur_, a_, src_local, types, valid,
                              wc_, w1_, b1_, we_, wa_,
                              num_nodes, num_types, n_img)

    _, vjp = jax.vjp(f, p, h_node, q, cur, a, w_cur, w_e1, b_e1, we, w_attn)
    dp, dhn, dq, dcur, da, dwc, dw1, db1, dwe, dwa = vjp(g)
    import numpy as np

    zi = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
    return (dp, dhn, dq, dcur, da, zi(src_local), zi(types), zi(valid),
            dwc, dw1, db1, dwe, dwa)


_step_vjp.defvjp(_step_fwd_rule, _step_bwd_rule)


def _step_forward(p, h_node, q, cur, a, src_local, types, valid,
                  w_cur, w_e1, b_e1, we, w_attn,
                  num_nodes, num_types, n_img, node_tile, interpret):
    e, dc = cur.shape
    c = e // num_nodes
    d = a.shape[-1]
    h = q.shape[-1]
    de = w_e1.shape[-1]
    nb = _pick_tile(num_nodes, c, num_types, node_tile)

    # default sub=1: packing more sub-tiles per grid step (sub must divide
    # n_img/nb, i.e. 5/17/85 at flagship shapes) currently triggers a
    # pathological Mosaic compile (>45 min vs seconds at sub=1) — same cliff
    # ROADMAP recorded for nb=16. Keep the knob for when Mosaic improves.
    sub = _pick_sub(n_img, nb, env_int("PEMP_STEP_SUB", 1))
    grid = (num_nodes // (nb * sub),)
    tiles_per_img = n_img // (nb * sub)

    col = functools.partial(_as_col, rows=e)
    ne, out = pl.pallas_call(
        functools.partial(
            _step_kernel, nb=nb, c=c, t=num_types, d=d, h=h, sub=sub,
            n_img=n_img,
        ),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # sub>1 needs ~18.5-24MB of scoped VMEM (sub-loop body + block
            # windows); the 16MB default rejects it while the chip has
            # 128MB. Only raised when needed: a blanket 64MB reservation
            # measured 2.4 img/s SLOWER at sub=1 (it eats into the VMEM the
            # scheduler uses to overlap neighbouring ops).
            vmem_limit_bytes=(64 * 1024 * 1024 if sub > 1 else None),
        ),
        in_specs=[
            pl.BlockSpec((n_img, h), lambda i: (i // tiles_per_img, 0),
                         memory_space=pltpu.VMEM),                     # p
            pl.BlockSpec((sub * nb, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                     # h_node
            pl.BlockSpec((sub * nb * c, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                     # q
            pl.BlockSpec((sub * nb * c, dc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                     # cur
            pl.BlockSpec((sub * nb * num_types, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                     # a
            pl.BlockSpec((sub * nb * c, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                     # src
            pl.BlockSpec((sub * nb * c, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                     # types
            pl.BlockSpec((sub * nb * c, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                     # valid
            pl.BlockSpec((dc, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, de), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, de), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((de, num_types * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((de, w_attn.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((sub * nb * c, de), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub * nb * num_types, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((e, de), cur.dtype),
            jax.ShapeDtypeStruct((num_nodes * num_types, d), jnp.float32),
        ],
        interpret=interpret,
    )(
        p,
        h_node,
        q,
        cur,
        a.reshape(num_nodes * num_types, d),
        col(src_local),
        col(types),
        col(valid),
        w_cur,
        w_e1,
        b_e1.reshape(1, de),
        we,
        w_attn,
    )
    return out.reshape(num_nodes, num_types, d), ne


def _as_col(x, rows):
    if x.ndim == 2 and x.dtype == jnp.int32:
        return x
    return x.astype(jnp.int32).reshape(rows, 1)


def fused_mpn_step(
    p,           # (N, H) per-node source projection (x @ Wj), gathered by src
    h_node,      # (N, H) per-node target projection incl. stage-1 bias
    q,           # (E, H) loop-invariant edge part (init_edges @ We_init)
    cur,         # (E, Dc) current edge carry
    a,           # (N, T, D) typed node part incl. per-type bias
    src_local,   # (E,) or (E,1) i32: source node index WITHIN its image
    types,       # (E,) or (E,1) i32 source (summary) type
    valid,       # (E,) or (E,1) slot validity
    w_cur,       # (Dc, H) stage-1 weight for the current edge half
    w_e1,        # (H, De) stage-2 edge weight
    b_e1,        # (De,) stage-2 bias
    we,          # (De, T*D) flattened per-type message weights
    w_attn,      # (De, heads) attention projection (head 0 used)
    num_nodes: int,
    num_types: int,
    nodes_per_image: int,
    node_tile: int | None = None,
    interpret: bool = False,
):
    """Fused MPN step: returns (updates (N, T, D) f32, new_edge (E, De)).

    Computes, per edge slot s with target n = s // C and source j = src[s]:

        h[s]  = relu(p[j] + h_node[n] + q[s] + cur[s] @ w_cur)
        ef[s] = relu(h[s] @ w_e1 + b_e1)              # the new edge carry
        m[s]  = relu(a[n, t_s] + ef[s] @ we[:, t_s])
        out[n, t] = softmax-weighted sum of m over n's valid type-t slots
                    (weights = ef @ w_attn, per-(n, t) softmax)

    ``PEMP_STEP_SUB`` (default 1, trace-time read like PEMP_NODE_TILE)
    sets how many node sub-tiles share one grid step; nb*sub must divide
    ``nodes_per_image`` so a grid step never straddles two images. Values
    >1 currently hit a pathological Mosaic compile (>45 min) at flagship
    shapes.
    Differentiable via a jnp-recompute VJP (eval is the target; training
    uses the per-op path).
    """
    if node_tile is None:
        node_tile = env_int("PEMP_NODE_TILE", 8)
    return _step_vjp(p, h_node, q, cur, a, src_local, types, valid,
                     w_cur, w_e1, b_e1, we, w_attn,
                     num_nodes, num_types, nodes_per_image, node_tile,
                     interpret)
