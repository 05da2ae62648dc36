"""Pallas TPU kernel: fused typed message + attention aggregation.

Fuses the flagship MPN step's tail — per-type edge-part contraction,
(target, source-type) selection, ReLU, per-(node, type) attention softmax and
weighted aggregation — into one VMEM-resident kernel per node tile:

    B_t     = edge_feats @ We[:, t]                  # accumulated per type
    m[s]    = relu(a[n_s, t_s] + B_{t_s}[s])         # typed message per slot
    attn[s] = edge_feats[s] @ w_attn
    S[r, s] = softmax over slots s of node(r) with type(r) (masked)
    out     = S @ m                                  # (nb*T, D)

The jnp path writes/reads an (E, T, D) tensor in HBM for the type selection
(~1 GB per step at flagship shapes); here only edge features stream in and
(N, T, D) updates stream out. Everything inside the kernel is rank-2
(mosaic has no >2D gather/reshape); selections are one-hot contractions on
the MXU.

Inputs are target-major blocked (ops.knn.knn_edges_target_major).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def env_int(name: str, default: int) -> int:
    """Trace-time integer env knob; malformed values fall back to default."""
    import os

    try:
        return int(os.environ.get(name, default))
    except (TypeError, ValueError):
        return default


def _sel_ok_masks(types, *, nb, c, t):
    """Build the slot->row selection mask ``sel`` (nbc, nbt) and its
    transpose ``ok`` (nbt, nbc) — sel[s, r] = 1 iff slot s belongs to row
    r's node AND has row r's type — WITHOUT materializing full-size
    (nbc, nbt) i32 iotas.

    Rows r = n*T + t factor into (node, type), so both masks are products
    of a static node-block factor and a data-dependent type factor, each
    expressible as a small one-hot matmul: the only (nbc, nbt)-sized
    arrays ever live are the two f32 factors and their product. The naive
    iota formulation materializes 4-5 (nbc, nbt)/(nbt, nbc) i32 arrays,
    which is what pushed the node_tile=16 VMEM stack peak to ~22MB.
    """
    nbc = nb * c
    nbt = nb * t
    # hot[s, t'] = (types[s] == t')  — (nbc, T), small
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (nbc, t), 1)
    hot_f = (types == t_iota).astype(jnp.float32)
    # U[s, n] = (s // c == n) — (nbc, nb), small static
    u_row = jax.lax.broadcasted_iota(jnp.int32, (nbc, nb), 0) // c
    u_col = jax.lax.broadcasted_iota(jnp.int32, (nbc, nb), 1)
    u = (u_row == u_col).astype(jnp.float32)
    # E1[n, r] = (r // T == n); E2[t', r] = (r % T == t') — static, tiny
    e1_row = jax.lax.broadcasted_iota(jnp.int32, (nb, nbt), 0)
    e1_col = jax.lax.broadcasted_iota(jnp.int32, (nb, nbt), 1) // t
    e1 = (e1_row == e1_col).astype(jnp.float32)
    e2_row = jax.lax.broadcasted_iota(jnp.int32, (t, nbt), 0)
    e2_col = jax.lax.broadcasted_iota(jnp.int32, (t, nbt), 1) % t
    e2 = (e2_row == e2_col).astype(jnp.float32)

    def _mm(x, y, contract):
        return jax.lax.dot_general(
            x, y, dimension_numbers=((contract), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # sel = (node match) * (type match): two (nbc, nbt) f32 factors
    sel = _mm(u, e1, ((1,), (0,))) * _mm(hot_f, e2, ((1,), (0,)))
    # ok = sel^T, built from the transposed factors (no big-identity dot)
    ok = _mm(e1, u, ((0,), (1,))) * _mm(e2, hot_f, ((0,), (1,)))
    return hot_f, sel, ok


def _tile_forward(ef, a_in, types, valid, we_ref, wa_ref,
                  *, nb, c, t, d):
    """Shared per-tile math with a *factored* softmax: exp is taken per slot
    against that slot's own (node, type)-row max (the softmax groups
    partition the slots, so a per-slot shift keeps the factorisation exact
    and each row numerically safe), and the per-(node,type) normalisation
    happens after one fused numerator+denominator matmul.

    Returns (ef, m, e_col, den, out, ok_f, hot_f, pre).
    """
    nbc = nb * c
    nbt = nb * t
    # ef (nbc, De); types/valid (nbc, 1) int32 — values, pre-sliced by the
    # caller so one grid step can process several nb-sized sub-tiles
    # the one-hot selection matmul keeps the input's precision: with bf16
    # inputs (the model path) the 0/1 selection runs at 4x the f32 MXU rate
    # and is exact w.r.t. the bf16 values; f32 inputs keep the f32 dot
    sel_dt = jnp.bfloat16 if a_in.dtype == jnp.bfloat16 else jnp.float32
    a = a_in.astype(sel_dt)               # (nbt, D)

    hot_f, sel, ok_f = _sel_ok_masks(types, nb=nb, c=c, t=t)

    # typed edge-part projection in CHUNKS of types: each chunk is one wide
    # MXU matmul + per-type VPU selection. Chunking bounds the live (nbc,
    # chunk*D) intermediate so bigger node tiles fit the 16MB scoped-VMEM
    # stack (a full (nbc, T*D) b_all at nb=16 alone needs 5.6MB and the tile
    # OOMs at 22MB); FLOPs are unchanged.
    b_sel = jnp.zeros((nbc, d), jnp.float32)
    tc = max(1, min(t, (2 * 1024 * 1024) // max(nbc * d * 4, 1)))
    for t0 in range(0, t, tc):
        t1 = min(t0 + tc, t)
        b_chunk = jax.lax.dot_general(
            ef, we_ref[:, t0 * d:t1 * d],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                  # (nbc, (t1-t0)*D)
        for ti in range(t0, t1):
            b_sel = b_sel + hot_f[:, ti:ti + 1] * b_chunk[
                :, (ti - t0) * d:(ti - t0 + 1) * d
            ]

    a_sel = jax.lax.dot_general(
        sel.astype(sel_dt), a,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (nbc, D)

    pre = a_sel + b_sel
    m = jax.nn.relu(pre)                   # (nbc, D)

    attn_row = jax.lax.dot_general(
        wa_ref[:], ef,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (heads, nbc)
    # MXU-transpose (1, nbc) -> (nbc, 1)
    attn_col = jax.lax.dot_general(
        attn_row[:1], jnp.ones((1, 1), jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (nbc, 1)
    valid_f = valid.astype(jnp.float32)    # (nbc, 1)
    attn_m = attn_col + (1.0 - valid_f) * _NEG
    # ok_f (nbt, nbc) built by _sel_ok_masks; validity lives in e_col

    # per-(node, type)-row max shift: the softmax groups PARTITION the slots
    # (each slot has one node and one type), so scattering each row's max
    # back to its slots gives a per-slot shift that keeps the single fused
    # numerator+denominator matmul exact — and, unlike a tile-level max,
    # stays robust to arbitrary logit spread across rows (a row whose own
    # max sits far below the tile max would otherwise underflow to den=0)
    valid_row = jax.lax.dot_general(
        jnp.ones((1, 1), jnp.float32), valid_f,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (1, nbc) MXU-transpose of valid_f
    masked = ok_f * valid_row              # (nbt, nbc)
    scores = masked * attn_row[:1] + (1.0 - masked) * _NEG
    row_max = jnp.max(scores, axis=1, keepdims=True)       # (nbt, 1)
    row_max = jnp.where(row_max <= _NEG / 2, 0.0, row_max)
    shift_col = jax.lax.dot_general(
        ok_f, row_max, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (nbc, 1): each slot's row max
    e_col = jnp.exp(attn_m - shift_col) * valid_f  # (nbc, 1)

    # fused numerator + denominator: one (nbt, nbc) @ (nbc, D+1) dot
    nd = jax.lax.dot_general(
        ok_f, jnp.concatenate([m * e_col, e_col], axis=1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (nbt, D+1)
    num, den = nd[:, :d], nd[:, d:d + 1]
    out = num / jnp.maximum(den, 1e-16)
    return ef, m, e_col, den, out, ok_f, hot_f, pre


def _kernel(ef_ref, a_ref, types_ref, valid_ref, we_ref, wa_ref, out_ref,
            *, nb, c, t, d, sub=1):
    # one grid step handles `sub` independent nb-node sub-tiles: amortizes
    # the fixed per-grid-step cost (the kernel is tile-overhead bound at
    # nb=8) while every intermediate keeps nb=8 shapes — bigger node tiles
    # (nb=16) blow up the Mosaic compile instead
    for s in range(sub):
        nc, nt = s * nb * c, s * nb * t
        out = _tile_forward(
            ef_ref[nc:nc + nb * c],
            a_ref[nt:nt + nb * t],
            types_ref[nc:nc + nb * c],
            valid_ref[nc:nc + nb * c],
            we_ref, wa_ref, nb=nb, c=c, t=t, d=d,
        )[4]
        out_ref[nt:nt + nb * t] = out.astype(out_ref.dtype)


def _bwd_kernel(ef_ref, a_ref, types_ref, valid_ref, we_ref, wa_ref, g_ref,
                def_ref, da_ref, dwe_ref, dwa_ref, *, nb, c, t, d):
    """Backward tile in the factored-softmax form (w[r,s] = ok·e_s/den_r):

        ghat    = g / den                    per-row scaled cotangent
        q       = <g, out> / den             per-row scalar
        [t1 t2] = ok^T [ghat q]              one fused matmul
        dm      = e * t1                     message cotangent
        dpre    = dm * 1[pre > 0]
        dlogit  = rowsum(dm * m) - e * t2    softmax backward
        da      = ok dpre
        dwe_t  += ef^T (dpre * hot_t)
        def     = sum_t hot_t * (dpre @ we_t^T) + dlogit * wa^T
        dwa    += ef^T dlogit
    """
    ef, m, e_col, den, out, ok_f, hot_f, pre = _tile_forward(
        ef_ref[:], a_ref[:], types_ref[:], valid_ref[:], we_ref, wa_ref,
        nb=nb, c=c, t=t, d=d,
    )
    g = g_ref[:].astype(jnp.float32)       # (nbt, D)
    deninv = 1.0 / jnp.maximum(den, 1e-16)  # (nbt, 1)
    ghat = g * deninv                       # (nbt, D)
    q = jnp.sum(g * out, axis=1, keepdims=True) * deninv   # (nbt, 1)

    tq = jax.lax.dot_general(
        ok_f, jnp.concatenate([ghat, q], axis=1),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (nbc, D+1)
    t1, t2 = tq[:, :d], tq[:, d:d + 1]
    dm = e_col * t1                         # (nbc, D)
    dpre = dm * (pre > 0).astype(jnp.float32)
    dlogit = jnp.sum(dm * m, axis=1, keepdims=True) - e_col * t2   # (nbc, 1)

    da = jax.lax.dot_general(
        ok_f, dpre, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (nbt, D)
    da_ref[:] = da.astype(da_ref.dtype)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwe_ref[:] = jnp.zeros(dwe_ref.shape, dwe_ref.dtype)
        dwa_ref[:] = jnp.zeros(dwa_ref.shape, dwa_ref.dtype)

    def_acc = jax.lax.dot_general(
        dlogit, wa_ref[:, 0:1],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (nbc, De)
    # block-expand dpre by type (VPU masking), then two wide MXU dots
    # replace the per-type dot loop: dwe += ef^T dpre_aug; def += dpre_aug we^T
    dpre_aug = jnp.concatenate(
        [dpre * hot_f[:, ti:ti + 1] for ti in range(t)], axis=1
    )                                      # (nbc, T*D)
    dwe_ref[:] += jax.lax.dot_general(
        ef, dpre_aug, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dwe_ref.dtype)
    def_acc = def_acc + jax.lax.dot_general(
        dpre_aug, we_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    def_ref[:] = def_acc.astype(def_ref.dtype)

    dwa = jax.lax.dot_general(
        ef, dlogit, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (De, 1)
    dwa_ref[:, 0:1] += dwa.astype(dwa_ref.dtype)


def _pick_tile(num_nodes, c, num_types, node_tile):
    nb = node_tile
    while num_nodes % nb or (nb * num_types) % 8 or (nb * c) % 8:
        nb -= 1
        if nb == 0:
            raise ValueError("no valid node tile for these shapes")
    return nb


def fused_typed_message_aggregate(
    edge_feats,   # (N*C, De) post-edge-MLP features
    a,            # (N, T, D) precomputed node-part incl. per-type bias
    types,        # (N*C,) source type per slot
    valid,        # (N*C,) slot validity
    we,           # (De, T*D) flattened per-type edge weights
    w_attn,       # (De, heads) attention projection (head 0 used)
    num_nodes: int,
    num_types: int,
    node_tile: int | None = None,
    interpret: bool = False,
):
    """Returns updates (N, T, D) float32. Differentiable (custom VJP with a
    backward Pallas kernel that recomputes residuals per tile).

    ``node_tile`` default 8 (override via PEMP_NODE_TILE for tuning): the
    kernel is per-tile-overhead bound (~6us/tile at nb=8, C=82 — only ~7.5%
    of MXU peak on the b_all matmul), so fewer, bigger tiles amortize it.

    Tuning env vars (PEMP_NODE_TILE, PEMP_TILE_SUB) are read at TRACE time:
    changing them after the first jit trace of a given shape has no effect
    (the cached trace wins) — restart the process or clear jax caches to
    re-tune. PEMP_TILE_SUB (default 1) packs that many independent nb-node
    sub-tiles into one grid step to amortize fixed per-grid-step cost; any
    value that doesn't divide the node count is decremented until it does,
    and outputs are bit-identical across sub values
    (tests/test_pallas_kernels.py::test_tile_sub_variants_match).
    """
    if node_tile is None:
        node_tile = env_int("PEMP_NODE_TILE", 8)
    return _fused_vjp(
        edge_feats, a, types, valid, we, w_attn,
        num_nodes, num_types, node_tile, interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused_vjp(edge_feats, a, types, valid, we, w_attn,
               num_nodes, num_types, node_tile, interpret):
    return _fused_forward(
        edge_feats, a, types, valid, we, w_attn,
        num_nodes, num_types, node_tile, interpret,
    )


def _fused_fwd_rule(edge_feats, a, types, valid, we, w_attn,
                    num_nodes, num_types, node_tile, interpret):
    out = _fused_forward(
        edge_feats, a, types, valid, we, w_attn,
        num_nodes, num_types, node_tile, interpret,
    )
    return out, (edge_feats, a, types, valid, we, w_attn)


def _fused_bwd_rule(num_nodes, num_types, node_tile, interpret, res, g):
    edge_feats, a, types, valid, we, w_attn = res
    e, de = edge_feats.shape
    c = e // num_nodes
    d = a.shape[-1]
    # the backward tile materializes dpre_aug (nbc, T*D) — keep it at the
    # VMEM-safe nb=8 even when the forward runs bigger tiles
    nb = _pick_tile(num_nodes, c, num_types, min(node_tile or 8, 8))
    grid = (num_nodes // nb,)
    heads = w_attn.shape[1]

    d_ef, da, dwe, dwa = pl.pallas_call(
        functools.partial(_bwd_kernel, nb=nb, c=c, t=num_types, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb * c, de), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((de, num_types * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((de, heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb * c, de), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((de, num_types * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((de, heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_nodes * c, de), jnp.float32),
            jax.ShapeDtypeStruct((num_nodes * num_types, d), jnp.float32),
            jax.ShapeDtypeStruct((de, num_types * d), jnp.float32),
            jax.ShapeDtypeStruct((de, heads), jnp.float32),
        ],
        interpret=interpret,
    )(
        edge_feats,
        a.reshape(num_nodes * num_types, d),
        _as_col_i32(types, num_nodes * c),
        _as_col_i32(valid, num_nodes * c),
        we,
        w_attn,
        g.astype(jnp.float32).reshape(num_nodes * num_types, d),
    )
    d_ef = d_ef.astype(edge_feats.dtype)
    da = da.reshape(num_nodes, num_types, d).astype(a.dtype)
    dwe = dwe.astype(we.dtype)
    dwa = dwa.astype(w_attn.dtype)
    d_types = np.zeros(types.shape, jax.dtypes.float0)
    d_valid = np.zeros(valid.shape, jax.dtypes.float0)
    return d_ef, da, d_types, d_valid, dwe, dwa


_fused_vjp.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def _fused_forward(
    edge_feats, a, types, valid, we, w_attn,
    num_nodes: int, num_types: int, node_tile: int = 8, interpret: bool = False,
):
    e, de = edge_feats.shape
    c = e // num_nodes
    d = a.shape[-1]
    nb = _pick_tile(num_nodes, c, num_types, node_tile)

    sub = max(1, env_int("PEMP_TILE_SUB", 1))
    while sub > 1 and num_nodes % (nb * sub):
        sub -= 1

    grid = (num_nodes // (nb * sub),)
    out = pl.pallas_call(
        functools.partial(_kernel, nb=nb, c=c, t=num_types, d=d, sub=sub),
        grid=grid,
        # tiles are independent (each writes its own out rows): parallel
        # semantics lets Mosaic overlap DMA across grid steps
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((sub * nb * c, de), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sub * nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sub * nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sub * nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((de, num_types * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((de, w_attn.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (sub * nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_nodes * num_types, d), jnp.float32),
        interpret=interpret,
    )(
        edge_feats,
        a.reshape(num_nodes * num_types, d),
        _as_col_i32(types, num_nodes * c),
        _as_col_i32(valid, num_nodes * c),
        we,
        w_attn,
    )
    return out.reshape(num_nodes, num_types, d)


def _as_col_i32(x, rows):
    """(E,) -> (E, 1) int32; passes pre-shaped (E, 1) int32 through untouched
    so callers can hoist the layout conversion out of a scan loop."""
    if x.ndim == 2 and x.dtype == jnp.int32:
        return x
    return x.astype(jnp.int32).reshape(rows, 1)


# ---------------------------------------------------------------------------
# Slim attention-aggregation kernel (hybrid message path): the typed edge
# projection happens OUTSIDE (reverse-permutation blocked einsum — zero type
# waste, see models.mpn.layers.TypeAwareSplitLinear), and this kernel fuses
# only selection + ReLU + per-(node, type) softmax + weighted aggregation.
# Micro-measured at flagship shapes (nb=8, C=80): the in-kernel chunked
# typed projection costs ~2.1ms/step of the full kernel's ~4.9ms; the slim
# kernel drops it entirely.
# ---------------------------------------------------------------------------


def _attn_tile(b_ref, a_ref, types_ref, valid_ref, logit_ref, *, nb, c, t, d):
    nbc = nb * c
    nbt = nb * t
    b = b_ref[:].astype(jnp.float32)       # (nbc, D) typed projection
    types = types_ref[:]                   # (nbc, 1)
    valid = valid_ref[:]                   # (nbc, 1)
    sel_dt = jnp.bfloat16 if a_ref.dtype == jnp.bfloat16 else jnp.float32
    a = a_ref[:].astype(sel_dt)            # (nbt, D)

    _hot_f, sel, ok_f = _sel_ok_masks(types, nb=nb, c=c, t=t)
    a_sel = jax.lax.dot_general(
        sel.astype(sel_dt), a,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (nbc, D)
    pre = a_sel + b
    m = jax.nn.relu(pre)

    attn_col = logit_ref[:].astype(jnp.float32)   # (nbc, 1)
    valid_f = valid.astype(jnp.float32)
    attn_m = attn_col + (1.0 - valid_f) * _NEG
    # (1, nbc) view of the logits via MXU transpose
    attn_row = jax.lax.dot_general(
        jnp.ones((1, 1), jnp.float32), attn_col,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (1, nbc)

    valid_row = jax.lax.dot_general(
        jnp.ones((1, 1), jnp.float32), valid_f,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (1, nbc)
    masked = ok_f * valid_row
    scores = masked * attn_row + (1.0 - masked) * _NEG
    row_max = jnp.max(scores, axis=1, keepdims=True)
    row_max = jnp.where(row_max <= _NEG / 2, 0.0, row_max)
    shift_col = jax.lax.dot_general(
        ok_f, row_max, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    e_col = jnp.exp(attn_m - shift_col) * valid_f

    nd = jax.lax.dot_general(
        ok_f, jnp.concatenate([m * e_col, e_col], axis=1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    num, den = nd[:, :d], nd[:, d:d + 1]
    out = num / jnp.maximum(den, 1e-16)
    return m, e_col, den, out, ok_f, pre


def _attn_kernel(b_ref, a_ref, types_ref, valid_ref, logit_ref, out_ref,
                 *, nb, c, t, d):
    out = _attn_tile(b_ref, a_ref, types_ref, valid_ref, logit_ref,
                     nb=nb, c=c, t=t, d=d)[3]
    out_ref[:] = out.astype(out_ref.dtype)


def _attn_bwd_kernel(b_ref, a_ref, types_ref, valid_ref, logit_ref, g_ref,
                     db_ref, da_ref, dlogit_ref, *, nb, c, t, d):
    """Backward: db = dpre directly; da = sel^T-scatter of dpre (= ok @ dpre);
    dlogit = rowsum(dm*m) - e*t2 (softmax backward)."""
    m, e_col, den, out, ok_f, pre = _attn_tile(
        b_ref, a_ref, types_ref, valid_ref, logit_ref, nb=nb, c=c, t=t, d=d
    )
    g = g_ref[:].astype(jnp.float32)
    deninv = 1.0 / jnp.maximum(den, 1e-16)
    ghat = g * deninv
    q = jnp.sum(g * out, axis=1, keepdims=True) * deninv

    tq = jax.lax.dot_general(
        ok_f, jnp.concatenate([ghat, q], axis=1),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t1, t2 = tq[:, :d], tq[:, d:d + 1]
    dm = e_col * t1
    dpre = dm * (pre > 0).astype(jnp.float32)
    dlogit = jnp.sum(dm * m, axis=1, keepdims=True) - e_col * t2

    db_ref[:] = dpre.astype(db_ref.dtype)
    da_ref[:] = jax.lax.dot_general(
        ok_f, dpre, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(da_ref.dtype)
    dlogit_ref[:] = dlogit.astype(dlogit_ref.dtype)


def fused_attn_aggregate(
    b,            # (N*C, D) precomputed typed edge projection
    a,            # (N, T, D) node-part incl. per-type bias
    types,        # (N*C,) or (N*C, 1) source type per slot
    valid,        # (N*C,) or (N*C, 1) slot validity
    logits,       # (N*C,) or (N*C, 1) attention logits (ef @ w_attn)
    num_nodes: int,
    num_types: int,
    node_tile: int | None = None,
    interpret: bool = False,
):
    """Slim fused selection+softmax+aggregation; returns (N, T, D) float32.

    Differentiable in (b, a, logits) via a backward Pallas kernel. The typed
    projection and the attention logits are the caller's responsibility
    (computed once per step as dense matmuls outside). PEMP_NODE_TILE is
    read at trace time (see fused_typed_message_aggregate)."""
    if node_tile is None:
        node_tile = env_int("PEMP_NODE_TILE", 8)
    return _attn_vjp(b, a, types, valid, logits,
                     num_nodes, num_types, node_tile, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _attn_vjp(b, a, types, valid, logits, num_nodes, num_types, node_tile,
              interpret):
    return _attn_forward(b, a, types, valid, logits,
                         num_nodes, num_types, node_tile, interpret)


def _attn_fwd_rule(b, a, types, valid, logits, num_nodes, num_types,
                   node_tile, interpret):
    out = _attn_forward(b, a, types, valid, logits,
                        num_nodes, num_types, node_tile, interpret)
    return out, (b, a, types, valid, logits)


def _attn_forward(b, a, types, valid, logits, num_nodes, num_types,
                  node_tile, interpret):
    e, d = b.shape
    c = e // num_nodes
    nb = _pick_tile(num_nodes, c, num_types, node_tile)
    grid = (num_nodes // nb,)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, nb=nb, c=c, t=num_types, d=d),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((nb * c, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_nodes * num_types, d), jnp.float32),
        interpret=interpret,
    )(
        b,
        a.reshape(num_nodes * num_types, d),
        _as_col_i32(types, e),
        _as_col_i32(valid, e),
        logits.astype(jnp.float32).reshape(e, 1),
    )
    return out.reshape(num_nodes, num_types, d)


def _attn_bwd_rule(num_nodes, num_types, node_tile, interpret, res, g):
    b, a, types, valid, logits = res
    e, d = b.shape
    c = e // num_nodes
    nb = _pick_tile(num_nodes, c, num_types, node_tile)
    grid = (num_nodes // nb,)
    db, da, dlogit = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, nb=nb, c=c, t=num_types, d=d),
        grid=grid,
        # all three outputs are per-tile rows (no cross-tile accumulation)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((nb * c, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb * c, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((e, d), jnp.float32),
            jax.ShapeDtypeStruct((num_nodes * num_types, d), jnp.float32),
            jax.ShapeDtypeStruct((e, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        b,
        a.reshape(num_nodes * num_types, d),
        _as_col_i32(types, e),
        _as_col_i32(valid, e),
        logits.astype(jnp.float32).reshape(e, 1),
        g.astype(jnp.float32).reshape(num_nodes * num_types, d),
    )
    db = db.astype(b.dtype)
    da = da.reshape(num_nodes, num_types, d).astype(a.dtype)
    dlogit = dlogit.reshape(logits.shape).astype(logits.dtype)
    d_types = np.zeros(types.shape, jax.dtypes.float0)
    d_valid = np.zeros(valid.shape, jax.dtypes.float0)
    return db, da, d_types, d_valid, dlogit


_attn_vjp.defvjp(_attn_fwd_rule, _attn_bwd_rule)
