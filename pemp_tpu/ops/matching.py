"""Assignment solvers for training-label construction.

The reference solves a rectangular max-weight assignment between GT joints
and detections with scipy's ``linear_sum_assignment`` on the host every
forward pass — a device->host sync per batch
(reference: src/graph_constructor/ConstructGraph.py:816-827).

Here matching runs on-device with static shapes:

  * ``auction_assignment`` — Jacobi auction algorithm (Bertsekas), eps-optimal
    max-weight assignment, jit/vmap-friendly (lax.while_loop).
  * ``greedy_assignment``  — iterative global-argmax matching; exact when
    similarities are conflict-free (the common case: OKS similarity is sharply
    peaked and thresholded at MATCHING_RADIUS).
  * ``hungarian_numpy``    — exact host oracle for tests (no scipy needed).

All solvers take a dense similarity matrix ``sim (R, C)`` (rows = GT joints,
cols = detections) where entries <= 0 mean "forbidden"; they return
``col_of_row (R,)`` with -1 for unmatched rows, maximizing total similarity
over matches with sim > 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

NEG = -1e9


def greedy_assignment(sim: jnp.ndarray) -> jnp.ndarray:
    """Pick the globally best (row, col) pair, remove both, repeat R times."""
    r, c = sim.shape

    def body(_, state):
        s, col_of_row = state
        flat = jnp.argmax(s)
        i, j = flat // c, flat % c
        good = s[i, j] > 0
        col_of_row = jnp.where(
            good, col_of_row.at[i].set(j.astype(jnp.int32)), col_of_row
        )
        s = jnp.where(good, s.at[i, :].set(NEG).at[:, j].set(NEG), s)
        return s, col_of_row

    col_of_row = jnp.full((r,), -1, dtype=jnp.int32)
    s0 = jnp.where(sim > 0, sim, NEG)
    _, col_of_row = lax.fori_loop(0, r, body, (s0, col_of_row))
    return col_of_row


def _col_of_row_from(row_of_col: jnp.ndarray, r: int) -> jnp.ndarray:
    c = row_of_col.shape[0]
    col_of_row = jnp.full((r,), -1, jnp.int32)
    cols = jnp.arange(c, dtype=jnp.int32)
    owner = jnp.where(row_of_col >= 0, row_of_col, r)  # park invalid at r
    return col_of_row.at[owner].set(cols, mode="drop")


def auction_assignment(
    sim: jnp.ndarray,
    eps: float = 1e-5,
    max_iters: int = 20000,
    scaling_phases: int = 8,
    scaling_factor: float = 8.0,
) -> jnp.ndarray:
    """Jacobi auction for eps-optimal max-weight *matching* (free disposal).

    Forbidden entries (sim <= 0) are never matched; a row's outside option is
    0, so rows retire once no column is strictly profitable — this handles
    r > c and keeps prices bounded by max(sim). The result is within
    ``n_matched * eps`` of the Hungarian optimum, which coincides with it on
    the thresholded OKS similarity matrices this is used for (large gaps,
    sparse conflicts — reference: ConstructGraph.py:781-827).

    Runs with **epsilon scaling** (Bertsekas): ``scaling_phases`` auction
    phases with eps decreasing geometrically from ~max(sim)/scaling_factor
    down to ``eps``; each phase restarts the assignment but keeps the prices.
    Without it, contended near-tied instances (many GT rows bidding on few
    detections, OKS sims within 1e-3 of each other — exactly what large-person
    crops produce) need ~max(sim)/eps ≈ 10^4 serial rounds, which dominates
    the train step on CPU and costs ~25ms/step on TPU; with it the same
    instances converge in tens of rounds. The final phase runs at ``eps`` to
    the same fixed point condition as the unscaled auction, so the optimality
    guarantee is unchanged.

    State is the column-ownership vector; eviction on outbidding is implicit.
    """
    r, c = sim.shape
    s = jnp.where(sim > 0, sim, NEG).astype(jnp.float32)
    feasible_row = jnp.any(s > NEG / 2, axis=1)
    row_ids = jnp.arange(r, dtype=jnp.int32)

    def active_rows(prices, row_of_col):
        col_of_row = _col_of_row_from(row_of_col, r)
        best_profit = jnp.max(s - prices[None, :], axis=1)
        return (col_of_row < 0) & feasible_row & (best_profit > 0)

    def cond(state):
        it, _eps, prices, row_of_col = state
        return (it < max_iters) & jnp.any(active_rows(prices, row_of_col))

    def body(state):
        it, phase_eps, prices, row_of_col = state
        values = s - prices[None, :]
        top2, top2_idx = lax.top_k(values, min(2, c))
        best_j = top2_idx[:, 0].astype(jnp.int32)
        second = top2[:, 1] if c > 1 else jnp.full((r,), NEG, jnp.float32)
        # the outside option (profit 0) caps how far a row will bid
        second = jnp.maximum(second, 0.0)
        bid = prices[best_j] + (top2[:, 0] - second) + phase_eps

        active = active_rows(prices, row_of_col)
        bid = jnp.where(active, bid, NEG)

        best_bid = jax.ops.segment_max(bid, best_j, num_segments=c)
        is_winner = active & (bid >= best_bid[best_j] - 1e-12)
        winner_rank = jnp.where(is_winner, row_ids, r + 1)
        win_row = jax.ops.segment_min(winner_rank, best_j, num_segments=c)
        col_has_bid = (best_bid > NEG / 2) & (win_row <= r)

        row_of_col = jnp.where(col_has_bid, win_row.astype(jnp.int32), row_of_col)
        prices = jnp.where(col_has_bid, best_bid, prices)
        return it + 1, phase_eps, prices, row_of_col

    # Geometric eps schedule ending exactly at the target eps; phases whose
    # eps has already decayed to the target exit after one cond evaluation.
    # The phase loop is a lax.fori_loop (NOT an unrolled python loop): one
    # while-body in the compiled program instead of scaling_phases copies —
    # the unrolled form multiplied the flagship train-step XLA compile by
    # >5x (vmapped over images inside the label constructor).
    eps0 = jnp.maximum(jnp.max(s.max(initial=0.0), initial=0.0), 0.0)
    n_eff = min(r, c)

    def phase(k, carry):
        prices, _ = carry
        is_final = k == scaling_phases - 1
        phase_eps = jnp.where(
            is_final,
            jnp.float32(eps),  # final phase: the unscaled target
            jnp.maximum(
                eps0 / (scaling_factor ** (k + 1.0)), eps
            ).astype(jnp.float32),
        )
        # new phase: keep learned prices, restart the assignment
        state = (jnp.int32(0), phase_eps, prices, jnp.full((c,), -1, jnp.int32))
        _, _, prices, row_of_col = lax.while_loop(cond, body, state)
        # Between phases, deflate: auction prices can overshoot the
        # equilibrium duals by up to ~n*eps during a phase, and with the
        # profit>0 outside option an above-equilibrium price permanently
        # locks matchable rows out of later (finer-eps) phases (prices never
        # fall in a forward auction). Prices AT OR BELOW equilibrium are
        # always safe: the next phase just bids them back up. Deflating by
        # the overshoot bound keeps most of the learned price level, so the
        # residual climb per bid war is ~n*eps_prev instead of the full
        # valuation.
        prices = jnp.where(
            is_final, prices, jnp.maximum(prices - n_eff * phase_eps - eps, 0.0)
        )
        return prices, row_of_col

    prices = jnp.zeros((c,), jnp.float32)
    row_of_col = jnp.full((c,), -1, jnp.int32)
    prices, row_of_col = lax.fori_loop(
        0, scaling_phases, phase, (prices, row_of_col)
    )

    col_of_row = _col_of_row_from(row_of_col, r)
    got = col_of_row >= 0
    simval = sim[jnp.arange(r), jnp.clip(col_of_row, 0, c - 1)]
    return jnp.where(got & (simval > 0), col_of_row, -1)


def hungarian_numpy(sim: np.ndarray) -> np.ndarray:
    """Exact max-weight rectangular assignment (host oracle, O(n^3)).

    Jonker-Volgenant shortest augmenting path on ``cost = max(sim) - sim``
    with forbidden entries at a large constant, rows padded to square.
    Returns col_of_row with -1 for rows matched to forbidden entries.
    """
    sim = np.asarray(sim, dtype=np.float64)
    r, c = sim.shape
    if r == 0 or c == 0:
        return np.full(r, -1, dtype=np.int64)
    n = max(r, c)
    big = 1e9
    cost = np.full((n, n), big / 2.0)
    block = np.where(sim > 0, np.max(sim, initial=0.0) - sim, big / 2.0)
    cost[:r, :c] = block

    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=np.int64)  # p[j] = row matched to col j
    way = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, np.inf)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            j_free = ~used[1:]
            cur = cost[i0 - 1, :] - u[i0] - v[1:]
            upd = j_free & (cur < minv[1:])
            minv[1:][upd] = cur[upd]
            way[1:][upd] = j0
            masked = np.where(j_free, minv[1:], np.inf)
            j1 = int(np.argmin(masked)) + 1
            delta = masked[j1 - 1]
            u[p[used]] += delta
            v[used] -= delta
            minv[1:][j_free] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1

    col_of_row = np.full(r, -1, dtype=np.int64)
    for j in range(1, n + 1):
        i = p[j]
        if 1 <= i <= r and j - 1 < c and sim[i - 1, j - 1] > 0:
            col_of_row[i - 1] = j - 1
    return col_of_row
