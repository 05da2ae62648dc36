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

    Runs with **adaptive epsilon scaling** (Bertsekas): phase 0 is the plain
    auction at the target ``eps`` with a small iteration budget — typical OKS
    instances (sharp peaks, sparse conflicts) converge there in a handful of
    rounds at zero extra cost and with the identical result to the unscaled
    auction. Instances that blow the budget (contended near-ties: many GT
    rows bidding on few detections with sims within 1e-3 — exactly what
    large-person crops produce, needing ~max(sim)/eps ≈ 10^5 serial rounds
    unscaled) escalate into ``scaling_phases`` phases with eps decreasing
    geometrically from ~max(sim)/scaling_factor back down to ``eps``; each
    phase restarts the assignment but keeps the (deflated) prices. The last
    phase runs at ``eps`` to the same fixed-point condition as the unscaled
    auction, so the optimality guarantee is unchanged.

    The whole schedule lives in ONE ``lax.while_loop`` whose state carries
    the phase index: a single loop body in the compiled program (an unrolled
    python phase loop multiplied the flagship train-step compile >5x), and
    under ``vmap`` easy lanes simply stop contributing instead of paying a
    both-branches ``lax.cond`` select.

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

    eps0 = jnp.maximum(jnp.max(s.max(initial=0.0), initial=0.0), 0.0)
    n_eff = min(r, c)
    quick_budget = min(max_iters, 200)
    last_phase = scaling_phases  # phase index layout: 0 = quick, 1..P = scaled

    def eps_of(phase):
        # phase 0 (quick) and the last scheduled phase run at the target eps;
        # phases 1..P-1 decay geometrically from ~max(sim)/factor
        scaled_eps = jnp.maximum(
            eps0 / (scaling_factor ** phase.astype(jnp.float32)), eps
        )
        terminal = (phase == 0) | (phase >= last_phase)
        return jnp.where(terminal, jnp.float32(eps), scaled_eps)

    # State: (total_it, it_in_phase, phase, prices, row_of_col).
    # Terminal phases (quick, last scheduled) end the loop when no row is
    # active; intermediate completions and a blown quick budget transition
    # to the next phase inside the body.
    def cond(state):
        total_it, _itp, phase, prices, row_of_col = state
        active = jnp.any(active_rows(prices, row_of_col))
        terminal = (phase == 0) | (phase >= last_phase)
        return (total_it < max_iters) & (active | ~terminal)

    def body(state):
        total_it, itp, phase, prices, row_of_col = state
        active = jnp.any(active_rows(prices, row_of_col))
        # quick phase exhausted, or an intermediate phase converged ->
        # transition to the next phase: restart the assignment, keep the
        # prices DEFLATED by the phase's overshoot bound. (Auction prices can
        # end up to ~n*eps above the equilibrium duals, and with the profit>0
        # outside option an above-equilibrium price permanently locks
        # matchable rows out of finer-eps phases — prices never fall in a
        # forward auction. At-or-below-equilibrium prices are always safe:
        # the next phase just bids them back up, and the residual climb per
        # bid war is ~n*eps_prev instead of the full valuation.)
        # Terminal phases (quick, last) never transition: a converged lane
        # inside a vmap batch must idle as a no-op (all bids masked) while
        # other lanes finish, not ratchet through the schedule.
        transition = ((phase == 0) & (itp >= quick_budget) & active) | (
            (~active) & (phase >= 1) & (phase < last_phase)
        )

        def do_transition(args):
            total_it, _itp, phase, prices, row_of_col = args
            prices = jnp.maximum(prices - n_eff * eps_of(phase) - eps, 0.0)
            return (
                total_it + 1,
                jnp.int32(0),
                phase + 1,
                prices,
                jnp.full((c,), -1, jnp.int32),
            )

        def do_bid(args):
            total_it, itp, phase, prices, row_of_col = args
            phase_eps = eps_of(phase)
            values = s - prices[None, :]
            top2, top2_idx = lax.top_k(values, min(2, c))
            best_j = top2_idx[:, 0].astype(jnp.int32)
            second = (
                top2[:, 1] if c > 1 else jnp.full((r,), NEG, jnp.float32)
            )
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

            row_of_col = jnp.where(
                col_has_bid, win_row.astype(jnp.int32), row_of_col
            )
            prices = jnp.where(col_has_bid, best_bid, prices)
            return total_it + 1, itp + 1, phase, prices, row_of_col

        return lax.cond(transition, do_transition, do_bid, state)

    state = (
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
        jnp.zeros((c,), jnp.float32),
        jnp.full((c,), -1, jnp.int32),
    )
    _, _, _, _, row_of_col = lax.while_loop(cond, body, state)

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
