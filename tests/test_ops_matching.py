import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.ops import auction_assignment, greedy_assignment, hungarian_numpy

# fixed shape so the while_loop compiles once for the whole module
R, C = 12, 16
_auction = jax.jit(auction_assignment)


def brute_force_best(sim):
    from itertools import permutations

    r, c = sim.shape
    best_val = -1.0
    cols = list(range(c)) + [-1] * r
    seen = set()
    for perm in permutations(cols, r):
        if perm in seen:
            continue
        seen.add(perm)
        used = [p for p in perm if p >= 0]
        if len(used) != len(set(used)):
            continue
        val = sum(sim[i, p] for i, p in enumerate(perm) if p >= 0 and sim[i, p] > 0)
        best_val = max(best_val, val)
    return best_val


def total(sim, col_of_row):
    return sum(
        sim[i, j] for i, j in enumerate(col_of_row) if j >= 0 and sim[i, j] > 0
    )


def padded(sim):
    out = np.zeros((R, C))
    out[: sim.shape[0], : sim.shape[1]] = sim
    return out


@pytest.mark.parametrize("seed", range(8))
def test_hungarian_optimal_small(seed):
    rng = np.random.RandomState(seed)
    r, c = rng.randint(1, 5), rng.randint(1, 6)
    sim = rng.rand(r, c)
    sim[sim < 0.3] = 0.0
    sol = hungarian_numpy(sim)
    assert total(sim, sol) == pytest.approx(brute_force_best(sim), abs=1e-9)
    used = [j for j in sol if j >= 0]
    assert len(used) == len(set(used))


@pytest.mark.parametrize("seed", range(6))
def test_auction_matches_hungarian(seed):
    rng = np.random.RandomState(100 + seed)
    r, c = rng.randint(2, R + 1), rng.randint(2, C + 1)
    sim = np.zeros((r, c))
    block = rng.rand(r, c)
    block[block < 0.4] = 0.0
    sim[:] = block
    sim = padded(sim)
    sol_h = hungarian_numpy(sim)
    sol_a = np.asarray(_auction(jnp.asarray(sim)))
    # eps-optimal: within n_matched * eps of the optimum
    assert total(sim, sol_a) == pytest.approx(total(sim, sol_h), abs=R * 1e-4 + 1e-6)
    used = [j for j in sol_a if j >= 0]
    assert len(used) == len(set(used))


def test_auction_oks_like_matrix():
    """OKS-style similarity: sharply peaked, thresholded — the training case."""
    rng = np.random.RandomState(7)
    sim = np.zeros((R, C))
    for i in range(R):
        j = rng.randint(0, C)
        sim[i, j] = rng.uniform(0.6, 1.0)
        if rng.rand() < 0.3:  # occasional conflict
            sim[i, (j + 1) % C] = rng.uniform(0.5, 0.9)
    sol_h = hungarian_numpy(sim)
    sol_a = np.asarray(_auction(jnp.asarray(sim)))
    assert total(sim, sol_a) == pytest.approx(total(sim, sol_h), abs=R * 1e-4)


def test_auction_more_rows_than_cols():
    rng = np.random.RandomState(11)
    sim = np.zeros((R, C))
    block = rng.rand(10, 3)
    block[block < 0.3] = 0.0
    sim[:10, :3] = block
    sol_h = hungarian_numpy(sim)
    sol_a = np.asarray(_auction(jnp.asarray(sim)))
    assert total(sim, sol_a) == pytest.approx(total(sim, sol_h), abs=R * 1e-4)
    assert (np.asarray(sol_a) >= 0).sum() <= 3


def test_greedy_conflict_free_exact():
    sim = np.zeros((3, 5))
    sim[0, 1] = 0.9
    sim[1, 3] = 0.8
    sim[2, 0] = 0.7
    sol = np.asarray(greedy_assignment(jnp.asarray(sim)))
    np.testing.assert_array_equal(sol, [1, 3, 0])


def test_empty_rows_unmatched():
    sim = np.zeros((R, C))
    sol = np.asarray(_auction(jnp.asarray(sim)))
    assert (sol == -1).all()
    sol_g = np.asarray(greedy_assignment(jnp.asarray(sim)))
    assert (sol_g == -1).all()
    assert (hungarian_numpy(sim) == -1).all()


def test_auction_vmap_mixed_difficulty():
    """Batched lanes of very different difficulty must each stay exact.

    The adaptive eps-scaled auction runs its whole schedule in one
    while_loop whose state carries the phase index; under vmap a converged
    lane idles as a no-op while a contended lane escalates through the eps
    schedule. An easy + pathological pair exercises exactly that
    interaction (a lane ratcheting phases after convergence would reset
    its assignment and return garbage).
    """
    rng = np.random.RandomState(3)
    easy = np.zeros((R, C), np.float32)
    for i in range(R):
        easy[i, rng.randint(C)] = 0.5 + 0.5 * rng.rand()
    hard = np.zeros((R, C), np.float32)  # all rows fight over 3 columns
    cols = [2, 7, 13]
    for i in range(R):
        hard[i, cols] = np.clip(1.0 - rng.rand(3) * 1e-3, 1e-3, 1.0)
    batch = jnp.asarray(np.stack([easy, hard]))
    sols = np.asarray(jax.jit(jax.vmap(auction_assignment))(batch))
    for sim, sol in zip([easy, hard], sols):
        sol_h = hungarian_numpy(sim)
        assert total(sim, sol) == pytest.approx(
            total(sim, sol_h), abs=R * 1e-4 + 1e-6
        )
        used = [j for j in sol if j >= 0]
        assert len(used) == len(set(used))
