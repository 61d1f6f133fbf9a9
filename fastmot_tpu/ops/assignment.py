"""Data-association kernels: linear assignment, greedy matching, cost fusion.

Behavioral reference: fastmot/utils/matching.py. The reference solves the
linear assignment problem with SciPy's Hungarian on host; here it becomes a
jittable Bertsekas auction with epsilon scaling (``auction_lap``) so the
whole association step can stay on device. The greedy matcher and the cost
fusion/gating helpers are direct masked vectorizations.

All solvers operate on padded, fixed-shape cost matrices. Entries >=
``INF_COST`` mean "forbidden"; a row/col matched at such an entry is
reported unmatched, mirroring matching.py:58-70.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CHI_SQ_INV_95 = 9.4877  # 0.95 quantile of chi-square distribution (4 dof)
INF_COST = 1e5

# Forbidden entries are clamped to this before solving so the auction's
# price range (and hence its iteration count) stays small. Correctness
# requires only _FORBID > 2 x the max finite cost (2.0 for cosine
# distance, the largest any tracker stage passes): swapping one forbidden
# pair for two real pairs then always lowers the total, so the solver
# avoids clamped entries whenever a finite-cost maximal matching exists;
# clamped matches are filtered out afterwards. Keeping it small keeps
# both the epsilon-scaling phase count and the starving-row price walk
# (O(_FORBID / eps) bidding rounds) short.
_FORBID = 4.5


@partial(jax.jit, static_argnames=('eps_final', 'max_iters', 'forbid'))
def auction_lap(cost: jax.Array,
                row_valid: jax.Array | None = None,
                col_valid: jax.Array | None = None,
                eps_final: float = 1e-3,
                max_iters: int = 10000,
                forbid: float = _FORBID) -> tuple[jax.Array, jax.Array]:
    """Solve min-cost rectangular assignment on device.

    Returns ``(row4col, col4row)``: ``col4row[i]`` is the column matched to
    row ``i`` or -1; rows/cols matched only via forbidden (>= INF_COST) or
    padded entries are reported unmatched (-1), matching the reference's
    post-filter (matching.py:64-69).

    Implementation: forward auction (maximization of -cost) with epsilon
    scaling on the square padding of the matrix. Each bidding round is a
    fully vectorized [n, n] computation (VPU-friendly); the outer
    ``lax.while_loop`` runs until every real row is assigned or the
    iteration cap is hit.
    """
    r, c = cost.shape
    n = max(r, c, 1)

    if row_valid is None:
        row_valid = jnp.ones(r, dtype=bool)
    if col_valid is None:
        col_valid = jnp.ones(c, dtype=bool)

    # Pad to square. Padded / invalid / forbidden entries get _FORBID.
    # NOTE: the square-symmetric formulation (every row assigned) is what
    # makes the forward auction optimal — early "valid rows done"
    # termination is the asymmetric problem, which forward-only auction
    # solves suboptimally without a lambda correction.
    big = jnp.full((n, n), forbid, dtype=jnp.float32)
    cost_f = jnp.minimum(cost.astype(jnp.float32), forbid)
    cost_f = jnp.where(row_valid[:, None] & col_valid[None, :], cost_f, forbid)
    sq = big.at[:r, :c].set(cost_f)
    benefit = -sq  # auction maximizes

    # deterministic micro-bias breaks the degeneracy of uniform padded
    # rows: without it every dummy row bids the same cheapest column and
    # they settle one per round (O(n) rounds/phase); with distinct
    # preferences they spread across free columns and settle in a few
    # rounds. Total distortion <= n * _BIAS, folded into the tolerance.
    # Scaled with eps_final so tight-tolerance solves (the parity
    # oracle's 1e-4) keep the pre-assignment eps-CS invariant below.
    _BIAS = min(1e-4, 0.25 * eps_final)
    assert eps_final > _BIAS, 'pre-assignment eps-CS needs eps > bias'
    ii = jax.lax.broadcasted_iota(jnp.uint32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.uint32, (n, n), 1)
    noise = ((ii * jnp.uint32(2654435761) + jj * jnp.uint32(40503))
             % jnp.uint32(65536)).astype(jnp.float32) / 65536.0
    benefit = benefit + _BIAS * noise

    idx = jnp.arange(n)

    # Degenerate-row fast path. In tracking workloads most rows/columns
    # are padding or fully gated (an association frame saw 38 finite
    # entries in a 128x128 matrix); auctioning those uniform rows from
    # scratch is a pure price war that measured 3.5-14 ms per solve.
    # Rows with NO allowed entry are pre-assigned one-to-one onto columns
    # with no allowed entry at price 0: their eps-CS slack is at most
    # _BIAS < eps_final, so the assignment is valid for every phase and
    # they never bid unless a starving real row displaces them.
    finite = sq < forbid
    # NOTE on a rejected optimization: clamping the forbidden level
    # adaptively to ~2 x the max finite cost (to shorten starving-row
    # price walks) is NOT safe — converting a forbidden pair to finite
    # can reroute an augmenting path through many real pairs, and the
    # eps-scaling optimality slack (n * eps_final) can exceed the
    # tightened margin. The cascade parity fuzz caught it leaving a real
    # detection on a forbidden column (spurious track creation).
    row_live = jnp.any(finite, axis=1)
    col_live = jnp.any(finite, axis=0)
    r_rank = jnp.cumsum(~row_live) - 1
    free_cols = jnp.nonzero(~col_live, size=n, fill_value=n)[0]
    n_free = jnp.sum(~col_live)
    pre_col = jnp.where(~row_live & (r_rank < n_free),
                        free_cols[jnp.clip(r_rank, 0, n - 1)], -1)
    owner0 = jnp.full(n, -1, dtype=jnp.int32).at[
        jnp.where(pre_col >= 0, pre_col, n)].set(
            idx.astype(jnp.int32), mode='drop')

    # A TPU lax.while_loop iteration carries ~6 us of fixed overhead —
    # an order of magnitude more than one [n, n] bidding round's actual
    # VPU work. Unrolling UNROLL rounds per iteration amortizes it;
    # rounds after convergence are natural no-ops (no unassigned rows ->
    # no bids -> state unchanged), so the unroll never changes the result.
    UNROLL = 8

    def run_phase(eps, owner, price):
        """One epsilon phase: bid until every row is assigned."""

        def one_round(owner, price):
            # Unassigned rows bid simultaneously (Jacobi auction).
            # (scatter-add with out-of-bounds drop — duplicate-safe OR)
            assigned_row = jnp.zeros(n, dtype=jnp.int32).at[
                jnp.where(owner >= 0, owner, n)].add(1, mode='drop') > 0
            unassigned = ~assigned_row
            value = benefit - price[None, :]           # [n, n]
            top1 = jnp.argmax(value, axis=1)           # best object per row
            v1 = jnp.max(value, axis=1)
            # second-best via a broadcast compare on the column iota —
            # an [n, n] one-hot scatter (.at[idx, top1].set) lowers worse
            value2 = jnp.where(jj == top1[:, None].astype(jnp.uint32),
                               -jnp.inf, value)
            v2 = jnp.max(value2, axis=1)
            # single-object matrices have no second-best: bid the minimum
            # increment instead of an infinite (-> NaN) amount
            v2 = jnp.where(jnp.isfinite(v2), v2, v1)
            bid_amt = price[top1] + (v1 - v2) + eps    # standard auction bid

            # Scatter bids: for each object, the highest bid among
            # unassigned rows bidding on it wins.
            bids = jnp.where(unassigned[:, None] & (top1[:, None] == idx[None, :]),
                             bid_amt[:, None], -jnp.inf)  # [rows, objects]
            best_bid = jnp.max(bids, axis=0)
            best_bidder = jnp.argmax(bids, axis=0)
            won = best_bid > -jnp.inf
            price = jnp.where(won, best_bid, price)
            owner = jnp.where(won, best_bidder, owner)
            return owner, price

        def cond(state):
            owner, price, it = state
            return jnp.any(owner < 0) & (it < max_iters)

        def body(state):
            owner, price, it = state
            for _ in range(UNROLL):
                owner, price = one_round(owner, price)
            return owner, price, it + UNROLL

        owner, price, _ = jax.lax.while_loop(cond, body, (owner, price, 0))
        return owner, price

    # Epsilon scaling: eps starts at a fraction of the value range and
    # shrinks geometrically to eps_final; n * eps_final bounds the gap to
    # the optimal total cost. ASSIGNMENTS carry over between phases but
    # PRICES are reset to zero at each phase start. Carrying the prices
    # looked strictly better (later phases only touch rows the tighter
    # tolerance disturbs) but hides a pathology on the near-diagonal
    # matrices tracking actually produces (Mahalanobis gating leaves <= 1
    # finite entry per row): a phase-1 winner contested only by forbidden
    # alternatives overpays its column by ~(forbid - cost + eps0), the
    # next phase's eps-CS check unassigns it from its own inflated seat,
    # and the vacated seat wanders the pre-assigned dead rows at +eps a
    # round — measured 1000+ rounds of musical chairs for a stage with
    # ONE finite entry. With per-phase price resets the eps-CS check
    # evaluates pairs at face value, the 1-candidate winners keep their
    # seats, and only genuinely contested rows re-fight: mean rounds on
    # captured production stages fell 268.7 -> 5.8 (46x) while contested
    # synthetic stages stay bounded (80 -> 169 rounds) and every solve
    # keeps the n*eps optimality bound and scipy pair counts.
    price = jnp.zeros(n, dtype=jnp.float32)
    owner = owner0
    # eps0 = 0.5. A tempting rescale (eps0 = _FORBID/32, to shorten the
    # first phase's price walks) moves the LAST-run phase's eps within
    # its [eps_final, 8*eps_final) band — and the n*eps optimality slack
    # with it — enough that the cascade parity fuzz diverged from the
    # Hungarian oracle (seeds 1006/1009). Phase count is unchanged either
    # way at production tolerance, so there was no real win to keep.
    eps = jnp.float32(0.5)

    def scale_cond(state):
        eps, _, _ = state
        return eps >= eps_final

    def scale_body(state):
        eps, owner, price = state
        price = jnp.zeros_like(price)   # per-phase reset (see above)
        value = benefit - price[None, :]
        vmax = jnp.max(value, axis=1)
        has = owner >= 0
        row_j = jnp.where(has, owner, 0)
        pair_val = value[row_j, idx]
        keep = has & (pair_val >= vmax[row_j] - eps)
        owner = jnp.where(keep, owner, -1)
        owner, price = run_phase(eps, owner, price)
        return eps / 8.0, owner, price

    _, owner, price = jax.lax.while_loop(scale_cond, scale_body, (eps, owner, price))

    # owner[j] = row assigned to column j (>= 0 after the final phase; -1
    # entries must not scatter — drop them instead of wrapping).
    row4col_sq = owner
    col4row_sq = jnp.full(n, -1, dtype=jnp.int32).at[
        jnp.where(owner >= 0, owner, n)].set(idx.astype(jnp.int32),
                                             mode='drop')

    # Unmatch pairs on padded or forbidden entries.
    pair_cost_col = sq[jnp.where(row4col_sq >= 0, row4col_sq, 0), idx]
    col_ok = (row4col_sq >= 0) & (pair_cost_col < forbid)
    row4col_sq = jnp.where(col_ok, row4col_sq, -1)
    pair_cost_row = sq[idx, jnp.where(col4row_sq >= 0, col4row_sq, 0)]
    row_ok = (col4row_sq >= 0) & (pair_cost_row < forbid)
    col4row_sq = jnp.where(row_ok, col4row_sq, -1)

    return row4col_sq[:c], col4row_sq[:r]


@jax.jit
def greedy_match_arrays(cost: jax.Array,
                        row_valid: jax.Array,
                        col_valid: jax.Array,
                        max_cost: float) -> tuple[jax.Array, jax.Array]:
    """Greedy global-minimum matching until cost exceeds ``max_cost``.

    Behavioral reference: matching.py:73-97 (repeated argmin over the
    shrinking matrix). Returns ``(row4col, col4row)`` index arrays with -1
    for unmatched. The data-dependent loop becomes ``lax.while_loop`` over
    a live-entry mask; ties resolve to the smallest flat index, identical
    to ``np.argmin`` semantics.
    """
    r, c = cost.shape
    cost_f = cost.astype(jnp.float32)
    live0 = row_valid[:, None] & col_valid[None, :]
    inf = jnp.asarray(jnp.inf, jnp.float32)

    def cond(state):
        live, _, _ = state
        masked = jnp.where(live, cost_f, inf)
        return jnp.min(masked) <= max_cost

    def body(state):
        live, row4col, col4row = state
        masked = jnp.where(live, cost_f, inf)
        flat = jnp.argmin(masked)
        i, j = flat // c, flat % c
        row4col = row4col.at[j].set(i.astype(jnp.int32))
        col4row = col4row.at[i].set(j.astype(jnp.int32))
        live = live & (jnp.arange(r)[:, None] != i) & (jnp.arange(c)[None, :] != j)
        return live, row4col, col4row

    row4col0 = jnp.full(c, -1, dtype=jnp.int32)
    col4row0 = jnp.full(r, -1, dtype=jnp.int32)
    _, row4col, col4row = jax.lax.while_loop(
        cond, body, (live0, row4col0, col4row0))
    return row4col, col4row


def fuse_motion(cost: jax.Array, m_dist: jax.Array,
                m_weight: float) -> jax.Array:
    """Blend appearance cost with chi-square-normalized Mahalanobis motion
    distance and gate at the 0.95 quantile (matching.py:100-106)."""
    fused = (1.0 - m_weight) * cost + m_weight * (m_dist / CHI_SQ_INV_95)
    return jnp.where(m_dist > CHI_SQ_INV_95, INF_COST, fused)


def gate_cost(cost: jax.Array, row_labels: jax.Array, col_labels: jax.Array,
              max_cost: float | None = None) -> jax.Array:
    """Forbid label mismatches and (optionally) entries above ``max_cost``
    (matching.py:109-116)."""
    bad = row_labels[:, None] != col_labels[None, :]
    if max_cost is not None:
        bad = bad | (cost > max_cost)
    return jnp.where(bad, INF_COST, cost)
