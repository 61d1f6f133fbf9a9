"""ops.assignment vs scipy's Hungarian and a numpy greedy oracle."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from fastmot_tpu.ops import assignment as A


def total_matched_cost(cost, col4row):
    t = 0.0
    for i, j in enumerate(col4row):
        if j >= 0:
            t += cost[i, j]
    return t


@pytest.mark.parametrize("shape", [(5, 5), (8, 3), (3, 8), (1, 1), (20, 20),
                                   (16, 24)])
def test_auction_matches_scipy_cost(rng, shape):
    for trial in range(5):
        cost = rng.uniform(0, 1, shape).astype(np.float32)
        # sprinkle forbidden entries
        forbid = rng.uniform(size=shape) < 0.2
        cost[forbid] = A.INF_COST
        row4col, col4row = A.auction_lap(cost)
        row4col, col4row = np.asarray(row4col), np.asarray(col4row)

        ri, ci = linear_sum_assignment(np.minimum(cost, 1e3))
        ref_pairs = [(i, j) for i, j in zip(ri, ci) if cost[i, j] < A.INF_COST]
        ref_total = sum(cost[i, j] for i, j in ref_pairs)

        got_pairs = [(i, j) for i, j in enumerate(col4row) if j >= 0]
        got_total = total_matched_cost(cost, col4row)
        # same matching cardinality, near-identical total cost
        assert len(got_pairs) == len(ref_pairs), (trial, got_pairs, ref_pairs)
        assert got_total <= ref_total + max(shape) * 2e-3 + 1e-4
        # consistency between the two output views
        for i, j in got_pairs:
            assert row4col[j] == i
        for j, i in enumerate(row4col):
            if i >= 0:
                assert col4row[i] == j


def test_auction_all_forbidden():
    cost = np.full((4, 4), A.INF_COST, dtype=np.float32)
    row4col, col4row = A.auction_lap(cost)
    assert (np.asarray(row4col) == -1).all()
    assert (np.asarray(col4row) == -1).all()


def test_auction_sparse_gated_production_shape(rng):
    """The production association shape: [64, 128] with most rows padding
    and only a handful of finite (gated) entries — the degenerate regime
    where a naive auction price-wars for hundreds of rounds (profiled at
    3.5-20 ms per solve before the pre-assignment/carryover fast paths).
    Must still match scipy's cardinality and near-optimal total."""
    for n_finite in (0, 1, 10, 38):
        cost = np.full((64, 128), A.INF_COST, np.float32)
        row_valid = np.zeros(64, bool)
        row_valid[:40] = True
        col_valid = np.zeros(128, bool)
        col_valid[:40] = True
        rows = rng.integers(0, 40, n_finite)
        cols = rng.integers(0, 40, n_finite)
        cost[rows, cols] = rng.uniform(0, 0.9, n_finite)
        row4col, col4row = A.auction_lap(cost, row_valid, col_valid)
        col4row = np.asarray(col4row)

        sub = np.where(row_valid[:, None] & col_valid[None, :], cost, 1e5)
        ri, ci = linear_sum_assignment(np.minimum(sub, 1e3))
        ref_pairs = [(i, j) for i, j in zip(ri, ci) if sub[i, j] < A.INF_COST]
        got_pairs = [(i, j) for i, j in enumerate(col4row) if j >= 0]
        assert len(got_pairs) == len(ref_pairs), (n_finite, got_pairs)
        got = total_matched_cost(cost, col4row)
        ref = sum(cost[i, j] for i, j in ref_pairs)
        assert got <= ref + 128 * 2e-3


def test_auction_with_validity_masks(rng):
    cost = rng.uniform(0, 1, (6, 6)).astype(np.float32)
    row_valid = np.array([1, 1, 1, 0, 0, 0], bool)
    col_valid = np.array([1, 1, 1, 1, 0, 0], bool)
    row4col, col4row = A.auction_lap(cost, row_valid, col_valid)
    col4row = np.asarray(col4row)
    assert (col4row[3:] == -1).all()
    ri, ci = linear_sum_assignment(cost[:3, :4])
    assert total_matched_cost(cost, col4row) <= cost[ri, ci].sum() + 0.05


def np_greedy(cost, max_cost):
    """Oracle for matching.py:73-97."""
    cost = cost.copy()
    r, c = cost.shape
    rows_left = list(range(r))
    cols_left = list(range(c))
    matches = []
    while rows_left and cols_left:
        sub = cost[np.ix_(rows_left, cols_left)]
        flat = np.argmin(sub)
        i, j = flat // len(cols_left), flat % len(cols_left)
        if sub[i, j] <= max_cost:
            matches.append((rows_left[i], cols_left[j]))
            rows_left.pop(i)
            cols_left.pop(j)
        else:
            break
    return matches


def test_greedy_match(rng):
    for _ in range(10):
        cost = rng.uniform(0, 1, (7, 5)).astype(np.float32)
        row_valid = np.ones(7, bool)
        col_valid = np.ones(5, bool)
        row4col, col4row = A.greedy_match_arrays(cost, row_valid, col_valid, 0.5)
        got = sorted((i, int(j)) for i, j in enumerate(np.asarray(col4row)) if j >= 0)
        want = sorted(np_greedy(cost, 0.5))
        assert got == want


def test_greedy_match_masked(rng):
    cost = rng.uniform(0, 0.4, (4, 4)).astype(np.float32)
    row_valid = np.array([1, 1, 0, 0], bool)
    col_valid = np.array([1, 0, 1, 1], bool)
    row4col, col4row = A.greedy_match_arrays(cost, row_valid, col_valid, 0.5)
    col4row = np.asarray(col4row)
    assert (col4row[2:] == -1).all()
    assert np.asarray(row4col)[1] == -1
    want = np_greedy(np.where(np.outer(row_valid, col_valid), cost, 1e9), 0.5)
    got = sorted((i, int(j)) for i, j in enumerate(col4row) if j >= 0)
    assert got == sorted(want)


def test_fuse_motion():
    cost = np.array([[0.2, 0.4], [0.6, 0.8]], dtype=np.float32)
    m = np.array([[1.0, 20.0], [4.0, 9.0]], dtype=np.float32)
    got = np.asarray(A.fuse_motion(cost, m, 0.2))
    want = 0.8 * cost + 0.2 * m / A.CHI_SQ_INV_95
    want[0, 1] = A.INF_COST  # gated: 20 > 9.4877
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gate_cost():
    cost = np.array([[0.1, 0.9], [0.3, 0.2]], dtype=np.float32)
    rl = np.array([1, 2])
    cl = np.array([1, 1])
    got = np.asarray(A.gate_cost(cost, rl, cl, max_cost=0.5))
    assert got[0, 0] == pytest.approx(0.1)
    assert got[0, 1] == A.INF_COST  # cost gate
    assert got[1, 0] == A.INF_COST  # label gate
    assert got[1, 1] == A.INF_COST
    # without max_cost: only label gating
    got2 = np.asarray(A.gate_cost(cost, rl, cl))
    assert got2[0, 1] == pytest.approx(0.9)


@pytest.mark.parametrize("shape", [(6, 6), (12, 20), (40, 40), (64, 128)])
def test_auction_at_production_eps(rng, shape):
    """The cascade solves at eps_final=1e-2 (tracker._stage_core); the
    epsilon-scaling bound is total <= optimal + n_matched * eps. Run the
    scipy oracle at THAT tolerance, including near-tie matrices whose
    entries cluster within the eps window (the regime the coarser
    tolerance was justified on, docs/PERFORMANCE.md:54-74)."""
    eps = 1e-2
    for trial in range(4):
        cost = rng.uniform(0, 1, shape).astype(np.float32)
        if trial % 2:
            # near-tie regime: all finite entries within ~eps of 0.5
            cost = (0.5 + 0.4 * eps * rng.standard_normal(shape)
                    ).astype(np.float32)
        forbid = rng.uniform(size=shape) < 0.2
        cost[forbid] = A.INF_COST
        row4col, col4row = A.auction_lap(cost, eps_final=eps)
        col4row = np.asarray(col4row)

        ri, ci = linear_sum_assignment(np.minimum(cost, 1e3))
        ref_pairs = [(i, j) for i, j in zip(ri, ci)
                     if cost[i, j] < A.INF_COST]
        got_pairs = [(i, j) for i, j in enumerate(col4row) if j >= 0]
        assert len(got_pairs) == len(ref_pairs), (trial, shape)
        got = total_matched_cost(cost, col4row)
        ref = sum(cost[i, j] for i, j in ref_pairs)
        # 2*n*eps: the n*eps scaling bound holds for the padded SQUARE
        # problem; post-filtering forbidden pairs (matching.py:64-69
        # semantics) can shift the filtered total by up to ~n*eps more
        # (measured 1.03x n*eps worst case) — same convention as the
        # 1e-3 oracles above
        assert got <= ref + 2 * len(got_pairs) * eps + 1e-4, (trial, shape)


def test_auction_eps_unique_margin_exact(rng):
    """When the optimal assignment is unique by a margin > eps, the
    1e-2 auction must return scipy's EXACT pair set (this is the
    property the association parity oracle leans on)."""
    eps = 1e-2
    for trial in range(6):
        n = 10
        # costs on a coarse grid (0.05 spacing) => min swap margin 0.05
        cost = (rng.integers(1, 19, (n, n)) * 0.05).astype(np.float32)
        ri, ci = linear_sum_assignment(cost)
        ref = set(zip(ri.tolist(), ci.tolist()))
        # margin check: perturbing any matched pair costs > eps; skip
        # trials where scipy's optimum is not unique by that margin
        base = cost.copy()
        unique = True
        for i, j in ref:
            c2 = base.copy()
            c2[i, j] = A.INF_COST
            r2, cc2 = linear_sum_assignment(np.minimum(c2, 1e3))
            if sum(c2[a, b] for a, b in zip(r2, cc2)) <= \
                    sum(base[a, b] for a, b in ref) + eps:
                unique = False
        if not unique:
            continue
        _, col4row = A.auction_lap(cost, eps_final=eps)
        got = {(i, int(j)) for i, j in enumerate(np.asarray(col4row))
               if j >= 0}
        assert got == ref, trial
