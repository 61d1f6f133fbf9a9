"""MOT metrics harness tests against hand-computed small cases."""
import numpy as np
import pytest

from fastmot_tpu.eval import MotMetrics, evaluate, load_mot


def frames_from_rows(rows, gt=False):
    return load_mot(np.array(rows, float), gt=gt)


def test_perfect_tracking():
    rows = [[f, 1, 10 + f, 20, 50, 100, 1, 1, 1.0] for f in range(1, 11)]
    gt = frames_from_rows(rows, gt=True)
    res = frames_from_rows([[f, 7, 10 + f, 20, 50, 100, 1] for f in range(1, 11)])
    m = evaluate(gt, res)
    assert m.mota == pytest.approx(1.0)
    assert m.idf1 == pytest.approx(1.0)
    assert m.motp == pytest.approx(1.0)
    assert m.idsw == 0 and m.fp == 0 and m.fn == 0
    assert m.mt == 1 and m.ml == 0


def test_missed_and_false_positives():
    gt = frames_from_rows([[f, 1, 10, 20, 50, 100, 1, 1, 1] for f in (1, 2, 3, 4)],
                          gt=True)
    # tracker only covers frames 1-2 and adds a spurious box in frame 3
    res = frames_from_rows([[1, 5, 10, 20, 50, 100, 1],
                            [2, 5, 10, 20, 50, 100, 1],
                            [3, 6, 400, 300, 40, 80, 1]])
    m = evaluate(gt, res)
    # 4 gt boxes: 2 matched, 2 FN, 1 FP, 0 IDSW -> MOTA = 1 - 3/4
    assert m.fn == 2 and m.fp == 1 and m.idsw == 0
    assert m.mota == pytest.approx(1 - 3 / 4)


def test_id_switch_counted():
    gt = frames_from_rows([[f, 1, 10, 20, 50, 100, 1, 1, 1] for f in (1, 2, 3)],
                          gt=True)
    res = frames_from_rows([[1, 5, 10, 20, 50, 100, 1],
                            [2, 5, 10, 20, 50, 100, 1],
                            [3, 9, 10, 20, 50, 100, 1]])
    m = evaluate(gt, res)
    assert m.idsw == 1
    assert m.mota == pytest.approx(1 - 1 / 3)
    # IDF1: best global match is gt1<->res5 (2 frames):
    # IDTP=2, IDFN=1, IDFP=1 -> IDF1 = 4/6
    assert m.idf1 == pytest.approx(4 / 6)


def test_continuity_preference_avoids_greedy_switch():
    """The CLEAR rule keeps an existing match even if a new hypothesis has
    marginally higher IoU."""
    gt = frames_from_rows([[1, 1, 10, 20, 50, 100, 1, 1, 1],
                           [2, 1, 10, 20, 50, 100, 1, 1, 1]], gt=True)
    res = frames_from_rows([
        [1, 5, 10, 20, 50, 100, 1],
        [2, 5, 12, 20, 50, 100, 1],    # previous match, slightly offset
        [2, 6, 10, 20, 50, 100, 1],    # perfect-IoU newcomer
    ])
    m = evaluate(gt, res)
    assert m.idsw == 0
    assert m.fp == 1  # the newcomer is unmatched


def test_mt_ml():
    # traj 1 covered 100%, traj 2 covered 10%
    gt_rows = [[f, 1, 10, 20, 50, 100, 1, 1, 1] for f in range(1, 11)]
    gt_rows += [[f, 2, 300, 200, 50, 100, 1, 1, 1] for f in range(1, 11)]
    gt = frames_from_rows(gt_rows, gt=True)
    res_rows = [[f, 5, 10, 20, 50, 100, 1] for f in range(1, 11)]
    res_rows += [[1, 6, 300, 200, 50, 100, 1]]
    res = frames_from_rows(res_rows)
    m = evaluate(gt, res)
    assert m.mt == 1 and m.ml == 1


def test_idf1_independent_of_clear_continuity():
    """Ristani IDF1 counts (gt, res) co-occurrence at IoU >= 0.5 globally,
    NOT just CLEAR-selected pairs. gt 1 is covered by res 9 on ALL 10
    frames (IoU ~0.85); res 5 covers it exactly on frames 1-2 only, so
    the CLEAR matcher prefers res 5 there (higher IoU + continuity) and
    only matches res 9 on frames 3-10. The global trajectory bipartite
    must still credit gt1<->res9 with all 10 frames:
    IDTP=10, IDFP=12-10=2, IDFN=0 -> IDF1 = 20/22. (The old
    CLEAR-coupled accumulation gave IDTP=8 -> IDF1 = 16/22.)"""
    gt = frames_from_rows(
        [[f, 1, 10, 20, 50, 100, 1, 1, 1] for f in range(1, 11)], gt=True)
    res_rows = [[f, 9, 14, 20, 50, 100, 1] for f in range(1, 11)]
    res_rows += [[1, 5, 10, 20, 50, 100, 1], [2, 5, 10, 20, 50, 100, 1]]
    res = frames_from_rows(res_rows)
    m = evaluate(gt, res)
    assert m.idf1 == pytest.approx(20 / 22)
    # CLEAR metrics unchanged by the IDF1 fix: 2 FPs (res 9 unmatched on
    # frames 1-2), one switch when gt 1 hops res5 -> res9 at frame 3
    assert m.fp == 2 and m.fn == 0 and m.idsw == 1


def test_idf1_duplicate_ghost_counts_as_idfp_only():
    """A duplicate ghost track overlapping the same gt must not add IDTP
    (one-one trajectory bipartite) but adds IDFP mass."""
    gt = frames_from_rows(
        [[f, 1, 10, 20, 50, 100, 1, 1, 1] for f in range(1, 6)], gt=True)
    res_rows = [[f, 2, 10, 20, 50, 100, 1] for f in range(1, 6)]
    res_rows += [[f, 3, 12, 20, 50, 100, 1] for f in range(1, 6)]
    res = frames_from_rows(res_rows)
    m = evaluate(gt, res)
    # idtp = 5 (gt1<->res2); idfp = 10 - 5; idfn = 0
    assert m.idf1 == pytest.approx(10 / 15)
