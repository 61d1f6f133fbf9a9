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
