"""Vectorized Kalman filter vs a float64 numpy oracle of the reference's
model (kalman_filter.py: coupled-velocity transition, size-scaled noise,
homography warp with analytic Jacobian)."""
import numpy as np
import pytest

from fastmot_tpu import kalman as K

CFG = K.KalmanConfig()
DT = 1 / 30.0


# --- numpy float64 oracle -------------------------------------------------

def np_init_mats(cfg, dt):
    acc_cov = np.diag([0.25 * dt ** 4] * 4 + [dt ** 2] * 4)
    acc_cov[4:, :4] = np.eye(4) * (0.5 * dt ** 3)
    acc_cov[:4, 4:] = np.eye(4) * (0.5 * dt ** 3)
    meas_mat = np.eye(4, 8)
    trans = np.eye(8)
    for i in range(4):
        trans[i, i + 4] = cfg.vel_coupling * dt
        trans[i, (i + 2) % 4 + 4] = (1 - cfg.vel_coupling) * dt
        trans[i + 4, i + 4] = 0.5 ** (dt / cfg.vel_half_life)
    return acc_cov, meas_mat, trans


def np_create(cfg, tlbr):
    mean = np.r_[tlbr, np.zeros(4)]
    w = tlbr[2] - tlbr[0] + 1
    h = tlbr[3] - tlbr[1] + 1
    std = np.array([
        max(cfg.init_pos_weight * cfg.std_factor_det[0] * w, cfg.min_std_det[0]),
        max(cfg.init_pos_weight * cfg.std_factor_det[1] * h, cfg.min_std_det[1]),
        max(cfg.init_pos_weight * cfg.std_factor_det[0] * w, cfg.min_std_det[0]),
        max(cfg.init_pos_weight * cfg.std_factor_det[1] * h, cfg.min_std_det[1]),
        max(cfg.init_vel_weight * cfg.std_factor_det[0] * w, cfg.min_std_det[0]),
        max(cfg.init_vel_weight * cfg.std_factor_det[1] * h, cfg.min_std_det[1]),
        max(cfg.init_vel_weight * cfg.std_factor_det[0] * w, cfg.min_std_det[0]),
        max(cfg.init_vel_weight * cfg.std_factor_det[1] * h, cfg.min_std_det[1]),
    ])
    return mean, np.diag(std ** 2)


def np_predict(cfg, mean, cov, trans, acc_cov):
    w = mean[2] - mean[0] + 1
    h = mean[3] - mean[1] + 1
    std = cfg.std_factor_acc * max(w, h) + cfg.std_offset_acc
    motion_cov = acc_cov * std ** 2
    mean = trans @ mean
    cov = trans @ cov @ trans.T + motion_cov
    return mean, 0.5 * (cov + cov.T)


def np_project(cfg, mean, cov, flow, mult=1.0):
    sf = cfg.std_factor_klt if flow else cfg.std_factor_det
    mn = cfg.min_std_klt if flow else cfg.min_std_det
    w = mean[2] - mean[0] + 1
    h = mean[3] - mean[1] + 1
    std = np.array([max(sf[0] * w, mn[0]), max(sf[1] * h, mn[1]),
                    max(sf[0] * w, mn[0]), max(sf[1] * h, mn[1])])
    meas_cov = np.diag((std * mult) ** 2)
    return mean[:4], cov[:4, :4] + meas_cov


def np_update(cfg, mean, cov, z, flow, mult=1.0):
    pm, pc = np_project(cfg, mean, cov, flow, mult)
    gain = np.linalg.solve(pc, cov[:, :4].T).T
    mean = mean + gain @ (z - pm)
    cov = cov - gain @ pc @ gain.T
    return mean, cov


def np_maha(cfg, mean, cov, zs):
    pm, pc = np_project(cfg, mean, cov, False)
    diff = zs - pm
    L = np.linalg.cholesky(pc)
    y = np.linalg.solve(L, diff.T)
    return np.sum(y ** 2, axis=0)


def np_warp(mean, cov, H):
    """Oracle via numeric differentiation of the pushforward map."""
    A, t, c = H[:2, :2], H[:2, 2], H[2, :2]

    def f(x):
        out = np.empty(8)
        for (ps, vs) in [((0, 2), (4, 6)), ((2, 4), (6, 8))]:
            p = x[ps[0]:ps[1]]
            v = x[vs[0]:vs[1]]
            denom = c @ p + 1.0
            num = A @ p + t
            out[ps[0]:ps[1]] = num / denom
            out[vs[0]:vs[1]] = (A @ v) / denom - num * (c @ v) / denom ** 2
        return out

    new_mean = f(mean)
    eps = 1e-5
    J = np.empty((8, 8))
    for k in range(8):
        d = np.zeros(8)
        d[k] = eps
        J[:, k] = (f(mean + d) - f(mean - d)) / (2 * eps)
    return new_mean, J @ cov @ J.T


# --- tests ----------------------------------------------------------------

def sample_state(rng):
    tlbr = np.array([100.0, 120.0, 180.0, 300.0]) + rng.uniform(-5, 5, 4)
    mean, cov = np_create(CFG, tlbr)
    mean[4:] = rng.uniform(-3, 3, 4)
    return mean, cov


def test_init_mats():
    acc, meas, trans = (np.asarray(m) for m in K.init_mats(CFG, DT))
    a, m, t = np_init_mats(CFG, DT)
    np.testing.assert_allclose(acc, a, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(meas, m)
    np.testing.assert_allclose(trans, t, rtol=1e-6)


def test_create(rng):
    tlbr = np.array([10.0, 20.0, 110.0, 240.0], dtype=np.float32)
    mean, cov = K.create(CFG, tlbr)
    m, c = np_create(CFG, tlbr.astype(np.float64))
    np.testing.assert_allclose(np.asarray(mean), m, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), c, rtol=1e-5)


def test_predict(rng):
    acc, _, trans = K.init_mats(CFG, DT)
    a, _, t = np_init_mats(CFG, DT)
    mean, cov = sample_state(rng)
    gm, gc = K.predict(CFG, mean.astype(np.float32), cov.astype(np.float32),
                       trans, acc)
    wm, wc = np_predict(CFG, mean, cov, t, a)
    np.testing.assert_allclose(np.asarray(gm), wm, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gc), wc, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("flow,mult", [(False, 1.0), (True, 1.0), (True, 3.5)])
def test_update(rng, flow, mult):
    mean, cov = sample_state(rng)
    z = mean[:4] + rng.uniform(-8, 8, 4)
    gm, gc = K.update(CFG, mean.astype(np.float32), cov.astype(np.float32),
                      z.astype(np.float32), np.bool_(flow), np.float32(mult))
    wm, wc = np_update(CFG, mean, cov, z, flow, mult)
    np.testing.assert_allclose(np.asarray(gm), wm, rtol=1e-4, atol=1e-2)
    # float32 covariances carry ~1e-3 relative error at this scale
    np.testing.assert_allclose(np.asarray(gc), wc, rtol=2e-2, atol=1.0)


def test_maha(rng):
    mean, cov = sample_state(rng)
    zs = mean[None, :4] + rng.uniform(-30, 30, (6, 4))
    got = np.asarray(K.maha_distance(CFG, mean.astype(np.float32),
                                     cov.astype(np.float32),
                                     zs.astype(np.float32)))
    want = np_maha(CFG, mean, cov, zs)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


def test_warp(rng):
    mean, cov = sample_state(rng)
    # a realistic small camera motion homography
    H = np.array([[1.01, 0.002, 3.0],
                  [-0.001, 0.998, -2.0],
                  [1e-6, -2e-6, 1.0]])
    gm, gc = K.warp(mean.astype(np.float32), cov.astype(np.float32),
                    H.astype(np.float32))
    wm, wc = np_warp(mean, cov, H)
    np.testing.assert_allclose(np.asarray(gm), wm, rtol=1e-4, atol=1e-2)
    # float32 + autodiff Jacobian: ~5e-3 relative at this covariance scale
    np.testing.assert_allclose(np.asarray(gc), wc, rtol=3e-2, atol=2.0)


def test_batched_consistency(rng):
    """Batched ops must equal per-track ops."""
    n = 5
    means = np.stack([sample_state(rng)[0] for _ in range(n)]).astype(np.float32)
    covs = np.stack([sample_state(rng)[1] for _ in range(n)]).astype(np.float32)
    acc, _, trans = K.init_mats(CFG, DT)
    bm, bc = K.batched_predict(CFG, means, covs, trans, acc)
    for i in range(n):
        sm, sc = K.predict(CFG, means[i], covs[i], trans, acc)
        np.testing.assert_allclose(np.asarray(bm[i]), np.asarray(sm), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(bc[i]), np.asarray(sc), rtol=1e-6)

    zs = means[:, :4] + 2.0
    flows = np.array([True, False, True, False, True])
    mults = np.ones(n, np.float32)
    bm, bc = K.batched_update(CFG, means, covs, zs, flows, mults)
    for i in range(n):
        sm, sc = K.update(CFG, means[i], covs[i], zs[i],
                          np.bool_(flows[i]), np.float32(1.0))
        np.testing.assert_allclose(np.asarray(bm[i]), np.asarray(sm), rtol=1e-4,
                                   atol=1e-2)
        np.testing.assert_allclose(np.asarray(bc[i]), np.asarray(sc), rtol=1e-3,
                                   atol=1.0)
