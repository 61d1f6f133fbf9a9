"""Vectorized Kalman filter for bounding-box tracking.

Behavioral reference: fastmot/kalman_filter.py. Same model — 8-dim state
``[x1, y1, x2, y2, vx1, vy1, vx2, vy2]`` with a modified constant-velocity
transition (corner-velocity coupling + exponential velocity decay,
kalman_filter.py:294-306), size-proportional acceleration process noise
(:308-319), size-scaled measurement noise with per-source factors
(:321-336), and homography warp of mean + covariance for camera-motion
compensation (:227-292).

TPU-first inversions relative to the reference:
  * Every operation is written batch-polymorphically over leading dims:
    the same ``predict``/``update``/``warp`` run one state or the whole
    fixed-capacity track axis — the tracker runs one fused
    predict/update for *all* tracks per frame instead of a Python loop
    per track.
  * All covariance algebra is broadcast-multiply-reduce on the VPU
    (ops/smallmat.py) — a batched ``dot_general``/``linalg.solve`` over
    [T, 8, 8] tiles lowers to one MXU pass (or LU loop) PER TRACK on
    TPU, measured at ~11 ms per gap frame in round 2; the elementwise
    forms run in microseconds, in full float32 (better than the bf16
    matmul default, which corrupted the Mahalanobis gate in round 1).
  * The warp Jacobian is not hand-derived: the warp of the mean is a pure
    function (homography pushforward of the two corners and their
    velocities) and ``jax.jacfwd`` supplies the exact 8x8 Jacobian used
    for covariance propagation. This reproduces the reference's analytic
    F (kalman_filter.py:253-291) to machine precision.
  * float32 everywhere (the reference is float64 on CPU); the update step
    solves its 4x4 systems by statically unrolled Cholesky.
"""
from __future__ import annotations

import dataclasses
import enum


import jax
import jax.numpy as jnp
import numpy as np

from .ops import smallmat as sm


class MeasType(enum.Enum):
    FLOW = 0
    DETECTOR = 1


@dataclasses.dataclass(frozen=True)
class KalmanConfig:
    """Mirrors KalmanFilter's constructor defaults (kalman_filter.py:14-24)."""
    std_factor_acc: float = 2.25
    std_offset_acc: float = 78.5
    std_factor_det: tuple[float, float] = (0.08, 0.08)
    std_factor_klt: tuple[float, float] = (0.14, 0.14)
    min_std_det: tuple[float, float] = (4.0, 4.0)
    min_std_klt: tuple[float, float] = (5.0, 5.0)
    init_pos_weight: float = 5.0
    init_vel_weight: float = 12.0
    vel_coupling: float = 0.6
    vel_half_life: float = 2.0

    def __post_init__(self):
        assert self.std_factor_acc >= 0
        assert all(f >= 0 for f in self.std_factor_det)
        assert all(f >= 0 for f in self.std_factor_klt)
        assert all(f >= 0 for f in self.min_std_det)
        assert all(f >= 0 for f in self.min_std_klt)
        assert self.init_pos_weight >= 0
        assert self.init_vel_weight >= 0
        assert 0 <= self.vel_coupling <= 1
        assert self.vel_half_life > 0


def init_mats(cfg: KalmanConfig, dt: float) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build (acc_cov, meas_mat, trans_mat) from dt (kalman_filter.py:294-306).

    The transition couples each corner's position to a blend of its own
    velocity and the diagonally-opposite corner's velocity, and decays
    velocities with half-life ``vel_half_life`` seconds.

    Built in NumPy on purpose: the eager ``.at[].set`` construction this
    replaces dispatched ~60 one-element device ops per ``reset()``, each a
    full enqueue-RPC round trip (~100 ms per reset on the tunnel-attached
    dev chip). Callers ``jax.device_put`` the results once.
    """
    acc_cov = np.diag(np.array([0.25 * dt ** 4] * 4 + [dt ** 2] * 4,
                               dtype=np.float32))
    off = np.eye(4, dtype=np.float32) * (0.5 * dt ** 3)
    acc_cov[4:, :4] = off
    acc_cov[:4, 4:] = off

    meas_mat = np.eye(4, 8, dtype=np.float32)

    trans = np.eye(8, dtype=np.float32)
    for i in range(4):
        trans[i, i + 4] = cfg.vel_coupling * dt
        trans[i, (i + 2) % 4 + 4] = (1.0 - cfg.vel_coupling) * dt
        trans[i + 4, i + 4] = 0.5 ** (dt / cfg.vel_half_life)
    return acc_cov, meas_mat, trans


def _size(tlbr: jax.Array) -> tuple[jax.Array, jax.Array]:
    return (tlbr[..., 2] - tlbr[..., 0] + 1.0,
            tlbr[..., 3] - tlbr[..., 1] + 1.0)


def create(cfg: KalmanConfig, det_tlbr: jax.Array) -> tuple[jax.Array, jax.Array]:
    """State from an unassociated detection (kalman_filter.py:96-126).

    Batch-polymorphic: det_tlbr [..., 4] -> ([..., 8], [..., 8, 8]).
    """
    det_tlbr = det_tlbr.astype(jnp.float32)
    mean = jnp.concatenate([det_tlbr, jnp.zeros_like(det_tlbr)], axis=-1)
    w, h = _size(det_tlbr)
    sf = jnp.array([cfg.std_factor_det[0], cfg.std_factor_det[1]] * 4,
                   dtype=jnp.float32)
    wh = jnp.array([1.0, 0.0] * 4, dtype=jnp.float32) * w[..., None] + \
         jnp.array([0.0, 1.0] * 4, dtype=jnp.float32) * h[..., None]
    weight = jnp.array([cfg.init_pos_weight] * 4 + [cfg.init_vel_weight] * 4,
                       dtype=jnp.float32)
    min_std = jnp.array([cfg.min_std_det[0], cfg.min_std_det[1]] * 4,
                        dtype=jnp.float32)
    std = jnp.maximum(weight * sf * wh, min_std)
    cov = jnp.eye(8, dtype=jnp.float32) * (std * std)[..., None, :]
    return mean, cov


def predict(cfg: KalmanConfig, mean: jax.Array, cov: jax.Array,
            trans_mat: jax.Array, acc_cov: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Prediction step with size-scaled process noise (kalman_filter.py:308-319)."""
    w, h = _size(mean[..., :4])
    size = jnp.maximum(w, h)
    std = cfg.std_factor_acc * size + cfg.std_offset_acc
    motion_cov = acc_cov * (std * std)[..., None, None]
    mean = sm.bmv(trans_mat, mean)
    cov = sm.quad_form(trans_mat, cov) + motion_cov
    return mean, 0.5 * (cov + jnp.swapaxes(cov, -1, -2))


def _meas_std(cfg: KalmanConfig, mean4: jax.Array, meas_type_flow: jax.Array,
              multiplier) -> jax.Array:
    """Size-scaled measurement noise std, per source (kalman_filter.py:321-331).

    ``meas_type_flow`` is a traced boolean (True = FLOW, False = DETECTOR)
    so a single compiled update handles both measurement sources.
    Batch-polymorphic: mean4 [..., 4] -> [..., 4].
    """
    w = mean4[..., 2] - mean4[..., 0] + 1.0
    h = mean4[..., 3] - mean4[..., 1] + 1.0
    sf_w = jnp.where(meas_type_flow, cfg.std_factor_klt[0], cfg.std_factor_det[0])
    sf_h = jnp.where(meas_type_flow, cfg.std_factor_klt[1], cfg.std_factor_det[1])
    mn_w = jnp.where(meas_type_flow, cfg.min_std_klt[0], cfg.min_std_det[0])
    mn_h = jnp.where(meas_type_flow, cfg.min_std_klt[1], cfg.min_std_det[1])
    std = jnp.stack([jnp.maximum(sf_w * w, mn_w),
                     jnp.maximum(sf_h * h, mn_h),
                     jnp.maximum(sf_w * w, mn_w),
                     jnp.maximum(sf_h * h, mn_h)], axis=-1)
    return std * jnp.asarray(multiplier, jnp.float32)[..., None]


def project(cfg: KalmanConfig, mean: jax.Array, cov: jax.Array,
            meas_type_flow: jax.Array,
            multiplier=1.0) -> tuple[jax.Array, jax.Array]:
    """Project state to measurement space (kalman_filter.py:149-178, 321-336)."""
    std = _meas_std(cfg, mean[..., :4], meas_type_flow, multiplier)
    meas_cov = jnp.eye(4, dtype=jnp.float32) * (std * std)[..., None, :]
    proj_mean = mean[..., :4]
    proj_cov = cov[..., :4, :4] + meas_cov
    return proj_mean, proj_cov


def update(cfg: KalmanConfig, mean: jax.Array, cov: jax.Array,
           measurement: jax.Array, meas_type_flow: jax.Array,
           multiplier=1.0) -> tuple[jax.Array, jax.Array]:
    """Correction step (kalman_filter.py:180-204, 338-345).

    The 4x4 innovation system is solved by statically unrolled Cholesky
    (ops/smallmat.py) — batched jnp.linalg.solve loops per element on TPU.
    """
    proj_mean, proj_cov = project(cfg, mean, cov, meas_type_flow, multiplier)
    cov_ht = cov[..., :, :4]                  # cov @ meas_mat.T: [..., 8, 4]
    # kalman_gain [..., 8, 4]: solve proj_cov @ gain^T = cov_ht^T
    gain_t = sm.chol_solve4(proj_cov, jnp.swapaxes(cov_ht, -1, -2))
    gain = jnp.swapaxes(gain_t, -1, -2)
    innovation = measurement - proj_mean
    new_mean = mean + sm.bmv(gain, innovation)
    new_cov = cov - sm.quad_form(gain, proj_cov)
    return new_mean, new_cov


def maha_distance(cfg: KalmanConfig, mean: jax.Array, cov: jax.Array,
                  measurements: jax.Array) -> jax.Array:
    """Squared Mahalanobis distance of N measurements to one state's
    detector-space distribution (kalman_filter.py:206-225, 347-353)."""
    proj_mean, proj_cov = project(cfg, mean, cov, jnp.bool_(False))
    diff = measurements - proj_mean[None, :]
    return sm.maha_sq_chol4(proj_cov, diff.T)


def warp_mean_fn(mean: jax.Array, h_mat: jax.Array) -> jax.Array:
    """Homography pushforward of the 8-dim state mean.

    Each corner position p maps to g(p) = (A p + t) / (c.p + d) and its
    velocity maps through the Jacobian Dg(p) — exactly the transform the
    reference hand-derives (kalman_filter.py:227-292). Written as a pure
    function so ``jax.jacfwd`` provides the covariance Jacobian.
    """
    a_mat = h_mat[:2, :2]
    t_vec = h_mat[:2, 2]
    c_vec = h_mat[2, :2]
    d = 1.0  # cv2.findHomography normalizes H[2, 2] = 1 (reference uses 1.)

    def push(p, v):
        denom = c_vec @ p + d
        num = a_mat @ p + t_vec
        p2 = num / denom
        v2 = (a_mat @ v) / denom - num * (c_vec @ v) / (denom * denom)
        return p2, v2

    tl, br = mean[0:2], mean[2:4]
    vtl, vbr = mean[4:6], mean[6:8]
    tl2, vtl2 = push(tl, vtl)
    br2, vbr2 = push(br, vbr)
    return jnp.concatenate([tl2, br2, vtl2, vbr2])


def warp(mean: jax.Array, cov: jax.Array,
         h_mat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Warp state distribution by a homography; covariance via the exact
    Jacobian from forward-mode autodiff (kalman_filter.py:227-292)."""
    new_mean = warp_mean_fn(mean, h_mat)
    jac = jax.jacfwd(warp_mean_fn)(mean, h_mat)
    new_cov = sm.quad_form(jac, cov)
    return new_mean, new_cov


# ---------------------------------------------------------------------------
# Batched (track-axis) versions. Config is static; arrays carry the batch.
# All core ops above are batch-polymorphic (smallmat broadcast forms), so
# these stay thin: only the warp needs a vmap (for the per-track Jacobian).
# ---------------------------------------------------------------------------

def batched_create(cfg: KalmanConfig, det_tlbrs: jax.Array):
    """[N, 4] detections -> ([N, 8] means, [N, 8, 8] covariances)."""
    return create(cfg, det_tlbrs)


def batched_predict(cfg: KalmanConfig, means: jax.Array, covs: jax.Array,
                    trans_mat: jax.Array, acc_cov: jax.Array):
    return predict(cfg, means, covs, trans_mat, acc_cov)


def batched_update(cfg: KalmanConfig, means: jax.Array, covs: jax.Array,
                   measurements: jax.Array, meas_type_flow: jax.Array,
                   multipliers: jax.Array):
    """meas_type_flow and multipliers are per-track arrays."""
    return update(cfg, means, covs, measurements, meas_type_flow,
                  multipliers)


def batched_warp(means: jax.Array, covs: jax.Array, h_mat: jax.Array):
    new_means = jax.vmap(lambda m: warp_mean_fn(m, h_mat))(means)
    jac = jax.vmap(lambda m: jax.jacfwd(warp_mean_fn)(m, h_mat))(means)
    return new_means, sm.quad_form(jac, covs)


def batched_maha_distance(cfg: KalmanConfig, means: jax.Array, covs: jax.Array,
                          measurements: jax.Array) -> jax.Array:
    """[T] states x [N, 4] measurements -> [T, N] squared Mahalanobis."""
    proj_mean, proj_cov = project(cfg, means, covs, jnp.bool_(False))
    diff = measurements[None, :, :] - proj_mean[:, None, :]      # [T, N, 4]
    return sm.maha_sq_chol4(proj_cov, jnp.swapaxes(diff, -1, -2))


class KalmanFilter:
    """API-parity class mirroring the reference's public surface
    (fastmot/kalman_filter.py:13-226: create/predict/update/warp/
    motion_distance/reset_dt). The functional batched API above is the
    production path; this wrapper serves users of ``fastmot.KalmanFilter``
    (exported by fastmot/__init__.py:1-7), returning numpy arrays."""

    def __init__(self, **cfg_kwargs):
        self.cfg = KalmanConfig(**cfg_kwargs)
        self.reset_dt(1 / 30.0)

    def reset_dt(self, dt):
        """Recompute dt-dependent matrices (kalman_filter.py:86-94)."""
        self.dt = dt
        self.acc_cov, self.meas_mat, self.trans_mat = init_mats(self.cfg, dt)

    def create(self, det_tlbr):
        mean, cov = create(self.cfg, jnp.asarray(det_tlbr, jnp.float32))
        return np.asarray(mean), np.asarray(cov)

    def predict(self, mean, cov):
        mean, cov = predict(self.cfg, jnp.asarray(mean, jnp.float32),
                            jnp.asarray(cov, jnp.float32),
                            self.trans_mat, self.acc_cov)
        return np.asarray(mean), np.asarray(cov)

    def project(self, mean, cov, meas_type=MeasType.DETECTOR,
                multiplier=1.0):
        pm, pc = project(self.cfg, jnp.asarray(mean, jnp.float32),
                         jnp.asarray(cov, jnp.float32),
                         jnp.bool_(meas_type == MeasType.FLOW),
                         jnp.float32(multiplier))
        return np.asarray(pm), np.asarray(pc)

    def update(self, mean, cov, measurement, meas_type=MeasType.DETECTOR,
               multiplier=1.0):
        m, c = update(self.cfg, jnp.asarray(mean, jnp.float32),
                      jnp.asarray(cov, jnp.float32),
                      jnp.asarray(measurement, jnp.float32),
                      jnp.bool_(meas_type == MeasType.FLOW),
                      jnp.float32(multiplier))
        return np.asarray(m), np.asarray(c)

    def motion_distance(self, mean, cov, measurements):
        d = maha_distance(self.cfg, jnp.asarray(mean, jnp.float32),
                          jnp.asarray(cov, jnp.float32),
                          jnp.asarray(measurements, jnp.float32))
        return np.asarray(d)

    def warp(self, mean, cov, h_mat):
        m, c = warp(jnp.asarray(mean, jnp.float32),
                    jnp.asarray(cov, jnp.float32),
                    jnp.asarray(h_mat, jnp.float32))
        return np.asarray(m), np.asarray(c)
