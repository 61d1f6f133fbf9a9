"""Multi-object tracker: KLT + Kalman prediction and cascaded association.

Behavioral reference: fastmot/tracker.py (MultiTracker). The association
semantics are preserved exactly — age-cascaded appearance+motion matching,
IoU stages for active and unconfirmed tracks, greedy reID against track
history, duplicate rectification (tracker.py:185-293, 368-401) — but the
math is inverted for TPU:

  * All per-track Kalman work (homography warp, predict, KLT update,
    out-of-frame test) runs as ONE fused, fixed-shape jitted kernel over a
    padded track axis instead of a Python loop per track
    (vs tracker.py:164-183).
  * Both association cost matrices (fused appearance+motion cost and the
    IoU cost) are computed for ALL tracks x ALL detections in one jitted
    kernel; the cascade stages then run the on-device auction LAP over
    row/column validity masks of those fixed matrices — the "age depth
    buckets" of the reference become row masks, not separate matrices.
  * Dynamic shapes are bucketed to powers of two so XLA compiles a handful
    of kernel variants, not one per frame.

Host Python keeps only the genuinely dynamic bookkeeping: the track
dictionary, ID allocation, bounded reID history, and logging — the same
split the reference has between its Numba kernels and its Python shell.
"""
from __future__ import annotations

import logging
from collections import OrderedDict
from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from . import kalman as kf
from .flow import Flow
from .kalman import KalmanConfig
from .ops import assignment as asg
from .ops import distance as dist
from .ops import geometry as geom
from .track import Track

LOGGER = logging.getLogger(__name__)

MAX_TRACKS = 128
MAX_DETS = 128


def _bucket(n: int, lo: int = 8) -> int:
    """Round up to the next power of two (min ``lo``) so XLA compiles a
    bounded number of shape variants."""
    b = lo
    while b < n:
        b *= 2
    return b


def _cfg_kwargs(cfg) -> dict:
    if cfg is None:
        return {}
    if isinstance(cfg, SimpleNamespace):
        return vars(cfg)
    return dict(cfg)


# ---------------------------------------------------------------------------
# Fused device kernels (module level so jit caches are shared)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=('cfg',))
def _apply_kalman_kernel(cfg: KalmanConfig, means, covs, h_mat, trans, acc_cov,
                         klt_tlbrs, has_klt, multipliers, frame_tlbr):
    """warp -> predict -> (masked) KLT update -> rounded tlbr + IoS for all
    tracks at once (vs the loop at tracker.py:168-183)."""
    means, covs = kf.batched_warp(means, covs, h_mat)
    means, covs = kf.batched_predict(cfg, means, covs, trans, acc_cov)
    up_means, up_covs = kf.batched_update(
        cfg, means, covs, klt_tlbrs,
        jnp.ones(means.shape[0], dtype=bool), multipliers)
    means = jnp.where(has_klt[:, None], up_means, means)
    covs = jnp.where(has_klt[:, None, None], up_covs, covs)
    next_tlbrs = geom.as_tlbr(means[:, :4])
    ios_vals = geom.ios(next_tlbrs, jnp.broadcast_to(frame_tlbr, next_tlbrs.shape))
    return means, covs, next_tlbrs, ios_vals


@partial(jax.jit, static_argnames=('cfg', 'spec', 'age_penalty'))
def _chained_track_kernel(cfg: KalmanConfig, spec, age_penalty: float,
                          prev_gray, prev_pyr, prev_bg, cur_frame, seed,
                          means, covs, tlbrs, valid, ages, inl,
                          kps, kp_valid, trans, acc_cov, frame_tlbr):
    """Device-resident tracking-only frame: state chains on device across
    gap frames with ZERO per-frame host synchronization.

    Motivation (measured on this environment): D2H readback costs ~25 ms
    fixed latency per sync while the whole kernel executes in <1 ms — so
    the per-frame loop must never block on device data. The kernel derives
    the flow packing itself (the reference's near-to-far sort,
    flow.py:157, becomes an in-kernel argsort), runs corner management /
    LK / RANSAC / KF, applies the out-of-frame and camera-failure track
    clearing to the on-device validity mask, and returns (a) the chained
    state and (b) a small per-frame info bundle the host fetches
    asynchronously and applies to its Track mirrors at the next
    association frame.
    """
    from .ops import flow_kernels as fk

    cur_state = fk._preprocess_jit(spec, cur_frame)
    _, cur_pyr, _ = cur_state
    t_cap = means.shape[0]
    f_cap = fk.MAX_FLOW_TRACKS

    active = valid & (ages < 2)
    # near-to-far depth order (track.py:160-162): bottom-y desc, age asc
    key = -tlbrs[:, 3] + ages.astype(jnp.float32) * 1e-3
    key = jnp.where(active, key, jnp.inf)
    order = jnp.argsort(key)
    forder = order[:f_cap]
    f_valid = active[forder]
    f_tlbrs = tlbrs[forder]
    f_kps = kps[forder]
    f_kpv = kp_valid[forder] & f_valid[:, None]

    (h_ok, h_mat, bg_prev, bg_cur, bg_inlier, est, est_valid, inl_ratio,
     trk_prev, trk_cur, out_kp_valid) = fk.flow_step_core(
        spec, prev_gray, prev_pyr, prev_bg, cur_pyr,
        f_tlbrs, f_valid, f_kps, f_kpv, seed)

    # scatter flow results back to track-slot order
    pos = jnp.full(t_cap, f_cap, jnp.int32).at[forder].set(
        jnp.arange(f_cap, dtype=jnp.int32))
    in_flow = (pos < f_cap) & active
    slot = jnp.minimum(pos, f_cap - 1)
    has_klt = in_flow & est_valid[slot]
    klt_tlbrs = est[slot]
    new_inl = jnp.where(has_klt, inl_ratio[slot], inl)

    kps_new = jnp.where(in_flow[:, None, None], trk_cur[slot], kps)
    kpv_new = jnp.where(in_flow[:, None], out_kp_valid[slot], kp_valid)
    # tracks whose similarity fit failed lose their keypoints
    # (flow.py:242, 250, 257)
    kpv_new = jnp.where((in_flow & ~est_valid[slot])[:, None],
                        False, kpv_new)

    mult = jnp.maximum(age_penalty * ages.astype(jnp.float32), 1.0) / \
        jnp.maximum(new_inl, 1e-6)
    h_use = jnp.where(h_ok, h_mat.astype(jnp.float32),
                      jnp.eye(3, dtype=jnp.float32))
    means, covs = kf.batched_warp(means, covs, h_use)
    means, covs = kf.batched_predict(cfg, means, covs, trans, acc_cov)
    up_means, up_covs = kf.batched_update(
        cfg, means, covs, klt_tlbrs, jnp.ones(t_cap, dtype=bool), mult)
    means = jnp.where(has_klt[:, None], up_means, means)
    covs = jnp.where(has_klt[:, None, None], up_covs, covs)
    next_tlbrs = geom.as_tlbr(means[:, :4])
    ios_vals = geom.ios(next_tlbrs,
                        jnp.broadcast_to(frame_tlbr, next_tlbrs.shape))

    lost = valid & (ios_vals < 0.5)
    # camera-motion failure clears every track (tracker.py:160-162);
    # lost tracks leave the device set immediately (host moves its mirror
    # to reID history when it consumes the info)
    new_valid = jnp.where(h_ok, valid & ~lost, jnp.zeros_like(valid))
    kpv_new = kpv_new & h_ok & new_valid[:, None]
    new_tlbrs = jnp.where(valid[:, None], next_tlbrs, tlbrs)

    new_state = (means, covs, new_tlbrs, new_valid, ages, new_inl,
                 kps_new, kpv_new)
    info = (h_ok, h_mat, next_tlbrs, lost, has_klt, klt_tlbrs, new_inl,
            bg_prev, bg_cur, bg_inlier, means, covs, kps_new, kpv_new,
            est_valid[slot] & in_flow)
    return cur_state, new_state, info


@partial(jax.jit, static_argnames=('cfg', 'metric', 'n_depth', 'motion_weight',
                                   'max_assoc_cost', 'iou_gate', 'fill_val',
                                   'occlusion_thresh', 'conf_thresh',
                                   'max_reid_cost', 'dup_gate'))
def _cascade_kernel(cfg: KalmanConfig, metric: dist.Metric, n_depth: int,
                    motion_weight: float, max_assoc_cost: float,
                    iou_gate: float, fill_val: float,
                    occlusion_thresh: float, conf_thresh: float,
                    max_reid_cost: float, dup_gate: float,
                    t_feats, t_feat_invalid, t_labels, t_tlbrs, means, covs,
                    t_depth, t_confirmed, t_active, t_valid,
                    d_tlbrs, d_labels, d_conf, d_valid, d_embeddings,
                    h_feats, h_labels, h_valid):
    """The COMPLETE association cascade in one dispatch
    (tracker.py:185-247): occlusion mask, fused+IoU cost matrices, the
    age-depth auction cascade, IoU stages for active and unconfirmed
    tracks, greedy reID against history, and the duplicate-rectify greedy
    match. The depth buckets of the reference's Python loop become row
    masks over ONE fixed cost matrix; each stage's LAP threads the
    remaining-detections column mask to the next.

    Returns device arrays of decisions; the host applies them to its
    track objects (merge/reinstate/new-track bookkeeping).
    """
    occluded = geom.find_occluded(d_tlbrs, occlusion_thresh, d_valid)

    empty = t_feat_invalid[:, None] | occluded[None, :]
    cost = dist.cdist(t_feats, d_embeddings, metric,
                      empty_mask=empty, fill_val=fill_val)
    m_dist = kf.batched_maha_distance(cfg, means, covs, d_tlbrs)
    cost = asg.fuse_motion(cost, m_dist, motion_weight)
    cost = asg.gate_cost(cost, t_labels, d_labels, max_assoc_cost)

    iou_cost = dist.iou_dist(t_tlbrs, d_tlbrs)
    iou_cost = asg.gate_cost(iou_cost, t_labels, d_labels, iou_gate)

    t_idx = jnp.arange(t_tlbrs.shape[0])
    col4row_final = jnp.full(t_tlbrs.shape[0], -1, jnp.int32)
    u_det = d_valid

    # stage 1: age-cascaded matching over depth-bucket row masks
    for depth in range(n_depth):
        row_valid = t_valid & t_confirmed & (t_depth == depth)
        _, c4r = asg.auction_lap(cost, row_valid, u_det)
        matched = (c4r >= 0) & row_valid
        col4row_final = jnp.where(matched, c4r, col4row_final)
        taken = jnp.zeros_like(u_det).at[
            jnp.where(matched, c4r, u_det.shape[0])].set(True, mode='drop')
        u_det = u_det & ~taken

    # stage 2: IoU matching for remaining *active* confirmed tracks
    row_valid = t_valid & t_confirmed & t_active & (col4row_final < 0)
    _, c4r = asg.auction_lap(iou_cost, row_valid, u_det)
    matched = (c4r >= 0) & row_valid
    col4row_final = jnp.where(matched, c4r, col4row_final)
    taken = jnp.zeros_like(u_det).at[
        jnp.where(matched, c4r, u_det.shape[0])].set(True, mode='drop')
    u_det = u_det & ~taken

    # stage 3: IoU matching for unconfirmed tracks
    row_valid = t_valid & ~t_confirmed
    _, c4r = asg.auction_lap(iou_cost, row_valid, u_det)
    matched = (c4r >= 0) & row_valid
    col4row_final = jnp.where(matched, c4r, col4row_final)
    taken = jnp.zeros_like(u_det).at[
        jnp.where(matched, c4r, u_det.shape[0])].set(True, mode='drop')
    u_det = u_det & ~taken

    # reID against history (greedy, tracker.py:229-241)
    u_det_conf = u_det & (d_conf >= conf_thresh)
    reid_cols = u_det_conf & ~occluded
    reid_cost = dist.cdist(h_feats, d_embeddings, metric)
    reid_cost = asg.gate_cost(reid_cost, h_labels, d_labels)
    _, reid_c4r = asg.greedy_match_arrays(reid_cost, h_valid, reid_cols,
                                          max_reid_cost)

    # rectify candidates (tracker.py:368-387): greedy IoU between
    # unmatched-active-confirmed tracks and the boxes matched to
    # inactive tracks
    matched_mask = col4row_final >= 0
    inactive_matched = matched_mask & ~t_active
    u_active = t_valid & t_confirmed & t_active & ~matched_mask
    safe_col = jnp.where(matched_mask, col4row_final, 0)
    m_boxes = d_tlbrs[safe_col]                    # box per matched track
    rect_cost = dist.iou_dist(t_tlbrs, m_boxes)    # [T rows, T cols]
    _, rect_c4r = asg.greedy_match_arrays(rect_cost, u_active,
                                          inactive_matched, dup_gate)

    return (occluded, col4row_final, u_det_conf, reid_c4r, rect_c4r)


@partial(jax.jit, static_argnames=('cfg',))
def _post_assoc_kernel(cfg: KalmanConfig, m_means, m_covs, m_tlbrs,
                       c_tlbrs, frame_tlbr):
    """Post-association device work in one dispatch: batched KF detector
    correction for matched tracks (tracker.py:258-272) AND state creation
    for new + reinstated tracks (kf.create, tracker.py:249-256, 286-293).
    """
    n = m_means.shape[0]
    new_means, new_covs = kf.batched_update(
        cfg, m_means, m_covs, m_tlbrs, jnp.zeros(n, dtype=bool),
        jnp.ones(n, dtype=jnp.float32))
    next_tlbrs = geom.as_tlbr(new_means[:, :4])
    ios_vals = geom.ios(next_tlbrs,
                        jnp.broadcast_to(frame_tlbr, next_tlbrs.shape))
    cr_means, cr_covs = kf.batched_create(cfg, c_tlbrs)
    return new_means, new_covs, next_tlbrs, ios_vals, cr_means, cr_covs


@partial(jax.jit, static_argnames=('cfg',))
def _create_kernel(cfg: KalmanConfig, d_tlbrs):
    return kf.batched_create(cfg, d_tlbrs)


class MultiTracker:
    """Tracks multiple objects, associating detections by motion and
    appearance. Public surface matches the reference: ``tracks``,
    ``hist_tracks``, ``init/track/compute_flow/apply_kalman/update/reset``
    (tracker.py:18-135)."""

    def __init__(self, size, metric,
                 max_age=6,
                 age_penalty=2,
                 motion_weight=0.2,
                 max_assoc_cost=0.9,
                 max_reid_cost=0.45,
                 iou_thresh=0.4,
                 duplicate_thresh=0.8,
                 occlusion_thresh=0.7,
                 conf_thresh=0.5,
                 confirm_hits=1,
                 history_size=50,
                 kalman_filter_cfg=None,
                 flow_cfg=None):
        self.size = size
        self.metric = metric if isinstance(metric, dist.Metric) \
            else dist.Metric[str(metric).upper()]
        assert max_age >= 1
        self.max_age = max_age
        assert age_penalty >= 1
        self.age_penalty = age_penalty
        assert 0 <= motion_weight <= 1
        self.motion_weight = motion_weight
        assert 0 <= max_assoc_cost <= 2
        self.max_assoc_cost = max_assoc_cost
        assert 0 <= max_reid_cost <= 2
        self.max_reid_cost = max_reid_cost
        assert 0 <= iou_thresh <= 1
        self.iou_thresh = iou_thresh
        assert 0 <= duplicate_thresh <= 1
        self.duplicate_thresh = duplicate_thresh
        assert 0 <= occlusion_thresh <= 1
        self.occlusion_thresh = occlusion_thresh
        assert 0 <= conf_thresh <= 1
        self.conf_thresh = conf_thresh
        assert confirm_hits >= 1
        self.confirm_hits = confirm_hits
        assert history_size >= 0
        self.history_size = history_size
        self._hist_bucket = _bucket(max(history_size, 1))

        self.kf_cfg = KalmanConfig(**_cfg_kwargs(kalman_filter_cfg))
        self.tracks: dict[int, Track] = {}
        self.hist_tracks: OrderedDict[int, Track] = OrderedDict()
        self.flow = Flow(self.size, **_cfg_kwargs(flow_cfg))
        self.frame_rect = np.asarray(
            geom.to_tlbr(np.array([0, 0, *self.size], np.float32)))

        self.klt_bboxes: dict[int, np.ndarray] = {}
        self.homography = None

        # device-resident chained state (see track()/sync())
        self._dev_state = None
        self._slot_ids: list[int] = []
        self._pending: list = []

        self._dt = 1 / 30.0
        self._acc_cov, self._meas_mat, self._trans_mat = kf.init_mats(
            self.kf_cfg, self._dt)

    # -- lifecycle ---------------------------------------------------------

    def reset(self, dt):
        """Reset for a new input context (tracker.py:109-119)."""
        self._dt = dt
        self._acc_cov, self._meas_mat, self._trans_mat = kf.init_mats(
            self.kf_cfg, dt)
        self.hist_tracks.clear()
        Track._count = 0

    def init(self, frame, detections):
        """Initialize from detections in the first frame (tracker.py:121-137)."""
        self._pending = []
        self._invalidate_device_state()
        self.tracks.clear()
        self.flow.init(frame)
        n = min(len(detections), MAX_DETS)
        if n:
            tlbrs = np.zeros((MAX_DETS, 4), np.float32)
            tlbrs[:n] = detections.tlbr[:n]
            means, covs = _create_kernel(self.kf_cfg, jnp.asarray(tlbrs))
            means, covs = np.asarray(means), np.asarray(covs)
            for i, det in enumerate(detections[:n]):
                state = (means[i], covs[i])
                new_trk = Track(0, det.tlbr, state, det.label, self.confirm_hits)
                self.tracks[new_trk.trk_id] = new_trk
                LOGGER.debug(f"{'Detected:':<14}{new_trk}")

    def track(self, frame):
        """Tracking-only frame: one chained device dispatch, zero host
        syncs (vs compute_flow + apply_kalman, tracker.py:139-148).

        Per-frame info is fetched asynchronously and applied to the host
        Track mirrors by ``sync()`` (called automatically before the next
        association or by ``visible_tracks``-style consumers).
        """
        from .ops import flow_kernels as fk

        if self.flow.device_state is None:
            self.flow.init(frame)
            return
        if self._dev_state is None:
            self._upload_state()

        prev_gray, prev_pyr, prev_bg = self.flow.device_state
        cur_state, new_state, info = _chained_track_kernel(
            self.kf_cfg, self.flow.spec, float(self.age_penalty),
            prev_gray, prev_pyr, prev_bg, jnp.asarray(frame),
            jnp.uint32(self.flow.next_seed()),
            *self._dev_state, self._trans_mat, self._acc_cov,
            jnp.asarray(self.frame_rect, dtype=jnp.float32))
        self._dev_state = new_state
        self.flow.advance(cur_state)
        # kick off the device->host transfer in the background; it is
        # consumed (already complete) at the next sync point
        for leaf in jax.tree_util.tree_leaves(info):
            leaf.copy_to_host_async()
        self._pending.append((list(self._slot_ids), info))

    def sync(self):
        """Apply pending chained-frame results to the host Track mirrors
        (order-preserving; transfers were started asynchronously)."""
        pending, self._pending = self._pending, []
        for slot_ids, info in pending:
            (h_ok, h_mat, next_tlbrs, lost, has_klt, klt_tlbrs, new_inl,
             bg_prev, bg_cur, bg_inlier, means, covs, kps, kpv,
             est_ok) = jax.device_get(info)
            if not bool(h_ok):
                for trk in self.tracks.values():
                    trk.keypoints = np.empty((0, 2), np.float32)
                self.klt_bboxes = {}
                self.homography = None
                LOGGER.warning('Camera motion estimation failed')
                self.tracks.clear()
                continue
            self.homography = h_mat.astype(np.float64)
            keep = bg_inlier.astype(bool)
            self.flow.prev_bg_keypoints = bg_prev[keep]
            self.flow.bg_keypoints = bg_cur[keep]
            self.klt_bboxes = {}
            tl64 = next_tlbrs.astype(np.float64)
            for i, tid in enumerate(slot_ids):
                track = self.tracks.get(tid)
                if track is None:
                    continue
                kv = kpv[i].astype(bool)
                track.prev_keypoints = track.keypoints
                track.keypoints = kps[i][kv]
                if est_ok[i]:
                    self.klt_bboxes[tid] = klt_tlbrs[i].astype(np.float64)
                if has_klt[i]:
                    track.inlier_ratio = float(new_inl[i])
                track.update(tl64[i], (means[i], covs[i]))
                if lost[i]:
                    if track.confirmed:
                        LOGGER.info(f"{'Out:':<14}{track}")
                    self._mark_lost(tid)

    def _upload_state(self):
        """Pack the host Track mirrors into the device-resident state
        (one batched H2D; called at cycle boundaries)."""
        trk_ids = list(self.tracks.keys())[:MAX_TRACKS]
        from .ops import flow_kernels as fk
        k_cap = fk.KP_PER_TRACK
        means = np.zeros((MAX_TRACKS, 8), np.float32)
        covs = np.tile(np.eye(8, dtype=np.float32), (MAX_TRACKS, 1, 1))
        tlbrs = np.zeros((MAX_TRACKS, 4), np.float32)
        valid = np.zeros(MAX_TRACKS, bool)
        ages = np.zeros(MAX_TRACKS, np.int32)
        inl = np.ones(MAX_TRACKS, np.float32)
        kps = np.zeros((MAX_TRACKS, k_cap, 2), np.float32)
        kpv = np.zeros((MAX_TRACKS, k_cap), bool)
        for i, tid in enumerate(trk_ids):
            trk = self.tracks[tid]
            means[i], covs[i] = trk.state
            tlbrs[i] = trk.tlbr
            valid[i] = True
            ages[i] = trk.age
            inl[i] = trk.inlier_ratio
            k = min(len(trk.keypoints), k_cap)
            if k:
                kps[i, :k] = trk.keypoints[:k]
                kpv[i, :k] = True
        self._slot_ids = trk_ids
        self._dev_state = jax.device_put(
            (means, covs, tlbrs, valid, ages, inl, kps, kpv))

    def _invalidate_device_state(self):
        self._dev_state = None

    def compute_flow(self, frame):
        """KLT tracklet + camera motion estimation (tracker.py:150-162).

        API-parity path; the schedule-driven code path is ``track()``."""
        self.sync()
        self._invalidate_device_state()
        active_tracks = [t for t in self.tracks.values() if t.active]
        self.klt_bboxes, self.homography = self.flow.predict(frame, active_tracks)
        if self.homography is None:
            # clear tracks when camera motion cannot be estimated
            self.tracks.clear()

    def apply_kalman(self):
        """Batched warp/predict/update for every live track
        (tracker.py:164-183)."""
        if not self.tracks:
            return
        trk_ids = list(self.tracks.keys())[:MAX_TRACKS]
        n = len(trk_ids)
        b = MAX_TRACKS
        means = np.zeros((b, 8), np.float32)
        covs = np.tile(np.eye(8, dtype=np.float32), (b, 1, 1))
        klt_tlbrs = np.zeros((b, 4), np.float32)
        has_klt = np.zeros(b, bool)
        mult = np.ones(b, np.float32)
        for i, tid in enumerate(trk_ids):
            trk = self.tracks[tid]
            means[i], covs[i] = trk.state
            if tid in self.klt_bboxes:
                klt_tlbrs[i] = self.klt_bboxes[tid]
                has_klt[i] = True
                mult[i] = max(self.age_penalty * trk.age, 1) / trk.inlier_ratio

        h_mat = np.eye(3, dtype=np.float32) if self.homography is None \
            else np.asarray(self.homography, dtype=np.float32)
        new_means, new_covs, next_tlbrs, ios_vals = _apply_kalman_kernel(
            self.kf_cfg, jnp.asarray(means), jnp.asarray(covs),
            jnp.asarray(h_mat), self._trans_mat, self._acc_cov,
            jnp.asarray(klt_tlbrs), jnp.asarray(has_klt), jnp.asarray(mult),
            jnp.asarray(self.frame_rect, dtype=jnp.float32))
        new_means = np.asarray(new_means)
        new_covs = np.asarray(new_covs)
        next_tlbrs = np.asarray(next_tlbrs).astype(np.float64)
        ios_vals = np.asarray(ios_vals)

        for i, tid in enumerate(trk_ids):
            track = self.tracks[tid]
            track.update(next_tlbrs[i], (new_means[i], new_covs[i]))
            if ios_vals[i] < 0.5:
                if track.confirmed:
                    LOGGER.info(f"{'Out:':<14}{track}")
                self._mark_lost(tid)

    # -- association -------------------------------------------------------

    def update(self, frame_id, detections, embeddings):
        """Cascaded association of detections to tracklets
        (tracker.py:185-293) — the full cascade (occlusion mask, fused and
        IoU costs, age-depth auction stages, greedy reID, duplicate
        rectify) runs as ONE device dispatch (_cascade_kernel) with ONE
        batched readback; the host then applies the decisions to its
        Track objects."""
        self.sync()
        self._invalidate_device_state()

        n_det = min(len(detections), MAX_DETS)
        trk_ids = list(self.tracks.keys())[:MAX_TRACKS]
        n_trk = len(trk_ids)
        feat_dim = embeddings.shape[1] if embeddings is not None and \
            getattr(embeddings, 'ndim', 0) == 2 and embeddings.shape[0] else 512

        # ---- pack detections --------------------------------------------
        d_tlbrs = np.zeros((MAX_DETS, 4), np.float32)
        d_labels = np.full(MAX_DETS, -1, np.int32)
        d_conf = np.zeros(MAX_DETS, np.float32)
        d_valid = np.zeros(MAX_DETS, bool)
        d_emb = np.zeros((MAX_DETS, feat_dim), np.float32)
        if n_det:
            d_tlbrs[:n_det] = detections.tlbr[:n_det]
            d_labels[:n_det] = detections.label[:n_det]
            d_conf[:n_det] = detections.conf[:n_det]
            d_valid[:n_det] = True
            if embeddings is not None and len(embeddings):
                d_emb[:n_det] = embeddings[:n_det]

        # ---- pack tracks -------------------------------------------------
        t_feats = np.zeros((MAX_TRACKS, feat_dim), np.float32)
        t_feat_invalid = np.ones(MAX_TRACKS, bool)
        t_labels = np.full(MAX_TRACKS, -2, np.int32)
        t_tlbrs = np.zeros((MAX_TRACKS, 4), np.float32)
        means = np.zeros((MAX_TRACKS, 8), np.float32)
        covs = np.tile(np.eye(8, dtype=np.float32), (MAX_TRACKS, 1, 1))
        t_depth = np.zeros(MAX_TRACKS, np.int32)
        t_confirmed = np.zeros(MAX_TRACKS, bool)
        t_active = np.zeros(MAX_TRACKS, bool)
        t_valid = np.zeros(MAX_TRACKS, bool)
        group_size = 2
        for i, tid in enumerate(trk_ids):
            trk = self.tracks[tid]
            t_labels[i] = trk.label
            t_tlbrs[i] = trk.tlbr
            means[i], covs[i] = trk.state
            t_depth[i] = trk.age // group_size
            t_confirmed[i] = trk.confirmed
            t_active[i] = trk.active
            t_valid[i] = True
            if trk.avg_feat.is_valid():
                t_feats[i] = trk.avg_feat()
                t_feat_invalid[i] = False

        # ---- pack reID history ------------------------------------------
        hist_ids = [tid for tid, track in self.hist_tracks.items()
                    if track.avg_feat.count >= 2][:self._hist_bucket]
        hb = self._hist_bucket
        h_feats = np.zeros((hb, feat_dim), np.float32)
        h_labels = np.full(hb, -2, np.int32)
        h_valid = np.zeros(hb, bool)
        for i, tid in enumerate(hist_ids):
            h_feats[i] = self.hist_tracks[tid].avg_feat()
            h_labels[i] = self.hist_tracks[tid].label
            h_valid[i] = True

        n_depth = (self.max_age + group_size) // group_size
        fill_val = min(self.max_assoc_cost + 0.1, 1.0)
        out = _cascade_kernel(
            self.kf_cfg, self.metric, n_depth, self.motion_weight,
            self.max_assoc_cost, 1.0 - self.iou_thresh, fill_val,
            self.occlusion_thresh, self.conf_thresh, self.max_reid_cost,
            1.0 - self.duplicate_thresh,
            jnp.asarray(t_feats), jnp.asarray(t_feat_invalid),
            jnp.asarray(t_labels), jnp.asarray(t_tlbrs),
            jnp.asarray(means), jnp.asarray(covs),
            jnp.asarray(t_depth), jnp.asarray(t_confirmed),
            jnp.asarray(t_active), jnp.asarray(t_valid),
            jnp.asarray(d_tlbrs), jnp.asarray(d_labels),
            jnp.asarray(d_conf), jnp.asarray(d_valid), jnp.asarray(d_emb),
            jnp.asarray(h_feats), jnp.asarray(h_labels), jnp.asarray(h_valid))
        occluded, col4row, u_det_conf, reid_c4r, rect_c4r = jax.device_get(out)

        matches = set()
        u_trk_ids = set()
        for i, tid in enumerate(trk_ids):
            if col4row[i] >= 0:
                matches.add((tid, int(col4row[i])))
            else:
                u_trk_ids.add(tid)

        # ---- reID decisions ----------------------------------------------
        reid_matches = []
        reid_taken = set()
        for i, tid in enumerate(hist_ids):
            j = int(reid_c4r[i])
            if j >= 0:
                reid_matches.append((tid, j))
                reid_taken.add(j)
        invalid_u_det_ids = [int(j) for j in np.flatnonzero(u_det_conf & occluded)]
        reid_u_det_ids = [int(j) for j in np.flatnonzero(u_det_conf & ~occluded)
                          if j not in reid_taken]

        # ---- rectify duplicate-prone matches (tracker.py:387-401) --------
        col_of = {tid: int(col4row[i]) for i, tid in enumerate(trk_ids)
                  if col4row[i] >= 0}
        for i, u_tid in enumerate(trk_ids):
            jcol = int(rect_c4r[i])
            if jcol < 0:
                continue
            m_trk_id = trk_ids[jcol]
            det_id = col_of.get(m_trk_id)
            if det_id is None or u_tid not in u_trk_ids:
                continue
            t_u_active = self.tracks[u_tid]
            t_m_inactive = self.tracks[m_trk_id]
            if t_m_inactive.end_frame < t_u_active.start_frame:
                LOGGER.debug(f"{'Merged:':<14}{u_tid} -> {m_trk_id}")
                t_m_inactive.merge_continuation(t_u_active)
                u_trk_ids.discard(u_tid)
                del self.tracks[u_tid]
            else:
                LOGGER.debug(f"{'Duplicate:':<14}{m_trk_id} -> {u_tid}")
                u_trk_ids.discard(u_tid)
                u_trk_ids.add(m_trk_id)
                matches.discard((m_trk_id, det_id))
                matches.add((u_tid, det_id))

        # ---- one post-association dispatch: matched KF updates + creates
        matches = list(matches)
        reid_det_ids = [j for _, j in reid_matches]
        new_det_ids = invalid_u_det_ids + reid_u_det_ids
        create_ids = reid_det_ids + new_det_ids
        m_means = np.zeros((MAX_TRACKS, 8), np.float32)
        m_covs = np.tile(np.eye(8, dtype=np.float32), (MAX_TRACKS, 1, 1))
        m_tlbrs = np.zeros((MAX_TRACKS, 4), np.float32)
        for k, (tid, j) in enumerate(matches):
            m_means[k], m_covs[k] = self.tracks[tid].state
            m_tlbrs[k] = d_tlbrs[j]
        c_tlbrs = np.zeros((MAX_DETS, 4), np.float32)
        c_tlbrs[:len(create_ids)] = d_tlbrs[create_ids]
        post = _post_assoc_kernel(
            self.kf_cfg, jnp.asarray(m_means), jnp.asarray(m_covs),
            jnp.asarray(m_tlbrs),
            jnp.asarray(c_tlbrs),
            jnp.asarray(self.frame_rect, dtype=jnp.float32))
        (new_means, new_covs, next_tlbrs, ios_vals,
         cr_means, cr_covs) = jax.device_get(post)
        next_tlbrs = next_tlbrs.astype(np.float64)

        # ---- reinstate reID matches --------------------------------------
        for k, (tid, det_id) in enumerate(reid_matches):
            track = self.hist_tracks.pop(tid)
            LOGGER.info(f"{'Reidentified:':<14}{track}")
            state = (cr_means[k], cr_covs[k])
            track.reinstate(frame_id, d_tlbrs[det_id].astype(np.float64),
                            state, d_emb[det_id])
            self.tracks[tid] = track

        # ---- update matched tracks ---------------------------------------
        for k, (tid, det_id) in enumerate(matches):
            track = self.tracks[tid]
            is_valid = not occluded[det_id]
            if track.hits == self.confirm_hits - 1:
                LOGGER.info(f"{'Found:':<14}{track}")
            if ios_vals[k] < 0.5:
                is_valid = False
                if track.confirmed:
                    LOGGER.info(f"{'Out:':<14}{track}")
                self._mark_lost(tid)
            track.add_detection(frame_id, next_tlbrs[k],
                                (new_means[k], new_covs[k]),
                                d_emb[det_id], is_valid)

        # ---- clean up lost tracks ----------------------------------------
        for tid in u_trk_ids:
            track = self.tracks[tid]
            track.mark_missed()
            if not track.confirmed:
                LOGGER.debug(f"{'Unconfirmed:':<14}{track}")
                del self.tracks[tid]
                continue
            if track.age > self.max_age:
                LOGGER.info(f"{'Lost:':<14}{track}")
                self._mark_lost(tid)

        # ---- start new tracks --------------------------------------------
        for k, det_id in enumerate(new_det_ids):
            state = (cr_means[len(reid_det_ids) + k],
                     cr_covs[len(reid_det_ids) + k])
            new_trk = Track(frame_id, d_tlbrs[det_id].astype(np.float64),
                            state, int(d_labels[det_id]), self.confirm_hits)
            self.tracks[new_trk.trk_id] = new_trk
            LOGGER.debug(f"{'Detected:':<14}{new_trk}")


    def _mark_lost(self, trk_id):
        track = self.tracks.pop(trk_id)
        if track.confirmed:
            self.hist_tracks[trk_id] = track
            if len(self.hist_tracks) > self.history_size:
                self.hist_tracks.popitem(last=False)

    def _group_tracks_by_depth(self, group_size=2):
        n_depth = (self.max_age + group_size) // group_size
        confirmed_by_depth = [[] for _ in range(n_depth)]
        unconfirmed = []
        for trk_id, track in self.tracks.items():
            if track.confirmed:
                confirmed_by_depth[track.age // group_size].append(trk_id)
            else:
                unconfirmed.append(trk_id)
        return confirmed_by_depth, unconfirmed

