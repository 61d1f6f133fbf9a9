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


@partial(jax.jit, static_argnames=('cfg', 'spec', 'age_penalty'),
         donate_argnums=())
def _fused_track_kernel(cfg: KalmanConfig, spec, age_penalty: float,
                        prev_gray, prev_pyr, prev_bg, cur_frame,
                        f_tlbrs, f_valid, f_kps, f_kp_valid, seed,
                        means, covs, flow_slot, ages, stored_inl,
                        trans, acc_cov, frame_tlbr):
    """The whole tracking-only frame in ONE dispatch (mot.py:162-164 path,
    which runs N-1 of every N frames): frame preprocess -> corner
    management -> pyramidal LK -> camera-motion RANSAC -> per-track
    similarity fits -> KF warp/predict/KLT-update -> out-of-frame IoS.

    The reference overlaps CPU flow with GPU inference here; on TPU both
    live in the same graph so XLA schedules them, and the host pays one
    dispatch + one small readback per frame.
    """
    from .ops import flow_kernels as fk

    cur_state = fk._preprocess_jit(spec, cur_frame)
    cur_gray, cur_pyr, cur_bg = cur_state
    (h_ok, h_mat, bg_prev, bg_cur, bg_inlier, est, est_valid, inl_ratio,
     trk_prev, trk_cur, out_kp_valid) = fk.flow_step_core(
        spec, prev_gray, prev_pyr, prev_bg, cur_pyr,
        f_tlbrs, f_valid, f_kps, f_kp_valid, seed)

    # gather flow results into KF track order
    slot = jnp.maximum(flow_slot, 0)
    has_klt = (flow_slot >= 0) & est_valid[slot]
    klt_tlbrs = est[slot]
    new_inl = jnp.where(has_klt, inl_ratio[slot], stored_inl)
    mult = jnp.maximum(age_penalty * ages.astype(jnp.float32), 1.0) / \
        jnp.maximum(new_inl, 1e-6)

    h_use = jnp.where(h_ok, h_mat, jnp.eye(3, dtype=h_mat.dtype))
    means, covs = kf.batched_warp(means, covs, h_use.astype(jnp.float32))
    means, covs = kf.batched_predict(cfg, means, covs, trans, acc_cov)
    up_means, up_covs = kf.batched_update(
        cfg, means, covs, klt_tlbrs, jnp.ones(means.shape[0], dtype=bool),
        mult)
    means = jnp.where(has_klt[:, None], up_means, means)
    covs = jnp.where(has_klt[:, None, None], up_covs, covs)
    next_tlbrs = geom.as_tlbr(means[:, :4])
    ios_vals = geom.ios(next_tlbrs,
                        jnp.broadcast_to(frame_tlbr, next_tlbrs.shape))

    return (cur_state, h_ok, h_mat, bg_prev, bg_cur, bg_inlier,
            est, est_valid, new_inl, trk_prev, trk_cur, out_kp_valid,
            means, covs, next_tlbrs, ios_vals, has_klt)


@partial(jax.jit, static_argnames=('cfg', 'metric', 'motion_weight',
                                   'max_assoc_cost', 'iou_gate', 'fill_val'))
def _assoc_costs(cfg: KalmanConfig, metric: dist.Metric, motion_weight: float,
                 max_assoc_cost: float, iou_gate: float, fill_val: float,
                 t_feats, t_feat_invalid, t_labels, t_tlbrs, means, covs,
                 d_tlbrs, d_labels, d_occluded, d_embeddings):
    """Both association cost matrices over the full padded grid.

    ``full_cost``: masked cdist of track average features vs detection
    embeddings, fused with chi-square-normalized Mahalanobis motion
    distance and gated by label + max_assoc_cost (tracker.py:314-341).
    ``iou_cost``: 1 - IoU gated by label + (1 - iou_thresh)
    (tracker.py:343-353).
    """
    empty = t_feat_invalid[:, None] | d_occluded[None, :]
    cost = dist.cdist(t_feats, d_embeddings, metric,
                      empty_mask=empty, fill_val=fill_val)
    m_dist = kf.batched_maha_distance(cfg, means, covs, d_tlbrs)
    cost = asg.fuse_motion(cost, m_dist, motion_weight)
    cost = asg.gate_cost(cost, t_labels, d_labels, max_assoc_cost)

    iou_cost = dist.iou_dist(t_tlbrs, d_tlbrs)
    iou_cost = asg.gate_cost(iou_cost, t_labels, d_labels, iou_gate)
    return cost, iou_cost


@partial(jax.jit, static_argnames=('metric',))
def _reid_cost_kernel(metric: dist.Metric, h_feats, h_labels,
                      d_embeddings, d_labels):
    """Appearance cost vs track history, label-gated (tracker.py:355-366)."""
    cost = dist.cdist(h_feats, d_embeddings, metric)
    return asg.gate_cost(cost, h_labels, d_labels)


@partial(jax.jit, static_argnames=('cfg',))
def _detector_update_kernel(cfg: KalmanConfig, means, covs, d_tlbrs,
                            frame_tlbr):
    """Batched KF correction with detector measurements + rounded tlbr +
    IoS with the frame (tracker.py:258-272)."""
    n = means.shape[0]
    means, covs = kf.batched_update(
        cfg, means, covs, d_tlbrs, jnp.zeros(n, dtype=bool),
        jnp.ones(n, dtype=jnp.float32))
    next_tlbrs = geom.as_tlbr(means[:, :4])
    ios_vals = geom.ios(next_tlbrs, jnp.broadcast_to(frame_tlbr, next_tlbrs.shape))
    return means, covs, next_tlbrs, ios_vals


@partial(jax.jit, static_argnames=('cfg',))
def _create_kernel(cfg: KalmanConfig, d_tlbrs):
    return kf.batched_create(cfg, d_tlbrs)


@jax.jit
def _rectify_iou_kernel(t_tlbrs, d_tlbrs):
    return dist.iou_dist(t_tlbrs, d_tlbrs)


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
        """Tracking-only frame: flow + Kalman fused into one device
        dispatch (vs compute_flow + apply_kalman, tracker.py:139-148)."""
        from .ops import flow_kernels as fk

        if self.flow.device_state is None:
            self.flow.init(frame)
            return

        # flow packing: active tracks sorted near-to-far (flow.py:157)
        active = sorted((t for t in self.tracks.values() if t.active),
                        reverse=True)[:fk.MAX_FLOW_TRACKS]
        f_tlbrs = np.zeros((fk.MAX_FLOW_TRACKS, 4), np.float32)
        f_valid = np.zeros(fk.MAX_FLOW_TRACKS, bool)
        f_kps = np.zeros((fk.MAX_FLOW_TRACKS, fk.KP_PER_TRACK, 2), np.float32)
        f_kp_valid = np.zeros((fk.MAX_FLOW_TRACKS, fk.KP_PER_TRACK), bool)
        slot_of = {}
        for i, trk in enumerate(active):
            slot_of[trk.trk_id] = i
            f_tlbrs[i] = trk.tlbr
            f_valid[i] = True
            k = min(len(trk.keypoints), fk.KP_PER_TRACK)
            if k:
                f_kps[i, :k] = trk.keypoints[:k]
                f_kp_valid[i, :k] = True

        # KF packing: every live track (fixed capacity - one compile)
        trk_ids = list(self.tracks.keys())[:MAX_TRACKS]
        n = len(trk_ids)
        b = MAX_TRACKS
        means = np.zeros((b, 8), np.float32)
        covs = np.tile(np.eye(8, dtype=np.float32), (b, 1, 1))
        flow_slot = np.full(b, -1, np.int32)
        ages = np.zeros(b, np.int32)
        stored_inl = np.ones(b, np.float32)
        for i, tid in enumerate(trk_ids):
            trk = self.tracks[tid]
            means[i], covs[i] = trk.state
            flow_slot[i] = slot_of.get(tid, -1)
            ages[i] = trk.age
            stored_inl[i] = trk.inlier_ratio

        prev_gray, prev_pyr, prev_bg = self.flow.device_state
        out = _fused_track_kernel(
            self.kf_cfg, self.flow.spec, float(self.age_penalty),
            prev_gray, prev_pyr, prev_bg, jnp.asarray(frame),
            jnp.asarray(f_tlbrs), jnp.asarray(f_valid), jnp.asarray(f_kps),
            jnp.asarray(f_kp_valid), jnp.uint32(self.flow.next_seed()),
            jnp.asarray(means), jnp.asarray(covs), jnp.asarray(flow_slot),
            jnp.asarray(ages), jnp.asarray(stored_inl),
            self._trans_mat, self._acc_cov,
            jnp.asarray(self.frame_rect, dtype=jnp.float32))

        cur_state = out[0]
        (h_ok, h_mat, bg_prev, bg_cur, bg_inlier, est, est_valid, new_inl,
         trk_prev, trk_cur, out_kp_valid, new_means, new_covs, next_tlbrs,
         ios_vals, has_klt) = (np.asarray(o) for o in out[1:])

        failed = not bool(h_ok)
        self.flow.advance(cur_state, failed=failed)

        if failed:
            for trk in active:
                trk.keypoints = np.empty((0, 2), np.float32)
            self.klt_bboxes = {}
            self.homography = None
            LOGGER.warning('Camera motion estimation failed')
            self.tracks.clear()
            return

        keep = bg_inlier.astype(bool)
        self.flow.prev_bg_keypoints = bg_prev[keep]
        self.flow.bg_keypoints = bg_cur[keep]
        self.homography = h_mat.astype(np.float64)

        self.klt_bboxes = {}
        for trk in active:
            i = slot_of[trk.trk_id]
            kv = out_kp_valid[i].astype(bool)
            trk.prev_keypoints = trk_prev[i][kv]
            trk.keypoints = trk_cur[i][kv]
            if est_valid[i]:
                self.klt_bboxes[trk.trk_id] = est[i].astype(np.float64)
            else:
                trk.keypoints = np.empty((0, 2), np.float32)

        next_tlbrs = next_tlbrs.astype(np.float64)
        for i, tid in enumerate(trk_ids):
            track = self.tracks[tid]
            if has_klt[i]:
                track.inlier_ratio = float(new_inl[i])
            track.update(next_tlbrs[i], (new_means[i], new_covs[i]))
            if ios_vals[i] < 0.5:
                if track.confirmed:
                    LOGGER.info(f"{'Out:':<14}{track}")
                self._mark_lost(tid)

    def compute_flow(self, frame):
        """KLT tracklet + camera motion estimation (tracker.py:150-162)."""
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
        (tracker.py:185-293)."""
        n_det = len(detections)
        trk_ids = list(self.tracks.keys())
        n_trk = len(trk_ids)

        tb = MAX_TRACKS
        db = MAX_DETS
        n_det = min(n_det, MAX_DETS)
        trk_ids = trk_ids[:MAX_TRACKS]
        n_trk = len(trk_ids)
        feat_dim = embeddings.shape[1] if embeddings is not None and \
            getattr(embeddings, 'ndim', 0) == 2 and embeddings.shape[0] else 512

        # ---- pack detections --------------------------------------------
        d_tlbrs = np.zeros((db, 4), np.float32)
        d_labels = np.full(db, -1, np.int32)
        d_conf = np.zeros(db, np.float32)
        d_valid = np.zeros(db, bool)
        d_emb = np.zeros((db, feat_dim), np.float32)
        if n_det:
            d_tlbrs[:n_det] = detections.tlbr[:n_det]
            d_labels[:n_det] = detections.label[:n_det]
            d_conf[:n_det] = detections.conf[:n_det]
            d_valid[:n_det] = True
            if embeddings is not None and len(embeddings):
                d_emb[:n_det] = embeddings[:n_det]

        occluded = np.zeros(db, bool)
        if n_det:
            occluded = np.asarray(geom.find_occluded(
                jnp.asarray(d_tlbrs), self.occlusion_thresh,
                jnp.asarray(d_valid)))

        # ---- pack tracks -------------------------------------------------
        t_feats = np.zeros((tb, feat_dim), np.float32)
        t_feat_invalid = np.ones(tb, bool)
        t_labels = np.full(tb, -2, np.int32)
        t_tlbrs = np.zeros((tb, 4), np.float32)
        means = np.zeros((tb, 8), np.float32)
        covs = np.tile(np.eye(8, dtype=np.float32), (tb, 1, 1))
        for i, tid in enumerate(trk_ids):
            trk = self.tracks[tid]
            t_labels[i] = trk.label
            t_tlbrs[i] = trk.tlbr
            means[i], covs[i] = trk.state
            if trk.avg_feat.is_valid():
                t_feats[i] = trk.avg_feat()
                t_feat_invalid[i] = False

        fill_val = min(self.max_assoc_cost + 0.1, 1.0)
        full_cost, iou_cost = _assoc_costs(
            self.kf_cfg, self.metric, self.motion_weight, self.max_assoc_cost,
            1.0 - self.iou_thresh, fill_val,
            jnp.asarray(t_feats), jnp.asarray(t_feat_invalid),
            jnp.asarray(t_labels), jnp.asarray(t_tlbrs),
            jnp.asarray(means), jnp.asarray(covs),
            jnp.asarray(d_tlbrs), jnp.asarray(d_labels),
            jnp.asarray(occluded), jnp.asarray(d_emb))
        full_cost = np.asarray(full_cost)
        iou_cost = np.asarray(iou_cost)

        row_of = {tid: i for i, tid in enumerate(trk_ids)}

        # ---- stage 1: age-cascaded appearance+motion matching ------------
        confirmed_by_depth, unconfirmed = self._group_tracks_by_depth()
        matches1: list[tuple[int, int]] = []
        u_trk_ids1: list[int] = []
        u_det_mask = d_valid.copy()
        for depth, bucket_ids in enumerate(confirmed_by_depth):
            if not u_det_mask.any():
                for rest in confirmed_by_depth[depth:]:
                    u_trk_ids1.extend(rest)
                break
            if not bucket_ids:
                continue
            m, u_t, u_det_mask = self._solve_lap(
                full_cost, bucket_ids, row_of, u_det_mask)
            matches1 += m
            u_trk_ids1 += u_t

        # ---- stage 2: IoU matching for remaining active tracks -----------
        active = [tid for tid in u_trk_ids1 if self.tracks[tid].active]
        u_trk_ids1 = [tid for tid in u_trk_ids1 if not self.tracks[tid].active]
        matches2, u_trk_ids2, u_det_mask = self._solve_lap(
            iou_cost, active, row_of, u_det_mask)

        # ---- stage 3: IoU matching for unconfirmed tracks ----------------
        matches3, u_trk_ids3, u_det_mask = self._solve_lap(
            iou_cost, unconfirmed, row_of, u_det_mask)

        # ---- reID against history ----------------------------------------
        u_det_mask &= d_conf >= self.conf_thresh
        valid_u_det_mask = u_det_mask & ~occluded
        invalid_u_det_ids = np.flatnonzero(u_det_mask & occluded)

        hist_ids = [tid for tid, trk in self.hist_tracks.items()
                    if trk.avg_feat.count >= 2]
        reid_matches: list[tuple[int, int]] = []
        reid_u_det_ids = np.flatnonzero(valid_u_det_mask)
        if hist_ids and valid_u_det_mask.any():
            hb = self._hist_bucket
            hist_ids = hist_ids[:hb]
            h_feats = np.zeros((hb, feat_dim), np.float32)
            h_labels = np.full(hb, -2, np.int32)
            for i, tid in enumerate(hist_ids):
                h_feats[i] = self.hist_tracks[tid].avg_feat()
                h_labels[i] = self.hist_tracks[tid].label
            cost = _reid_cost_kernel(self.metric, jnp.asarray(h_feats),
                                     jnp.asarray(h_labels),
                                     jnp.asarray(d_emb), jnp.asarray(d_labels))
            h_valid = np.zeros(hb, bool)
            h_valid[:len(hist_ids)] = True
            _, col4row = asg.greedy_match_arrays(
                cost, jnp.asarray(h_valid), jnp.asarray(valid_u_det_mask),
                self.max_reid_cost)
            col4row = np.asarray(col4row)
            matched_dets = set()
            for i, tid in enumerate(hist_ids):
                j = int(col4row[i])
                if j >= 0:
                    reid_matches.append((tid, j))
                    matched_dets.add(j)
            reid_u_det_ids = np.array(
                [d for d in np.flatnonzero(valid_u_det_mask)
                 if d not in matched_dets], dtype=int)

        matches = list(matches1) + list(matches2) + list(matches3)
        u_trk_ids = list(u_trk_ids1) + list(u_trk_ids2) + list(u_trk_ids3)

        # ---- rectify duplicate-prone matches -----------------------------
        matches, u_trk_ids = self._rectify_matches(matches, u_trk_ids,
                                                   d_tlbrs)

        # ---- reinstate reID matches --------------------------------------
        if reid_matches:
            det_ids = [j for _, j in reid_matches]
            tlbrs = np.zeros((MAX_DETS, 4), np.float32)
            tlbrs[:len(det_ids)] = d_tlbrs[det_ids]
            new_means, new_covs = _create_kernel(self.kf_cfg, jnp.asarray(tlbrs))
            new_means, new_covs = np.asarray(new_means), np.asarray(new_covs)
            for k, (tid, det_id) in enumerate(reid_matches):
                track = self.hist_tracks.pop(tid)
                LOGGER.info(f"{'Reidentified:':<14}{track}")
                state = (new_means[k], new_covs[k])
                track.reinstate(frame_id, d_tlbrs[det_id].astype(np.float64),
                                state, d_emb[det_id])
                self.tracks[tid] = track

        # ---- update matched tracks (batched KF detector update) ----------
        matches = list(matches)
        if matches:
            mb = MAX_TRACKS
            m_means = np.zeros((mb, 8), np.float32)
            m_covs = np.tile(np.eye(8, dtype=np.float32), (mb, 1, 1))
            m_tlbrs = np.zeros((mb, 4), np.float32)
            for k, (tid, j) in enumerate(matches):
                m_means[k], m_covs[k] = self.tracks[tid].state
                m_tlbrs[k] = d_tlbrs[j]
            new_means, new_covs, next_tlbrs, ios_vals = _detector_update_kernel(
                self.kf_cfg, jnp.asarray(m_means), jnp.asarray(m_covs),
                jnp.asarray(m_tlbrs),
                jnp.asarray(self.frame_rect, dtype=jnp.float32))
            new_means, new_covs = np.asarray(new_means), np.asarray(new_covs)
            next_tlbrs = np.asarray(next_tlbrs).astype(np.float64)
            ios_vals = np.asarray(ios_vals)
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
        new_det_ids = list(invalid_u_det_ids) + list(reid_u_det_ids)
        if new_det_ids:
            tlbrs = np.zeros((MAX_DETS, 4), np.float32)
            tlbrs[:len(new_det_ids)] = d_tlbrs[new_det_ids]
            new_means, new_covs = _create_kernel(self.kf_cfg, jnp.asarray(tlbrs))
            new_means, new_covs = np.asarray(new_means), np.asarray(new_covs)
            for k, det_id in enumerate(new_det_ids):
                state = (new_means[k], new_covs[k])
                new_trk = Track(frame_id, d_tlbrs[det_id].astype(np.float64),
                                state, int(d_labels[det_id]),
                                self.confirm_hits)
                self.tracks[new_trk.trk_id] = new_trk
                LOGGER.debug(f"{'Detected:':<14}{new_trk}")

    # -- helpers -----------------------------------------------------------

    def _solve_lap(self, cost, bucket_trk_ids, row_of, u_det_mask):
        """Run the on-device LAP over a row subset + column mask of a
        precomputed padded cost matrix. Returns (matches, unmatched track
        ids, new column mask)."""
        if not bucket_trk_ids or not u_det_mask.any():
            return [], list(bucket_trk_ids), u_det_mask
        row_valid = np.zeros(cost.shape[0], bool)
        for tid in bucket_trk_ids:
            row_valid[row_of[tid]] = True
        _, col4row = asg.auction_lap(jnp.asarray(cost),
                                     jnp.asarray(row_valid),
                                     jnp.asarray(u_det_mask))
        col4row = np.asarray(col4row)
        matches, unmatched = [], []
        new_mask = u_det_mask.copy()
        for tid in bucket_trk_ids:
            j = int(col4row[row_of[tid]])
            if j >= 0 and cost[row_of[tid], j] < asg.INF_COST:
                matches.append((tid, j))
                new_mask[j] = False
            else:
                unmatched.append(tid)
        return matches, unmatched, new_mask

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

    def _rectify_matches(self, matches, u_trk_ids, d_tlbrs):
        """Resolve matches that may duplicate unmatched active tracks
        (tracker.py:368-401)."""
        matches, u_trk_ids = set(matches), set(u_trk_ids)
        inactive_matches = [m for m in matches if not self.tracks[m[0]].active]
        u_active = [tid for tid in u_trk_ids
                    if self.tracks[tid].confirmed and self.tracks[tid].active]
        if not inactive_matches or not u_active:
            return matches, u_trk_ids

        m_inactive = [tid for tid, _ in inactive_matches]
        det_ids = [j for _, j in inactive_matches]
        ab = MAX_TRACKS
        cb = MAX_DETS
        t_boxes = np.zeros((ab, 4), np.float32)
        for i, tid in enumerate(u_active):
            t_boxes[i] = self.tracks[tid].tlbr
        d_boxes = np.zeros((cb, 4), np.float32)
        d_boxes[:len(det_ids)] = d_tlbrs[det_ids]
        iou_cost = _rectify_iou_kernel(jnp.asarray(t_boxes), jnp.asarray(d_boxes))
        a_valid = np.zeros(ab, bool)
        a_valid[:len(u_active)] = True
        c_valid = np.zeros(cb, bool)
        c_valid[:len(det_ids)] = True
        _, col4row = asg.greedy_match_arrays(
            iou_cost, jnp.asarray(a_valid), jnp.asarray(c_valid),
            1.0 - self.duplicate_thresh)
        col4row = np.asarray(col4row)

        for i, u_trk_id in enumerate(u_active):
            col = int(col4row[i])
            if col < 0:
                continue
            m_trk_id, det_id = m_inactive[col], det_ids[col]
            t_u_active, t_m_inactive = self.tracks[u_trk_id], self.tracks[m_trk_id]
            if t_m_inactive.end_frame < t_u_active.start_frame:
                LOGGER.debug(f"{'Merged:':<14}{u_trk_id} -> {m_trk_id}")
                t_m_inactive.merge_continuation(t_u_active)
                u_trk_ids.discard(u_trk_id)
                del self.tracks[u_trk_id]
            else:
                LOGGER.debug(f"{'Duplicate:':<14}{m_trk_id} -> {u_trk_id}")
                u_trk_ids.discard(u_trk_id)
                u_trk_ids.add(m_trk_id)
                matches.discard((m_trk_id, det_id))
                matches.add((u_trk_id, det_id))
        return matches, u_trk_ids
