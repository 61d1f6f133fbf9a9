"""Multi-object tracker: KLT + Kalman prediction and cascaded association.

Behavioral reference: fastmot/tracker.py (MultiTracker). The association
semantics are preserved — age-cascaded appearance+motion matching, IoU
stages for active and unconfirmed tracks, greedy reID against track
history, duplicate rectification (tracker.py:185-293, 368-401) — but the
state machine is inverted for TPU serving, where (measured on this
environment) every host<->device transfer costs ~26 ms latency while the
kernels themselves execute in well under a millisecond:

  * ALL numeric track state is device-resident: Kalman means/covariances,
    boxes, ages, flow keypoints, the running appearance-feature sums, and
    the reID history feature store. It chains across frames on device.
  * Tracking-only frames (N-1 of every N) are ONE dispatch with zero
    synchronization (_chained_track_kernel); per-frame info vectors are
    fetched in one batched device_get at the next association.
  * Association frames cost exactly TWO batched readbacks: one fetching
    {pending gap-frame infos + cascade decisions + detection boxes}, and
    one fetching the commit kernel's results (new boxes + means/covs to
    refresh the host mirrors).
  * The host keeps only genuinely dynamic bookkeeping: the track
    dictionary, ID and slot allocation, the reID-history LRU, logging.

Slot lifecycle (host-managed): free -> live -> (quarantined ->) free.
A track whose box leaves the frame after a detector update is discovered
in the commit readback; its slot is quarantined so its on-device features
survive until the next association saves them into the history store.
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
FEAT_DIM = 512


class OverflowCounters(dict):
    """Counts every fixed-capacity clip (SURVEY.md §7 "assert-and-clip with
    overflow counters"): state beyond a budget is dropped SILENTLY by the
    masked kernels, so the host shell records and warns instead. Keys:
    detections_clipped, flow_tracks_clipped, keypoints_clipped,
    tracks_clipped, track_slots_exhausted, hist_slots_stolen."""

    def bump(self, kind: str, n: int = 1):
        if n <= 0:
            return
        if kind not in self:
            LOGGER.warning(
                'Capacity overflow: %s (+%d) — state beyond the fixed '
                'budget is clipped (see tracker.MAX_TRACKS/MAX_DETS, '
                'flow_kernels.MAX_FLOW_TRACKS/KP_PER_TRACK)', kind, n)
        self[kind] = self.get(kind, 0) + n


def _bucket(n: int, lo: int = 8) -> int:
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
# Device kernels
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=('cfg',))
def _apply_kalman_kernel(cfg: KalmanConfig, means, covs, h_mat, trans, acc_cov,
                         klt_tlbrs, has_klt, multipliers, frame_tlbr):
    """Batched warp -> predict -> masked KLT update (legacy API path for
    compute_flow/apply_kalman parity; the scheduler uses track())."""
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


@partial(jax.jit, static_argnames=('cfg',))
def _create_kernel(cfg: KalmanConfig, d_tlbrs):
    return kf.batched_create(cfg, d_tlbrs)


@partial(jax.jit, static_argnames=('cfg', 'spec', 'age_penalty'))
def _chained_track_kernel(cfg: KalmanConfig, spec, age_penalty: float,
                          prev_state, cur_frame, seed,
                          means, covs, tlbrs, valid, ages, inl,
                          kps, kp_valid, feat_sum, feat_count,
                          trans, acc_cov, frame_tlbr):
    """One tracking-only frame entirely on device (mot.py:162-164 path):
    frame preprocess -> in-kernel depth sort (flow.py:157) -> corner
    management / pyramidal LK / RANSAC -> KF warp/predict/KLT-update ->
    out-of-frame + camera-failure validity updates. Returns the chained
    state and a small flat info vector for deferred host bookkeeping."""
    from .ops import flow_kernels as fk

    cur_state = fk._preprocess_jit(spec, cur_frame)
    t_cap = means.shape[0]
    f_cap = fk.MAX_FLOW_TRACKS

    active = valid & (ages < 2)
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
        spec, prev_state, cur_state, f_tlbrs, f_valid, f_kps, f_kpv, seed)

    pos = jnp.full(t_cap, f_cap, jnp.int32).at[forder].set(
        jnp.arange(f_cap, dtype=jnp.int32))
    in_flow = (pos < f_cap) & active
    slot = jnp.minimum(pos, f_cap - 1)
    has_klt = in_flow & est_valid[slot]
    klt_tlbrs = est[slot]
    new_inl = jnp.where(has_klt, inl_ratio[slot], inl)

    kps_new = jnp.where(in_flow[:, None, None], trk_cur[slot], kps)
    kpv_new = jnp.where(in_flow[:, None], out_kp_valid[slot], kp_valid)
    kpv_new = jnp.where((in_flow & ~est_valid[slot])[:, None], False, kpv_new)

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
    new_valid = jnp.where(h_ok, valid & ~lost, jnp.zeros_like(valid))
    kpv_new = kpv_new & h_ok & new_valid[:, None]
    new_tlbrs = jnp.where(valid[:, None], next_tlbrs, tlbrs)

    new_state = (means, covs, new_tlbrs, new_valid, ages, new_inl,
                 kps_new, kpv_new, feat_sum, feat_count)
    next_seed = seed + jnp.uint32(1)   # RNG seed stays device-resident
    # small flat info vector (~10KB): one transfer, batched with others
    info = jnp.concatenate([
        a.astype(jnp.float32).reshape(-1) for a in (
            h_ok.reshape(-1), h_mat, next_tlbrs, lost, has_klt, klt_tlbrs,
            new_inl, bg_prev, bg_cur, bg_inlier,
            est_valid[slot] & in_flow)])
    return cur_state, new_state, info, next_seed


def _normalized_feats(feat_sum, feat_count):
    avg = feat_sum / jnp.maximum(feat_count, 1.0)[:, None]
    norm = jnp.linalg.norm(avg, axis=1, keepdims=True)
    return avg / jnp.where(norm > 0, norm, 1.0)


@partial(jax.jit, static_argnames=('cfg', 'metric', 'n_depth', 'motion_weight',
                                   'max_assoc_cost', 'iou_gate', 'fill_val',
                                   'occlusion_thresh', 'conf_thresh',
                                   'max_reid_cost', 'dup_gate'))
def _cascade_kernel(cfg: KalmanConfig, metric: dist.Metric, n_depth: int,
                    motion_weight: float, max_assoc_cost: float,
                    iou_gate: float, fill_val: float,
                    occlusion_thresh: float, conf_thresh: float,
                    max_reid_cost: float, dup_gate: float,
                    means, covs, tlbrs, dev_valid, feat_sum, feat_count,
                    t_labels, t_depth, t_confirmed, t_active, t_live,
                    d_tlbrs, d_labels, d_conf, d_valid, d_embeddings,
                    hist_sum, hist_count, h_labels, h_valid):
    """The COMPLETE association cascade in one dispatch
    (tracker.py:185-247). Track appearance features come from the
    device-resident running sums; the reID history from the device
    history store. Only small label/age masks arrive from the host."""
    t_valid = dev_valid & t_live
    occluded = geom.find_occluded(d_tlbrs, occlusion_thresh, d_valid)

    t_feats = _normalized_feats(feat_sum, feat_count)
    t_feat_invalid = feat_count < 1.0
    empty = t_feat_invalid[:, None] | occluded[None, :]
    cost = dist.cdist(t_feats, d_embeddings, metric,
                      empty_mask=empty, fill_val=fill_val)
    m_dist = kf.batched_maha_distance(cfg, means, covs, d_tlbrs)
    cost = asg.fuse_motion(cost, m_dist, motion_weight)
    cost = asg.gate_cost(cost, t_labels, d_labels, max_assoc_cost)

    iou_cost = dist.iou_dist(tlbrs, d_tlbrs)
    iou_cost = asg.gate_cost(iou_cost, t_labels, d_labels, iou_gate)

    col4row_final = jnp.full(tlbrs.shape[0], -1, jnp.int32)
    u_det = d_valid

    def take(u_det, col4row_final, c4r, row_valid):
        matched = (c4r >= 0) & row_valid
        col4row_final = jnp.where(matched, c4r, col4row_final)
        taken = jnp.zeros_like(u_det).at[
            jnp.where(matched, c4r, u_det.shape[0])].set(True, mode='drop')
        return u_det & ~taken, col4row_final

    # stage 1: age-cascaded matching over depth-bucket row masks
    for depth in range(n_depth):
        row_valid = t_valid & t_confirmed & (t_depth == depth)
        _, c4r = asg.auction_lap(cost, row_valid, u_det)
        u_det, col4row_final = take(u_det, col4row_final, c4r, row_valid)

    # stage 2: IoU matching for remaining active confirmed tracks
    row_valid = t_valid & t_confirmed & t_active & (col4row_final < 0)
    _, c4r = asg.auction_lap(iou_cost, row_valid, u_det)
    u_det, col4row_final = take(u_det, col4row_final, c4r, row_valid)

    # stage 3: IoU matching for unconfirmed tracks
    row_valid = t_valid & ~t_confirmed
    _, c4r = asg.auction_lap(iou_cost, row_valid, u_det)
    u_det, col4row_final = take(u_det, col4row_final, c4r, row_valid)

    # greedy reID against the device history store (tracker.py:229-241)
    u_det_conf = u_det & (d_conf >= conf_thresh)
    reid_cols = u_det_conf & ~occluded
    h_feats = _normalized_feats(hist_sum, hist_count)
    reid_cost = dist.cdist(h_feats, d_embeddings, metric)
    reid_cost = asg.gate_cost(reid_cost, h_labels, d_labels)
    _, reid_c4r = asg.greedy_match_arrays(reid_cost, h_valid, reid_cols,
                                          max_reid_cost)

    # duplicate-rectify candidates (tracker.py:368-387)
    matched_mask = col4row_final >= 0
    inactive_matched = matched_mask & ~t_active
    u_active = t_valid & t_confirmed & t_active & ~matched_mask
    safe_col = jnp.where(matched_mask, col4row_final, 0)
    m_boxes = d_tlbrs[safe_col]
    rect_cost = dist.iou_dist(tlbrs, m_boxes)
    _, rect_c4r = asg.greedy_match_arrays(rect_cost, u_active,
                                          inactive_matched, dup_gate)

    return (occluded, col4row_final, u_det_conf, reid_c4r, rect_c4r)


@partial(jax.jit, static_argnames=('cfg',))
def _commit_kernel(cfg: KalmanConfig,
                   means, covs, tlbrs, valid, ages, inl, kps, kpv,
                   feat_sum, feat_count, hist_sum, hist_count,
                   d_tlbrs, d_emb,
                   merge_src, hist_dst, reinstate_hist, match_det, feat_ok,
                   create_det, new_ages, new_valid, frame_tlbr):
    """Apply the host's association decisions to the device state in one
    dispatch: merges, history saves, reinstates, matched-track KF
    corrections + feature updates, new-track creation. Decision arrays are
    slot-indexed int32/bool vectors (-1 = not applicable)."""
    t_cap = means.shape[0]
    idx = jnp.arange(t_cap)

    # 1. merges (merge_continuation, track.py:208-220): dst takes src's
    # KF state + keypoints; features and counts add
    src = jnp.where(merge_src >= 0, merge_src, idx)
    has_merge = merge_src >= 0
    means = jnp.where(has_merge[:, None], means[src], means)
    covs = jnp.where(has_merge[:, None, None], covs[src], covs)
    tlbrs = jnp.where(has_merge[:, None], tlbrs[src], tlbrs)
    inl = jnp.where(has_merge, inl[src], inl)
    kps = jnp.where(has_merge[:, None, None], kps[src], kps)
    kpv = jnp.where(has_merge[:, None], kpv[src], kpv)
    feat_sum = jnp.where(has_merge[:, None], feat_sum + feat_sum[src],
                         feat_sum)
    feat_count = jnp.where(has_merge, feat_count + feat_count[src],
                           feat_count)

    # 2. history saves: hist_dst[slot] = history slot to receive this
    # track's running feature sum (lost tracks, tracker.py:295-300)
    save = hist_dst >= 0
    hs = jnp.where(save, hist_dst, hist_sum.shape[0])
    hist_sum = hist_sum.at[hs].set(feat_sum, mode='drop')
    hist_count = hist_count.at[hs].set(feat_count, mode='drop')

    # 3. reinstates (tracker.py:249-256): restore features from history
    re = reinstate_hist >= 0
    rh = jnp.where(re, reinstate_hist, 0)
    feat_sum = jnp.where(re[:, None], hist_sum[rh], feat_sum)
    feat_count = jnp.where(re, hist_count[rh], feat_count)

    # 4. matched-track KF corrections (tracker.py:258-272)
    m = match_det >= 0
    z = d_tlbrs[jnp.where(m, match_det, 0)]
    up_means, up_covs = kf.batched_update(
        cfg, means, covs, z, jnp.zeros(t_cap, dtype=bool),
        jnp.ones(t_cap, dtype=jnp.float32))
    means = jnp.where(m[:, None], up_means, means)
    covs = jnp.where(m[:, None, None], up_covs, covs)

    # 5. creations (new + reinstated tracks): state from detection
    c = create_det >= 0
    cz = d_tlbrs[jnp.where(c, create_det, 0)]
    cr_means, cr_covs = kf.batched_create(cfg, cz)
    means = jnp.where(c[:, None], cr_means, means)
    covs = jnp.where(c[:, None, None], cr_covs, covs)
    kpv = jnp.where(c[:, None], False, kpv)
    inl = jnp.where(c, 1.0, inl)
    # fresh tracks start with empty features (track.py:132-148);
    # reinstated ones keep their restored history features
    fresh = c & ~re
    feat_sum = jnp.where(fresh[:, None], 0.0, feat_sum)
    feat_count = jnp.where(fresh, 0.0, feat_count)

    # 6. boxes / out-of-frame test BEFORE feature updates (a matched box
    # that leaves the frame does not absorb its embedding,
    # tracker.py:267-272)
    next_tlbrs = geom.as_tlbr(means[:, :4])
    ios_vals = geom.ios(next_tlbrs,
                        jnp.broadcast_to(frame_tlbr, next_tlbrs.shape))
    out_of_frame = m & (ios_vals < 0.5)

    # 7. feature updates: matched+valid and reinstated tracks absorb the
    # detection embedding (add_detection / reinstate, track.py:184-203)
    det_of = jnp.where(m, match_det, jnp.where(c, create_det, 0))
    emb = d_emb[det_of]
    upd = (m & feat_ok & ~out_of_frame) | (c & re)
    feat_sum = jnp.where(upd[:, None], feat_sum + emb, feat_sum)
    feat_count = jnp.where(upd, feat_count + 1.0, feat_count)
    tlbrs = jnp.where((m | c)[:, None], next_tlbrs, tlbrs)
    valid = new_valid & ~out_of_frame
    ages = new_ages

    new_state = (means, covs, tlbrs, valid, ages, inl, kps, kpv,
                 feat_sum, feat_count)
    info = jnp.concatenate([
        a.astype(jnp.float32).reshape(-1) for a in (
            next_tlbrs, out_of_frame, means, covs)])
    return new_state, (hist_sum, hist_count), info


class MultiTracker:
    """Tracks multiple objects, associating detections by motion and
    appearance. Public surface matches the reference (tracker.py:18-135)."""

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
        self._hist_cap = _bucket(max(history_size, 1))

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
        self._frame_rect_dev = jnp.asarray(self.frame_rect, jnp.float32)

        # device-resident state + host slot management
        self._dev_state = None
        self._hist_store = None          # (hist_sum, hist_count) on device
        self._slot_ids: list = [None] * MAX_TRACKS   # slot -> trk_id
        self._quarantined: set[int] = set()           # slots awaiting save
        self._hist_slot: dict[int, int] = {}          # trk_id -> hist slot
        self._pending: list = []
        self._mirrors_dirty = True        # host mirrors are authoritative
        self.overflow = OverflowCounters()

    # -- lifecycle ---------------------------------------------------------

    def reset(self, dt):
        """Reset for a new input context (tracker.py:109-119)."""
        self._dt = dt
        self._acc_cov, self._meas_mat, self._trans_mat = kf.init_mats(
            self.kf_cfg, dt)
        self.hist_tracks.clear()
        self._hist_slot.clear()
        self._hist_store = None
        Track._count = 0

    def init(self, frame, detections):
        """Initialize from detections in the first frame
        (tracker.py:121-137)."""
        self._pending = []
        self.tracks.clear()
        self._slot_ids = [None] * MAX_TRACKS
        self._quarantined.clear()
        self.flow.init(frame)
        n = min(len(detections), MAX_DETS)
        self.overflow.bump('detections_clipped', len(detections) - MAX_DETS)
        if n:
            tlbrs = np.zeros((MAX_DETS, 4), np.float32)
            tlbrs[:n] = detections.tlbr[:n]
            means, covs = jax.device_get(
                _create_kernel(self.kf_cfg, jnp.asarray(tlbrs)))
            for i, det in enumerate(detections[:n]):
                state = (means[i], covs[i])
                new_trk = Track(0, det.tlbr, state, det.label,
                                self.confirm_hits)
                self.tracks[new_trk.trk_id] = new_trk
                self._slot_ids[i] = new_trk.trk_id
                LOGGER.debug(f"{'Detected:':<14}{new_trk}")
        self._mirrors_dirty = True
        self._upload_state()

    # -- tracking-only frames (device-chained) ------------------------------

    def track(self, frame):
        """Tracking-only frame: one chained device dispatch, zero host
        syncs (vs compute_flow + apply_kalman, tracker.py:139-148)."""
        if self.flow.device_state is None:
            self.flow.init(frame)
            return
        if self._dev_state is None or self._mirrors_dirty:
            self._upload_state()
        from .ops import flow_kernels as fk
        n_active = sum(1 for t in self.tracks.values() if t.active)
        self.overflow.bump('flow_tracks_clipped',
                           n_active - fk.MAX_FLOW_TRACKS)

        cur_state, new_state, info, next_seed = _chained_track_kernel(
            self.kf_cfg, self.flow.spec, float(self.age_penalty),
            self.flow.device_state, jnp.asarray(frame),
            self.flow.seed_dev,
            *self._dev_state, self._trans_mat, self._acc_cov,
            self._frame_rect_dev)
        self._dev_state = new_state
        self.flow.advance(cur_state, next_seed)
        self._pending.append((list(self._slot_ids), info))

    def sync(self, infos=None):
        """Apply pending chained-frame results to the host Track mirrors.
        Pass pre-fetched ``infos`` to reuse a larger batched device_get."""
        pending, self._pending = self._pending, []
        if not pending:
            return
        if infos is None:
            infos = jax.device_get([info for _, info in pending])
        for (slot_ids, _), flat in zip(pending, infos):
            (h_ok, h_mat, next_tlbrs, lost, has_klt, klt_tlbrs, new_inl,
             bg_prev, bg_cur, bg_inlier, est_ok) = self._unpack_info(flat)
            if not bool(h_ok):
                for trk in self.tracks.values():
                    trk.keypoints = np.empty((0, 2), np.float32)
                self.klt_bboxes = {}
                self.homography = None
                LOGGER.warning('Camera motion estimation failed')
                # cleared tracks do NOT enter reID history
                # (tracker.py:160-162)
                self.tracks.clear()
                self._slot_ids = [None] * MAX_TRACKS
                continue
            self.homography = h_mat.astype(np.float64)
            keep = bg_inlier.astype(bool)
            self.flow.prev_bg_keypoints = bg_prev[keep]
            self.flow.bg_keypoints = bg_cur[keep]
            self.klt_bboxes = {}
            tl64 = next_tlbrs.astype(np.float64)
            for i, tid in enumerate(slot_ids):
                if tid is None:
                    continue
                track = self.tracks.get(tid)
                if track is None:
                    continue
                if est_ok[i]:
                    self.klt_bboxes[tid] = klt_tlbrs[i].astype(np.float64)
                if has_klt[i]:
                    track.inlier_ratio = float(new_inl[i])
                track.update(tl64[i], track.state)
                if lost[i]:
                    if track.confirmed:
                        LOGGER.info(f"{'Out:':<14}{track}")
                    self._retire(tid, i)

    def _info_layout(self):
        from .ops import flow_kernels as fk
        t = MAX_TRACKS
        bw, bh = self.flow.spec.bg_size
        n_bg = min(fk.BG_KP, (bh // fk.BG_CELL) * (bw // fk.BG_CELL))
        return [
            ('h_ok', (1,), bool), ('h_mat', (3, 3), np.float64),
            ('next_tlbrs', (t, 4), np.float32), ('lost', (t,), bool),
            ('has_klt', (t,), bool), ('klt_tlbrs', (t, 4), np.float32),
            ('new_inl', (t,), np.float32),
            ('bg_prev', (n_bg, 2), np.float32),
            ('bg_cur', (n_bg, 2), np.float32), ('bg_inlier', (n_bg,), bool),
            ('est_ok', (t,), bool),
        ]

    def _unpack_info(self, flat):
        out = []
        off = 0
        for name, shape, dtype in self._info_layout():
            n = int(np.prod(shape))
            arr = flat[off:off + n].reshape(shape)
            off += n
            if dtype is bool:
                arr = arr > 0.5
            elif dtype is not np.float32:
                arr = arr.astype(dtype)
            out.append(arr if name != 'h_ok' else arr[0])
        assert off == flat.size, (off, flat.size)
        return tuple(out)

    # -- state management ----------------------------------------------------

    def _upload_state(self):
        """Build the device state from the host mirrors (cycle start or
        after legacy-path mutations). One batched H2D."""
        from .ops import flow_kernels as fk
        k_cap = fk.KP_PER_TRACK
        # compact live tracks into the slot table
        self._slot_ids = [None] * MAX_TRACKS
        self.overflow.bump('tracks_clipped', len(self.tracks) - MAX_TRACKS)
        for i, tid in enumerate(list(self.tracks.keys())[:MAX_TRACKS]):
            self._slot_ids[i] = tid
        means = np.zeros((MAX_TRACKS, 8), np.float32)
        covs = np.tile(np.eye(8, dtype=np.float32), (MAX_TRACKS, 1, 1))
        tlbrs = np.zeros((MAX_TRACKS, 4), np.float32)
        valid = np.zeros(MAX_TRACKS, bool)
        ages = np.zeros(MAX_TRACKS, np.int32)
        inl = np.ones(MAX_TRACKS, np.float32)
        kps = np.zeros((MAX_TRACKS, k_cap, 2), np.float32)
        kpv = np.zeros((MAX_TRACKS, k_cap), bool)
        fsum = np.zeros((MAX_TRACKS, FEAT_DIM), np.float32)
        fcnt = np.zeros(MAX_TRACKS, np.float32)
        for i, tid in enumerate(self._slot_ids):
            if tid is None:
                continue
            trk = self.tracks[tid]
            means[i], covs[i] = trk.state
            tlbrs[i] = trk.tlbr
            valid[i] = True
            ages[i] = trk.age
            inl[i] = trk.inlier_ratio
            k = min(len(trk.keypoints), k_cap)
            self.overflow.bump('keypoints_clipped',
                               len(trk.keypoints) - k_cap)
            if k:
                kps[i, :k] = trk.keypoints[:k]
                kpv[i, :k] = True
            if trk.avg_feat.sum is not None:
                fsum[i] = trk.avg_feat.sum
                fcnt[i] = trk.avg_feat.count
        self._dev_state = jax.device_put(
            (means, covs, tlbrs, valid, ages, inl, kps, kpv, fsum, fcnt))
        self._ensure_hist_store()
        self._quarantined.clear()
        self._mirrors_dirty = False

    def _ensure_hist_store(self):
        if self._hist_store is None:
            self._hist_store = jax.device_put(
                (np.zeros((self._hist_cap, FEAT_DIM), np.float32),
                 np.zeros(self._hist_cap, np.float32)))

    def _retire(self, trk_id, slot):
        """Move a live track to reID history; its device feature slot is
        quarantined until the next association saves it (tracker.py:295-300
        _mark_lost)."""
        track = self.tracks.pop(trk_id)
        if slot is not None:
            self._slot_ids[slot] = None
        if track.confirmed:
            self.hist_tracks[trk_id] = track
            if slot is not None:
                self._quarantined.add(slot)
                self._hist_slot[trk_id] = -slot - 1  # pending marker
            if len(self.hist_tracks) > self.history_size:
                old_id, _ = self.hist_tracks.popitem(last=False)
                self._hist_slot.pop(old_id, None)

    def _alloc_hist_slot(self, trk_id):
        used = {s for s in self._hist_slot.values() if s >= 0}
        for s in range(self._hist_cap):
            if s not in used:
                self._hist_slot[trk_id] = s
                return s
        # capacity full: steal the oldest history entry's slot
        self.overflow.bump('hist_slots_stolen')
        for old_id in list(self.hist_tracks.keys()):
            s = self._hist_slot.get(old_id, -1)
            if s >= 0 and old_id != trk_id:
                self.hist_tracks.pop(old_id, None)
                self._hist_slot.pop(old_id, None)
                self._hist_slot[trk_id] = s
                return s
        self._hist_slot[trk_id] = 0
        return 0

    def _free_slot(self):
        for i, tid in enumerate(self._slot_ids):
            if tid is None and i not in self._quarantined:
                return i
        return None

    def _invalidate_device_state(self):
        self._dev_state = None

    # -- legacy API-parity paths --------------------------------------------

    def compute_flow(self, frame):
        """KLT tracklet + camera motion estimation (tracker.py:150-162).
        API-parity path; the scheduler uses track()."""
        self.sync()
        self._mirrors_dirty = True
        active_tracks = [t for t in self.tracks.values() if t.active]
        self.klt_bboxes, self.homography = self.flow.predict(frame,
                                                             active_tracks)
        if self.homography is None:
            self.tracks.clear()

    def apply_kalman(self):
        """Batched KF predict/update from KLT measurements
        (tracker.py:164-183). API-parity path; the scheduler uses track()."""
        self._mirrors_dirty = True
        if not self.tracks:
            return
        trk_ids = list(self.tracks.keys())[:MAX_TRACKS]
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
        out = _apply_kalman_kernel(
            self.kf_cfg, jnp.asarray(means), jnp.asarray(covs),
            jnp.asarray(h_mat), self._trans_mat, self._acc_cov,
            jnp.asarray(klt_tlbrs), jnp.asarray(has_klt), jnp.asarray(mult),
            self._frame_rect_dev)
        new_means, new_covs, next_tlbrs, ios_vals = jax.device_get(out)
        next_tlbrs = next_tlbrs.astype(np.float64)
        for i, tid in enumerate(trk_ids):
            track = self.tracks[tid]
            track.update(next_tlbrs[i], (new_means[i], new_covs[i]))
            if ios_vals[i] < 0.5:
                if track.confirmed:
                    LOGGER.info(f"{'Out:':<14}{track}")
                self._retire(tid, None)

    # -- association ----------------------------------------------------------

    def update(self, frame_id, detections, embeddings):
        """Host-array association entry (PublicDetector-style recarrays).
        Wraps the device path (tracker.py:185-293)."""
        n_det = min(len(detections), MAX_DETS)
        self.overflow.bump('detections_clipped', len(detections) - MAX_DETS)
        feat_dim = embeddings.shape[1] if embeddings is not None and \
            getattr(embeddings, 'ndim', 0) == 2 and embeddings.shape[0] \
            else FEAT_DIM
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
        det_dev = tuple(jnp.asarray(a) for a in
                        (d_tlbrs, d_labels, d_conf, d_valid))
        # host path keeps the appearance mirrors authoritative so legacy
        # API users (and mixed host/device usage) see real avg_feat values
        self._host_emb = d_emb
        self.update_device(frame_id, det_dev, jnp.asarray(d_emb))

    def update_device(self, frame_id, det_dev, emb_dev):
        """Device-array association: two batched readbacks total."""
        token = self.update_device_begin(frame_id, det_dev, emb_dev)
        fetched = jax.device_get(token['fetch'])
        token2 = self.update_device_mid(token, fetched)
        fetched2 = np.asarray(token2['fetch'])
        self.update_device_end(token2, fetched2)

    def update_device_begin(self, frame_id, det_dev, emb_dev):
        """Phase A: dispatch the cascade kernel; returns a token whose
        ``fetch`` pytree (gap infos + cascade decisions + det arrays) a
        driver may batch into one device_get across many trackers."""
        host_emb = getattr(self, '_host_emb', None)
        self._host_emb = None
        if self._dev_state is None or self._mirrors_dirty:
            self._upload_state()
        self._ensure_hist_store()
        d_tlbrs_dev, d_labels_dev, d_conf_dev, d_valid_dev = det_dev
        (means, covs, tlbrs, dev_valid, dv_ages, dv_inl, kps, kpv,
         feat_sum, feat_count) = self._dev_state
        hist_sum, hist_count = self._hist_store

        # small host-known masks (labels/ages are host-authoritative)
        t_labels = np.full(MAX_TRACKS, -2, np.int32)
        t_depth = np.zeros(MAX_TRACKS, np.int32)
        t_confirmed = np.zeros(MAX_TRACKS, bool)
        t_active = np.zeros(MAX_TRACKS, bool)
        t_live = np.zeros(MAX_TRACKS, bool)
        for i, tid in enumerate(self._slot_ids):
            if tid is None or tid not in self.tracks:
                continue
            trk = self.tracks[tid]
            t_labels[i] = trk.label
            t_depth[i] = trk.age // 2
            t_confirmed[i] = trk.confirmed
            t_active[i] = trk.active
            t_live[i] = True

        hist_ids = [tid for tid, track in self.hist_tracks.items()
                    if track.avg_feat.count >= 2]
        h_labels = np.full(self._hist_cap, -2, np.int32)
        h_valid = np.zeros(self._hist_cap, bool)
        hist_of_slot = {}
        for tid in hist_ids:
            s = self._hist_slot.get(tid, -1)
            if s >= 0:
                h_labels[s] = self.hist_tracks[tid].label
                h_valid[s] = True
                hist_of_slot[s] = tid

        n_depth = (self.max_age + 2) // 2
        fill_val = min(self.max_assoc_cost + 0.1, 1.0)
        # ONE batched host->device transfer for all the small mask arrays
        # (each separate upload pays the platform's fixed transfer latency)
        (t_labels_d, t_depth_d, t_confirmed_d, t_active_d, t_live_d,
         h_labels_d, h_valid_d) = jax.device_put(
            (t_labels, t_depth, t_confirmed, t_active, t_live,
             h_labels, h_valid))
        out = _cascade_kernel(
            self.kf_cfg, self.metric, n_depth, self.motion_weight,
            self.max_assoc_cost, 1.0 - self.iou_thresh, fill_val,
            self.occlusion_thresh, self.conf_thresh, self.max_reid_cost,
            1.0 - self.duplicate_thresh,
            means, covs, tlbrs, dev_valid, feat_sum, feat_count,
            t_labels_d, t_depth_d, t_confirmed_d, t_active_d, t_live_d,
            d_tlbrs_dev, d_labels_dev, d_conf_dev, d_valid_dev, emb_dev,
            hist_sum, hist_count, h_labels_d, h_valid_d)

        pending_infos = [info for _, info in self._pending]
        return {
            'frame_id': frame_id,
            'fetch': (pending_infos, out, d_tlbrs_dev, d_labels_dev,
                      d_conf_dev),
            'det_dev': det_dev,
            'emb_dev': emb_dev,
            'host_emb': host_emb,
            'hist_of_slot': hist_of_slot,
            'state': (means, covs, tlbrs, dev_valid, dv_ages, dv_inl,
                      kps, kpv, feat_sum, feat_count),
            'hist_store': (hist_sum, hist_count),
        }

    def update_device_mid(self, token, fetched):
        """Phase B: consume phase-A data, make the association decisions,
        dispatch the commit kernel; ``token['fetch']`` of the result is
        the commit info vector for the final batched readback."""
        frame_id = token['frame_id']
        host_emb = token['host_emb']
        hist_of_slot = token['hist_of_slot']
        d_tlbrs_dev, d_labels_dev, d_conf_dev, d_valid_dev = token['det_dev']
        emb_dev = token['emb_dev']
        (means, covs, tlbrs, dev_valid, dv_ages, dv_inl, kps, kpv,
         feat_sum, feat_count) = token['state']
        hist_sum, hist_count = token['hist_store']

        infos, cascade_out, d_tlbrs, d_labels, d_conf = fetched
        self.sync(infos=infos)
        occluded, col4row, u_det_conf, reid_c4r, rect_c4r = cascade_out
        d_tlbrs = d_tlbrs.astype(np.float32)

        # NOTE: sync() may have retired tracks (gap-frame losses) or
        # cleared everything (camera failure); mask decisions accordingly
        slot_ids = self._slot_ids

        matches = {}
        u_trk = set()
        for i, tid in enumerate(slot_ids):
            if tid is None or tid not in self.tracks:
                continue
            if col4row[i] >= 0:
                matches[i] = int(col4row[i])
            else:
                u_trk.add(i)

        # reID decisions
        reid_matches = []   # (trk_id, det_id, hist_slot)
        reid_taken = set()
        for s in range(self._hist_cap):
            j = int(reid_c4r[s])
            if j >= 0 and s in hist_of_slot:
                tid = hist_of_slot[s]
                if tid in self.hist_tracks:
                    reid_matches.append((tid, j, s))
                    reid_taken.add(j)
        invalid_u_det = [int(j) for j in np.flatnonzero(u_det_conf & occluded)]
        reid_u_det = [int(j) for j in np.flatnonzero(u_det_conf & ~occluded)
                      if j not in reid_taken]

        # rectify (tracker.py:387-401)
        merge_src = np.full(MAX_TRACKS, -1, np.int32)
        for i, u_tid in enumerate(slot_ids):
            jcol = int(rect_c4r[i])
            if jcol < 0 or u_tid is None or i not in u_trk:
                continue
            m_tid = slot_ids[jcol] if jcol < len(slot_ids) else None
            if m_tid is None or jcol not in matches or \
                    m_tid not in self.tracks or u_tid not in self.tracks:
                continue
            det_id = matches[jcol]
            t_u = self.tracks[u_tid]
            t_m = self.tracks[m_tid]
            if t_m.end_frame < t_u.start_frame:
                LOGGER.debug(f"{'Merged:':<14}{u_tid} -> {m_tid}")
                t_m.merge_continuation(t_u)
                merge_src[jcol] = i
                u_trk.discard(i)
                del self.tracks[u_tid]
                self._slot_ids[i] = None
            else:
                LOGGER.debug(f"{'Duplicate:':<14}{m_tid} -> {u_tid}")
                u_trk.discard(i)
                u_trk.add(jcol)
                matches[i] = det_id
                del matches[jcol]

        # unmatched tracks age / die (tracker.py:274-284)
        match_det = np.full(MAX_TRACKS, -1, np.int32)
        feat_ok = np.zeros(MAX_TRACKS, bool)
        new_ages = np.zeros(MAX_TRACKS, np.int32)
        new_valid = np.zeros(MAX_TRACKS, bool)
        hist_dst = np.full(MAX_TRACKS, -1, np.int32)
        for i, det_id in matches.items():
            match_det[i] = det_id
            feat_ok[i] = not occluded[det_id]
            new_valid[i] = True
            new_ages[i] = 0
        for i in list(u_trk):
            tid = slot_ids[i]
            track = self.tracks[tid]
            track.mark_missed()
            if not track.confirmed:
                LOGGER.debug(f"{'Unconfirmed:':<14}{track}")
                del self.tracks[tid]
                self._slot_ids[i] = None
                continue
            if track.age > self.max_age:
                LOGGER.info(f"{'Lost:':<14}{track}")
                self._retire(tid, i)
                continue
            new_valid[i] = True
            new_ages[i] = track.age

        # assign history slots: quarantined live-feature slots save now
        for s in list(self._quarantined):
            # find which hist track points at this pending slot
            for tid, marker in list(self._hist_slot.items()):
                if marker == -s - 1:
                    if tid in self.hist_tracks:
                        dst = self._alloc_hist_slot(tid)
                        hist_dst[s] = dst
                    else:
                        self._hist_slot.pop(tid, None)
            self._quarantined.discard(s)

        # reinstates + new tracks get slots
        reinstate_hist = np.full(MAX_TRACKS, -1, np.int32)
        create_det = np.full(MAX_TRACKS, -1, np.int32)
        reinstated = []
        for tid, det_id, hslot in reid_matches:
            slot = self._free_slot()
            if slot is None:
                self.overflow.bump('track_slots_exhausted')
                break
            track = self.hist_tracks.pop(tid)
            self._hist_slot.pop(tid, None)
            LOGGER.info(f"{'Reidentified:':<14}{track}")
            track.reinstate(frame_id, d_tlbrs[det_id].astype(np.float64),
                            track.state,
                            host_emb[det_id] if host_emb is not None else None)
            if host_emb is None:
                track.avg_feat.count += 1  # device side adds the embedding
            self.tracks[tid] = track
            self._slot_ids[slot] = tid
            create_det[slot] = det_id
            reinstate_hist[slot] = hslot
            new_valid[slot] = True
            new_ages[slot] = 0
            reinstated.append((slot, tid))

        new_tracks = []
        for det_id in invalid_u_det + reid_u_det:
            slot = self._free_slot()
            if slot is None:
                self.overflow.bump('track_slots_exhausted')
                break
            new_trk = Track(frame_id, d_tlbrs[det_id].astype(np.float64),
                            None, int(d_labels[det_id]), self.confirm_hits)
            self.tracks[new_trk.trk_id] = new_trk
            self._slot_ids[slot] = new_trk.trk_id
            create_det[slot] = det_id
            new_valid[slot] = True
            new_ages[slot] = 0
            new_tracks.append((slot, new_trk.trk_id))
            LOGGER.debug(f"{'Detected:':<14}{new_trk}")

        # commit: one dispatch + readback 2
        (merge_src_d, hist_dst_d, reinstate_hist_d, match_det_d,
         feat_ok_d, create_det_d, new_ages_d, new_valid_d) = jax.device_put(
            (merge_src, hist_dst, reinstate_hist, match_det,
             feat_ok, create_det, new_ages, new_valid))
        new_state, self._hist_store, commit_info = _commit_kernel(
            self.kf_cfg, means, covs, tlbrs, dev_valid, dv_ages, dv_inl,
            kps, kpv, feat_sum, feat_count, hist_sum, hist_count,
            d_tlbrs_dev, emb_dev,
            merge_src_d, hist_dst_d, reinstate_hist_d, match_det_d,
            feat_ok_d, create_det_d, new_ages_d, new_valid_d,
            self._frame_rect_dev)
        self._dev_state = new_state
        return {
            'fetch': commit_info,
            'frame_id': frame_id,
            'host_emb': host_emb,
            'slot_ids': slot_ids,
            'matches': matches,
            'occluded': occluded,
            'feat_ok': feat_ok,
            'reinstated': reinstated,
            'new_tracks': new_tracks,
        }

    def update_device_end(self, token, flat):
        """Phase C: apply the commit results to the host Track mirrors."""
        frame_id = token['frame_id']
        host_emb = token['host_emb']
        slot_ids = token['slot_ids']
        matches = token['matches']
        occluded = token['occluded']
        feat_ok = token['feat_ok']
        reinstated = token['reinstated']
        new_tracks = token['new_tracks']
        t = MAX_TRACKS
        next_tlbrs = flat[:t * 4].reshape(t, 4).astype(np.float64)
        out_of_frame = flat[t * 4:t * 5] > 0.5
        cm = flat[t * 5:t * 5 + t * 8].reshape(t, 8)
        cc = flat[t * 5 + t * 8:].reshape(t, 8, 8)

        # host mirror application
        for i, det_id in matches.items():
            tid = slot_ids[i]
            track = self.tracks.get(tid)
            if track is None:
                continue
            is_valid = bool(feat_ok[i])
            if track.hits == self.confirm_hits - 1:
                LOGGER.info(f"{'Found:':<14}{track}")
            if out_of_frame[i]:
                is_valid = False
                if track.confirmed:
                    LOGGER.info(f"{'Out:':<14}{track}")
            track.add_detection(frame_id, next_tlbrs[i], (cm[i], cc[i]),
                                host_emb[det_id] if host_emb is not None
                                else None, is_valid and host_emb is not None)
            if is_valid and host_emb is None:
                track.avg_feat.count += 1  # features live on device
            if out_of_frame[i]:
                self._retire(tid, i)
        for slot, tid in reinstated + new_tracks:
            track = self.tracks.get(tid)
            if track is None:
                continue
            track.state = (cm[slot], cc[slot])
            track.bboxes[-1] = next_tlbrs[slot]
            if out_of_frame[slot]:
                if track.confirmed:
                    LOGGER.info(f"{'Out:':<14}{track}")
                self._retire(tid, slot)

        self._mirrors_dirty = False

    # -- helpers --------------------------------------------------------------

    def _mark_lost(self, trk_id):
        """Legacy helper (tracker.py:295-300)."""
        slot = self._slot_ids.index(trk_id) \
            if trk_id in self._slot_ids else None
        self._retire(trk_id, slot)

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
