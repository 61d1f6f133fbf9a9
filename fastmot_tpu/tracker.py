"""Multi-object tracker: KLT + Kalman prediction and cascaded association.

Behavioral reference: fastmot/tracker.py (MultiTracker). The association
semantics are preserved — age-cascaded appearance+motion matching, IoU
stages for active and unconfirmed tracks, greedy reID against track
history, duplicate rectification (tracker.py:185-293, 368-401) — but the
state machine is inverted for TPU serving, where (measured on this
environment) every host<->device transfer costs ~26 ms latency while the
kernels themselves execute in well under a millisecond:

  * ALL tracking state is device-resident: Kalman means/covariances,
    boxes, ages, hits, labels, start/end frames, flow keypoints, running
    appearance-feature sums, and the reID history store (features +
    labels + LRU stamps). It chains across frames on device.
  * Tracking-only frames (N-1 of every N) are ONE dispatch with zero
    synchronization (_chained_track_kernel).
  * Association frames are ALSO one dispatch (_assoc_kernel): the full
    cascade, the lifecycle DECISIONS (rectify/merge, aging, deletion,
    retirement, reID reinstation, slot allocation for new tracks, history
    LRU maintenance), and the state commit are fused into a single jitted
    program. Nothing blocks: the per-frame info vectors are fetched in
    one batched device_get whenever the host next needs its mirrors
    (visible_tracks / sync), and the host REPLAYS the device's decisions
    onto the Track-object mirrors (IDs, logging, txt output).
  * The host keeps only presentation state: the track dictionary, ID
    assignment, the history id<->slot map, logging.

Slot lifecycle is decided ON DEVICE: free slots are allocated to
reinstates then new detections in ascending order (mirroring the host's
first-free rule), with drops counted when capacity is exhausted.
"""
from __future__ import annotations

import logging
import os
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

# device state tuple layout (per track slot)
#  0 means [T,8]   1 covs [T,8,8]  2 tlbrs [T,4]   3 valid [T]
#  4 ages [T]      5 hits [T]      6 labels [T]    7 start_f [T]
#  8 end_f [T]     9 lost_pending [T] (confirmed track lost in a gap
#                     frame; its features await a history save)
# 10 inl [T]      11 kps [T,K,2]  12 kpv [T,K]
# 13 feat_sum [T,F]  14 feat_count [T]
N_STATE = 15

# history store tuple layout (per history slot)
#  0 hist_sum [H,F]  1 hist_count [H]  2 h_labels [H]  3 h_valid [H]
#  4 h_lru [H] (insertion frame stamp)  5 h_hits [H]
N_HIST = 6


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


def _chained_track_core(cfg: KalmanConfig, spec, age_penalty: float,
                        confirm_hits: int,
                        prev_state, cur_frame, seed, state,
                        trans, acc_cov, frame_tlbr,
                        f_cap: int | None = None):
    """One tracking-only frame entirely on device (mot.py:162-164 path):
    frame preprocess -> in-kernel depth sort (flow.py:157) -> corner
    management / pyramidal LK / RANSAC -> KF warp/predict/KLT-update ->
    out-of-frame + camera-failure validity updates. Returns the chained
    state and a small flat info vector for deferred host bookkeeping."""
    from .ops import flow_kernels as fk

    (means, covs, tlbrs, valid, ages, hits, labels, start_f, end_f,
     lost_pending, inl, kps, kp_valid, feat_sum, feat_count) = state

    cur_state = fk._preprocess_jit(spec, cur_frame)
    t_cap = means.shape[0]
    if f_cap is None:
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
    # confirmed tracks lost here keep their features pending a history
    # save at the next association; camera failure clears WITHOUT saving
    # (tracker.py:160-162)
    confirmed = hits >= confirm_hits
    new_lost_pending = jnp.where(h_ok, lost_pending | (lost & confirmed),
                                 jnp.zeros_like(lost_pending))
    kpv_new = kpv_new & h_ok & new_valid[:, None]
    new_tlbrs = jnp.where(valid[:, None], next_tlbrs, tlbrs)

    new_state = (means, covs, new_tlbrs, new_valid, ages, hits, labels,
                 start_f, end_f, new_lost_pending, new_inl,
                 kps_new, kpv_new, feat_sum, feat_count)
    next_seed = seed + jnp.uint32(1)   # RNG seed stays device-resident
    # small flat info vector (~10KB): one transfer, batched with others
    info = jnp.concatenate([
        a.astype(jnp.float32).reshape(-1) for a in (
            h_ok.reshape(-1), h_mat, next_tlbrs, lost, has_klt, klt_tlbrs,
            new_inl, bg_prev, bg_cur, bg_inlier,
            est_valid[slot] & in_flow)])
    return cur_state, new_state, info, next_seed


_chained_track_kernel = partial(
    jax.jit, static_argnames=('cfg', 'spec', 'age_penalty', 'confirm_hits',
                              'f_cap')
)(_chained_track_core)


# ---------------------------------------------------------------------------
# Multi-dispatch gap frame (single-stream hot path): preprocess ->
# points -> LK -> commit as four chained kernels. Pyramidal LK's
# while-loops compile an order of magnitude faster in their own small
# kernel (same VMEM-residency effect as the association solvers); the
# pyramids/tables already materialize at kernel boundaries because they
# persist as flow state across frames, so the split adds no HBM traffic.
# ---------------------------------------------------------------------------

def _gap_pre_core(spec, cur_frame, state, prev_state, f_cap: int):
    """Current-frame preprocess + depth sort + corner management + LK
    point assembly in one dispatch (neither half contains a while-loop,
    so fusing them is safe from the big-kernel loop penalty and saves
    one enqueue — the dispatch RPC path is the single-stream frame-rate
    limiter in the tunnel-attached environment)."""
    from .ops import flow_kernels as fk

    cur_state = fk._preprocess_jit(spec, cur_frame)
    return (cur_state,) + _gap_points_core(spec, state, prev_state, f_cap)


def _gap_points_core(spec, state, prev_state, f_cap: int):
    """Depth sort + corner management + LK point assembly. ``f_cap`` is
    the static flow-track budget for this frame (fk.flow_budget)."""
    from .ops import flow_kernels as fk   # noqa: F401 (spec types)

    (means, covs, tlbrs, valid, ages, hits, labels, start_f, end_f,
     lost_pending, inl, kps, kp_valid, feat_sum, feat_count) = state
    active = valid & (ages < 2)
    key = -tlbrs[:, 3] + ages.astype(jnp.float32) * 1e-3
    key = jnp.where(active, key, jnp.inf)
    order = jnp.argsort(key)
    forder = order[:f_cap]
    f_valid = active[forder]
    f_tlbrs = tlbrs[forder]
    f_kps = kps[forder]
    f_kpv = kp_valid[forder] & f_valid[:, None]
    all_prev, all_valid, inside = fk.flow_points_core(
        spec, prev_state, f_tlbrs, f_valid, f_kps, f_kpv)
    return all_prev, all_valid, inside, forder, f_tlbrs, f_valid


def _gap_commit_core(cfg: KalmanConfig, spec, age_penalty: float,
                     confirm_hits: int, state,
                     inside, f_tlbrs, f_valid, forder,
                     all_prev, all_cur, status, seed,
                     trans, acc_cov, frame_tlbr):
    """RANSAC + KF warp/predict/update + validity commit (the post-LK
    half of _chained_track_core, code-identical)."""
    from .ops import flow_kernels as fk

    (means, covs, tlbrs, valid, ages, hits, labels, start_f, end_f,
     lost_pending, inl, kps, kp_valid, feat_sum, feat_count) = state
    t_cap = means.shape[0]
    f_cap = f_tlbrs.shape[0]   # static flow budget chosen by the caller
    active = valid & (ages < 2)

    (h_ok, h_mat, bg_prev, bg_cur, bg_inlier, est, est_valid, inl_ratio,
     trk_prev, trk_cur, out_kp_valid) = fk.flow_post_core(
        spec, f_tlbrs, f_valid, inside, all_prev, all_cur, status, seed)

    pos = jnp.full(t_cap, f_cap, jnp.int32).at[forder].set(
        jnp.arange(f_cap, dtype=jnp.int32))
    in_flow = (pos < f_cap) & active
    slot = jnp.minimum(pos, f_cap - 1)
    has_klt = in_flow & est_valid[slot]
    klt_tlbrs = est[slot]
    new_inl = jnp.where(has_klt, inl_ratio[slot], inl)

    kps_new = jnp.where(in_flow[:, None, None], trk_cur[slot], kps)
    kpv_new = jnp.where(in_flow[:, None], out_kp_valid[slot], kp_valid)
    kpv_new = jnp.where((in_flow & ~est_valid[slot])[:, None], False,
                        kpv_new)

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
    confirmed = hits >= confirm_hits
    new_lost_pending = jnp.where(h_ok, lost_pending | (lost & confirmed),
                                 jnp.zeros_like(lost_pending))
    kpv_new = kpv_new & h_ok & new_valid[:, None]
    new_tlbrs = jnp.where(valid[:, None], next_tlbrs, tlbrs)

    new_state = (means, covs, new_tlbrs, new_valid, ages, hits, labels,
                 start_f, end_f, new_lost_pending, new_inl,
                 kps_new, kpv_new, feat_sum, feat_count)
    next_seed = seed + jnp.uint32(1)
    info = jnp.concatenate([
        a.astype(jnp.float32).reshape(-1) for a in (
            h_ok.reshape(-1), h_mat, next_tlbrs, lost, has_klt, klt_tlbrs,
            new_inl, bg_prev, bg_cur, bg_inlier,
            est_valid[slot] & in_flow)])
    return new_state, info, next_seed


_gap_points_kernel = partial(
    jax.jit, static_argnames=('spec', 'f_cap'))(_gap_points_core)

_gap_pre_kernel = partial(
    jax.jit, static_argnames=('spec', 'f_cap'))(_gap_pre_core)


@partial(jax.jit, static_argnames=('spec',))
def _lk_kernel(spec, prev_pyr, prev_tabs, cur_pyr, cur_tabs,
               all_prev, all_valid):
    from .ops import flow_kernels as fk
    return fk.lk_core(spec, prev_pyr, prev_tabs, cur_pyr, cur_tabs,
                      all_prev, all_valid)


_gap_commit_kernel = partial(
    jax.jit, static_argnames=('cfg', 'spec', 'age_penalty', 'confirm_hits')
)(_gap_commit_core)


def _lk_commit_core(cfg: KalmanConfig, spec, age_penalty: float,
                    confirm_hits: int,
                    prev_pyr, prev_tabs, cur_pyr, cur_tabs,
                    all_prev, all_valid, state,
                    inside, f_tlbrs, f_valid, forder, seed,
                    trans, acc_cov, frame_tlbr):
    """LK + RANSAC/KF/commit in ONE dispatch (gap frame: 3 -> 2
    enqueues). The LK while-loop tolerates this fusion — unlike the
    round-2 full-gap fusion — because the big table BUILD stays in the
    preceding kernel; commit's RANSAC/smallmat work is loop-free and
    only consumes the loop's output."""
    from .ops import flow_kernels as fk
    all_cur, status = fk.lk_core(spec, prev_pyr, prev_tabs, cur_pyr,
                                 cur_tabs, all_prev, all_valid)
    return _gap_commit_core(cfg, spec, age_penalty, confirm_hits, state,
                            inside, f_tlbrs, f_valid, forder,
                            all_prev, all_cur, status, seed,
                            trans, acc_cov, frame_tlbr)


_lk_commit_kernel = partial(
    jax.jit, static_argnames=('cfg', 'spec', 'age_penalty', 'confirm_hits')
)(_lk_commit_core)


# ---------------------------------------------------------------------------
# Chained gap frames (offline/file mode): K consecutive tracking-only
# frames in TWO dispatches instead of 2K. Dispatch 1 preprocesses ALL K
# frames (vmapped pyramid + window-table builds — loop-free, so batching
# them is safe); dispatch 2 is one lax.scan whose body is points + LK +
# commit — the exact fusion shape _lk_commit_core already proved the LK
# while-loop tolerates (the big table builds stay upstream). On a
# dispatch-latency-bound link (the dev tunnel: 0.03-1 ms per enqueue RPC)
# this halves the per-gap-frame enqueue cost again; on production hosts
# it removes per-frame launch overhead. Outputs are identical to K
# sequential track() calls — the host never sat between gap frames
# anyway (all decisions were already device-resident and deferred).
# ---------------------------------------------------------------------------

def _gap_chain_pre_core(spec, *frames):
    """Stack + preprocess K frames in ONE dispatch (frames arrive as
    separate args so the stack fuses into the kernel instead of being
    its own enqueue)."""
    from .ops import flow_kernels as fk
    stacked = jnp.stack(frames)
    return jax.vmap(lambda f: fk._preprocess_jit(spec, f))(stacked)


def _gap_chain_core(cfg: KalmanConfig, spec, age_penalty: float,
                    confirm_hits: int, f_cap: int,
                    cur_states, flow_state, state, seed,
                    trans, acc_cov, frame_tlbr):
    """lax.scan over the per-gap-frame body: point assembly from the
    previous frame's state, pyramidal LK, RANSAC/KF/commit. The carry
    threads (prev flow state, tracker state, RNG seed); xs are the K
    preprocessed frame states; ys stack the K per-frame info vectors."""

    def body(carry, cur_state):
        prev_flow, st, sd = carry
        all_prev, all_valid, inside, forder, f_tlbrs, f_valid = \
            _gap_points_core(spec, st, prev_flow, f_cap)
        new_st, info, next_sd = _lk_commit_core(
            cfg, spec, age_penalty, confirm_hits,
            prev_flow[0], prev_flow[1], cur_state[0], cur_state[1],
            all_prev, all_valid, st,
            inside, f_tlbrs, f_valid, forder, sd,
            trans, acc_cov, frame_tlbr)
        return (cur_state, new_st, next_sd), info

    (flow_f, state_f, seed_f), infos = jax.lax.scan(
        body, (flow_state, state, seed), cur_states)
    return state_f, flow_f, seed_f, infos


_gap_chain_kernel = partial(jax.jit, static_argnames=(
    'cfg', 'spec', 'age_penalty', 'confirm_hits', 'f_cap'))(_gap_chain_core)


_gap_chain_pre_kernel = partial(
    jax.jit, static_argnames=('spec',))(_gap_chain_pre_core)

# NOTE (round 4, measured): fusing _gap_chain_pre_core INTO
# _gap_chain_core (one dispatch for preprocess + scan) looked like a
# free enqueue saved, but regressed the bench 186 -> 49 FPS median:
# with the K stacked frame pyramids/gradient/window tables live as the
# scan's xs inside one kernel, XLA keeps the whole K-frame table set
# resident and the scan body's LK while-loop loses its standalone
# buffer reuse. Keep preprocess and scan as TWO dispatches.


def _assoc_forbid(max_assoc_cost: float, iou_gate: float,
                  fill_val: float) -> float:
    """Forbidden-entry level for the cascade's auctions.

    Kept at the validated 4.5 for every gate configuration: lowering it
    toward 2 x the max finite entry (2.25 at the default gates) looked
    like a free walk-length win but MEASURED 7-15x slower on
    production-shaped degenerate matrices (rounds 104 -> 800+,
    scripts/prof_auction.py shapes) — with a small forbid/finite margin,
    starving rows flip between finite and forbidden columns across
    epsilon phases instead of settling. A 'parking columns' variant
    (rectangular padding so displaced rows always find a free column)
    converged in 24 rounds but destroyed the forced-scarcity price
    discovery entirely (5/40 correct pairs). See docs/PERFORMANCE.md
    negative results."""
    del max_assoc_cost, iou_gate, fill_val
    return 4.5


def _cascade_stages(cfg: KalmanConfig, metric: dist.Metric, n_depth: int,
                    motion_weight: float, max_assoc_cost: float,
                    iou_gate: float, fill_val: float,
                    occlusion_thresh: float, conf_thresh: float,
                    max_reid_cost: float, dup_gate: float,
                    means, covs, tlbrs, t_valid, feat_sum, feat_count,
                    t_labels, t_depth, t_confirmed, t_active,
                    d_tlbrs, d_labels, d_conf, d_valid, d_embeddings,
                    hist_sum, hist_count, h_labels, h_valid):
    """The COMPLETE association cascade (tracker.py:185-247): age-cascaded
    appearance+motion stage, IoU stages for active and unconfirmed tracks,
    greedy reID against the history store, duplicate-rectify candidates."""
    forbid = _assoc_forbid(max_assoc_cost, iou_gate, fill_val)
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

    # stage 1: age-cascaded matching over depth-bucket row masks.
    # eps_final 1e-2: fused/gated costs live in [0, ~1] and the auction's
    # convergence cost is O(price range / eps) bidding rounds when many
    # near-tie entries contest (profiled at 10-17 ms per association
    # frame at 1e-3 with degenerate appearance costs); ties within 1% of
    # the gate are tracking noise, not signal, so the coarser tolerance
    # trades nothing measurable for a ~10x smaller worst case.
    for depth in range(n_depth):
        row_valid = t_valid & t_confirmed & (t_depth == depth)
        _, c4r = asg.auction_lap(cost, row_valid, u_det, eps_final=1e-2,
                                 forbid=forbid)
        u_det, col4row_final = take(u_det, col4row_final, c4r, row_valid)

    # stage 2: IoU matching for remaining active confirmed tracks
    row_valid = t_valid & t_confirmed & t_active & (col4row_final < 0)
    _, c4r = asg.auction_lap(iou_cost, row_valid, u_det, eps_final=1e-2,
                             forbid=forbid)
    u_det, col4row_final = take(u_det, col4row_final, c4r, row_valid)

    # stage 3: IoU matching for unconfirmed tracks
    row_valid = t_valid & ~t_confirmed
    _, c4r = asg.auction_lap(iou_cost, row_valid, u_det, eps_final=1e-2,
                             forbid=forbid)
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


def _normalized_feats(feat_sum, feat_count):
    avg = feat_sum / jnp.maximum(feat_count, 1.0)[:, None]
    norm = jnp.linalg.norm(avg, axis=1, keepdims=True)
    return avg / jnp.where(norm > 0, norm, 1.0)


# ---------------------------------------------------------------------------
# Multi-dispatch cascade (single-stream hot path).
#
# The cascade math is identical to _cascade_stages, but the solver
# while-loops are compiled in SMALL kernels: inside any sizeable module
# XLA spills the auction/greedy loop state out of VMEM and each bidding
# round costs an order of magnitude more (op-trace: the same solves run
# 0.2 ms standalone vs 10+ ms fused). The pieces chain through device
# arrays only — the host never reads between dispatches.
# ---------------------------------------------------------------------------

def _assoc_costs_core(cfg: KalmanConfig, metric: dist.Metric, n_depth: int,
                      motion_weight: float, max_assoc_cost: float,
                      iou_gate: float, fill_val: float,
                      occlusion_thresh: float, confirm_hits: int,
                      state, hist, d_tlbrs, d_labels, d_conf, d_valid,
                      d_embeddings, emb_cap: int | None = None):
    """Cost matrices + row masks for every cascade stage, one dispatch.

    ``emb_cap`` (static): detections at padded index >= emb_cap carry no
    embedding (the fused extract ran under its crop budget) and are
    treated exactly like occluded detections — appearance-free
    association via the motion/IoU stages, excluded from reID and from
    feature absorption. The budget only engages on small scenes (see
    update_device_fused); overflow is counted and warned."""
    (means, covs, tlbrs, t_valid, ages, hits, t_labels, start_f, end_f,
     lost_pending, inl, kps, kpv, feat_sum, feat_count) = state
    hist_sum, hist_count, h_labels, h_valid, h_lru, h_hits = hist
    t_confirmed = hits >= confirm_hits
    t_active = ages < 2
    t_depth = ages // 2
    h_reid_ok = h_valid & (hist_count >= 2.0)

    occluded = geom.find_occluded(d_tlbrs, occlusion_thresh, d_valid)
    if emb_cap is not None and emb_cap < d_tlbrs.shape[0]:
        occluded = occluded | (jnp.arange(d_tlbrs.shape[0]) >= emb_cap)
    t_feats = _normalized_feats(feat_sum, feat_count)
    empty = (feat_count < 1.0)[:, None] | occluded[None, :]
    cost = dist.cdist(t_feats, d_embeddings, metric,
                      empty_mask=empty, fill_val=fill_val)
    m_dist = kf.batched_maha_distance(cfg, means, covs, d_tlbrs)
    cost = asg.fuse_motion(cost, m_dist, motion_weight)
    cost = asg.gate_cost(cost, t_labels, d_labels, max_assoc_cost)

    iou_cost = dist.iou_dist(tlbrs, d_tlbrs)
    iou_cost = asg.gate_cost(iou_cost, t_labels, d_labels, iou_gate)

    h_feats = _normalized_feats(hist_sum, hist_count)
    reid_cost = dist.cdist(h_feats, d_embeddings, metric)
    reid_cost = asg.gate_cost(reid_cost, h_labels, d_labels)

    depth_masks = tuple(t_valid & t_confirmed & (t_depth == d)
                        for d in range(n_depth))
    base_iou_active = t_valid & t_confirmed & t_active
    base_unconfirmed = t_valid & ~t_confirmed
    col4row0 = jnp.full(tlbrs.shape[0], -1, jnp.int32)
    return (cost, iou_cost, reid_cost, occluded, h_reid_ok, depth_masks,
            base_iou_active, base_unconfirmed, d_valid, col4row0)


def _stage_core(exclude_matched: bool, cost, base_mask, u_det,
                col4row_final, eps: float = 1e-2,
                forbid: float = asg._FORBID):
    """One auction stage: solve, absorb matches, consume detections.

    ``eps`` is the auction's final tolerance (see the eps_final comment
    in _cascade_stages); the association parity oracle runs the cascade
    at 1e-4 so near-tie tie-breaks cannot mask semantic divergence."""
    row_valid = base_mask & (col4row_final < 0) if exclude_matched \
        else base_mask
    _, c4r = asg.auction_lap(cost, row_valid, u_det, eps_final=eps,
                             forbid=forbid)
    matched = (c4r >= 0) & row_valid
    col4row_final = jnp.where(matched, c4r, col4row_final)
    taken = jnp.zeros_like(u_det).at[
        jnp.where(matched, c4r, u_det.shape[0])].set(True, mode='drop')
    return u_det & ~taken, col4row_final


def _finals_core(conf_thresh: float, max_reid_cost: float, dup_gate: float,
                 confirm_hits: int,
                 tlbrs, t_valid, ages, hits, d_tlbrs, d_conf,
                 reid_cost, h_reid_ok, occluded, u_det, col4row_final):
    """Greedy reID + duplicate-rectify stages (tracker.py:229-241,
    368-387)."""
    t_confirmed = hits >= confirm_hits
    t_active = ages < 2
    u_det_conf = u_det & (d_conf >= conf_thresh)
    reid_cols = u_det_conf & ~occluded
    _, reid_c4r = asg.greedy_match_arrays(reid_cost, h_reid_ok, reid_cols,
                                          max_reid_cost)
    matched_mask = col4row_final >= 0
    inactive_matched = matched_mask & ~t_active
    u_active = t_valid & t_confirmed & t_active & ~matched_mask
    safe_col = jnp.where(matched_mask, col4row_final, 0)
    m_boxes = d_tlbrs[safe_col]
    rect_cost = dist.iou_dist(tlbrs, m_boxes)
    _, rect_c4r = asg.greedy_match_arrays(rect_cost, u_active,
                                          inactive_matched, dup_gate)
    return u_det_conf, reid_c4r, rect_c4r


def _stages_scan_core(n_depth: int, cost, iou_cost, depth_masks,
                      base_iou_active, base_unconfirmed, u_det, col4row,
                      eps: float = 1e-2, forbid: float = asg._FORBID):
    """ALL cascade auction stages in one dispatch via ``lax.scan``.

    Mathematically identical to chaining ``_stage_core`` six times. The
    round-2 negative result (docs/PERFORMANCE.md) was six UNROLLED solver
    instances in one module — six live while-loop bodies competing for
    VMEM. A scan compiles ONE solver body and re-enters it per stage, so
    the loop working set matches the standalone stage kernel while the
    dispatch count drops from n_depth+2 to 1 (each enqueue costs ~0.8 ms
    on the dev tunnel's RPC path — the single-stream frame-rate limiter,
    not the kernels)."""
    masks = jnp.stack(tuple(depth_masks)
                      + (base_iou_active, base_unconfirmed))   # [S, T]
    n_stages = masks.shape[0]
    # stage s uses the fused appearance+motion cost below n_depth and the
    # IoU cost above; only stage n_depth (first IoU stage) excludes
    # already-matched rows (tracker.py:217-227)
    use_iou = jnp.arange(n_stages) >= n_depth
    exclude = jnp.arange(n_stages) == n_depth

    def body(carry, xs):
        u_det, c4r = carry
        mask, is_iou, excl = xs
        stage_cost = jnp.where(is_iou, iou_cost, cost)
        row_valid = mask & jnp.where(excl, c4r < 0,
                                     jnp.ones_like(mask))
        _, c = asg.auction_lap(stage_cost, row_valid, u_det, eps_final=eps,
                               forbid=forbid)
        matched = (c >= 0) & row_valid
        c4r = jnp.where(matched, c, c4r)
        taken = jnp.zeros_like(u_det).at[
            jnp.where(matched, c, u_det.shape[0])].set(True, mode='drop')
        return (u_det & ~taken, c4r), None

    (u_det, col4row), _ = jax.lax.scan(
        body, (u_det, col4row), (masks, use_iou, exclude))
    return u_det, col4row


_assoc_costs_kernel = partial(jax.jit, static_argnames=(
    'cfg', 'metric', 'n_depth', 'motion_weight', 'max_assoc_cost',
    'iou_gate', 'fill_val', 'occlusion_thresh',
    'confirm_hits', 'emb_cap'))(_assoc_costs_core)


def _extract_costs_core(module, out_hw, emb_cap: int,
                        cfg: KalmanConfig, metric: dist.Metric,
                        n_depth: int, motion_weight: float,
                        max_assoc_cost: float, iou_gate: float,
                        fill_val: float, occlusion_thresh: float,
                        confirm_hits: int,
                        params, frame, state, hist,
                        d_tlbrs, d_labels, d_conf, d_valid):
    """Fused ReID extraction + association costs: in-graph crop-resize +
    OSNet + L2 over the first ``emb_cap`` detections, then the full cost
    build — ONE dispatch instead of extract + costs (both halves are
    loop-free, so the fusion is safe from the big-kernel while penalty;
    saves one enqueue RPC and keeps the crop batch out of HBM).

    ``emb_cap`` is the crop budget: detections are compacted valid-first
    by the detector's NMS kernel, so a 64-crop budget covers every
    MOT17-density scene while halving the crop-resize + OSNet cost (the
    two-bucket pattern of ops/flow_kernels.flow_budget). Returns the
    costs tuple plus the padded [D, F] embeddings."""
    from .feature_extractor import _extract_core
    d_cap = d_tlbrs.shape[0]
    emb = _extract_core(module, out_hw, params, frame,
                        d_tlbrs[:emb_cap], d_valid[:emb_cap])
    if emb_cap < d_cap:
        d_emb = jnp.zeros((d_cap, emb.shape[1]), jnp.float32)
        d_emb = jax.lax.dynamic_update_slice(d_emb, emb, (0, 0))
    else:
        d_emb = emb
    costs = _assoc_costs_core(
        cfg, metric, n_depth, motion_weight, max_assoc_cost, iou_gate,
        fill_val, occlusion_thresh, confirm_hits, state, hist,
        d_tlbrs, d_labels, d_conf, d_valid, d_emb, emb_cap=emb_cap)
    return costs, d_emb


_extract_costs_kernel = partial(jax.jit, static_argnames=(
    'module', 'out_hw', 'emb_cap', 'cfg', 'metric', 'n_depth',
    'motion_weight', 'max_assoc_cost', 'iou_gate', 'fill_val',
    'occlusion_thresh', 'confirm_hits'))(_extract_costs_core)

_stage_kernel = partial(jax.jit, static_argnames=(
    'exclude_matched', 'eps', 'forbid'))(_stage_core)

_stages_scan_kernel = partial(jax.jit, static_argnames=(
    'n_depth', 'eps', 'forbid'))(_stages_scan_core)

_finals_kernel = partial(jax.jit, static_argnames=(
    'conf_thresh', 'max_reid_cost', 'dup_gate',
    'confirm_hits'))(_finals_core)


def _cascade_part(cfg: KalmanConfig, metric: dist.Metric, n_depth: int,
                  motion_weight: float, max_assoc_cost: float,
                  iou_gate: float, fill_val: float,
                  occlusion_thresh: float, conf_thresh: float,
                  max_reid_cost: float, dup_gate: float, confirm_hits: int,
                  state, hist, d_tlbrs, d_labels, d_conf, d_valid, d_emb):
    """Cascade half of the association frame: cost building + the
    auction/greedy solvers. Dispatched as its OWN kernel by
    ``update_device``: compiled inside the monolithic association module
    the solver while-loops lose VMEM residency and each bidding round
    costs ~25x its standalone time (profiled 14.9 ms vs 0.5 ms for
    identical inputs), so the solvers get their own compilation unit."""
    (means, covs, tlbrs, valid, ages, hits, labels, start_f, end_f,
     lost_pending, inl, kps, kpv, feat_sum, feat_count) = state
    hist_sum, hist_count, h_labels, h_valid, h_lru, h_hits = hist

    confirmed = hits >= confirm_hits
    active = ages < 2
    depth = ages // 2
    h_reid_ok = h_valid & (hist_count >= 2.0)   # tracker.py:229 count>=2

    return _cascade_stages(
        cfg, metric, n_depth, motion_weight, max_assoc_cost, iou_gate,
        fill_val, occlusion_thresh, conf_thresh, max_reid_cost, dup_gate,
        means, covs, tlbrs, valid, feat_sum, feat_count,
        labels, depth, confirmed, active,
        d_tlbrs, d_labels, d_conf, d_valid, d_emb,
        hist_sum, hist_count, h_labels, h_reid_ok)


def _commit_part(cfg: KalmanConfig, confirm_hits: int, max_age: int,
                 history_size: int,
                 state, hist, d_tlbrs, d_labels, d_conf, d_valid, d_emb,
                 frame_id, frame_tlbr, cascade_out):
    """Commit half of the association frame: lifecycle DECISIONS + state
    commit (tracker.py:258-293 + 368-401) with slot and history
    allocation on device. Returns (new_state, new_hist, info); the info
    vector lets the host replay every decision onto its Track mirrors
    without ever blocking the frame loop."""
    (means, covs, tlbrs, valid, ages, hits, labels, start_f, end_f,
     lost_pending, inl, kps, kpv, feat_sum, feat_count) = state
    hist_sum, hist_count, h_labels, h_valid, h_lru, h_hits = hist
    t_cap = means.shape[0]
    d_cap = d_tlbrs.shape[0]
    h_cap = hist_sum.shape[0]
    t_idx = jnp.arange(t_cap, dtype=jnp.int32)
    d_idx = jnp.arange(d_cap, dtype=jnp.int32)
    h_idx = jnp.arange(h_cap, dtype=jnp.int32)

    confirmed = hits >= confirm_hits
    h_reid_ok = h_valid & (hist_count >= 2.0)

    occluded, col4row, u_det_conf, reid_c4r, rect_c4r = cascade_out

    # ---- rectify: merge vs duplicate (tracker.py:387-401) -----------------
    has_rect = rect_c4r >= 0                      # row i: unmatched active
    j = jnp.where(has_rect, rect_c4r, 0)
    merge_cond = has_rect & (end_f[j] < start_f)  # m=j absorbs u=i
    dup_cond = has_rect & ~merge_cond
    merge_src = jnp.full(t_cap, -1, jnp.int32).at[
        jnp.where(merge_cond, j, t_cap)].set(t_idx, mode='drop')
    merged_away = merge_cond
    # duplicate: the unmatched-active row takes the matched row's det
    dup_det = col4row[j]
    col4row = jnp.where(dup_cond, dup_det, col4row)
    col4row = col4row.at[jnp.where(dup_cond, j, t_cap)].set(-1, mode='drop')

    # ---- lifecycle decisions (tracker.py:258-293) --------------------------
    matched = (col4row >= 0) & valid & ~merged_away
    col4row = jnp.where(matched, col4row, -1)
    live = valid & ~merged_away
    unmatched = live & ~matched
    aged = ages + 1                               # mark_missed
    del_unconf = unmatched & ~confirmed
    retire_age = unmatched & confirmed & (aged > max_age)
    keep_unmatched = unmatched & ~del_unconf & ~retire_age

    # reID reinstates + new tracks share the free-slot pool
    reinstated_h = (reid_c4r >= 0) & h_reid_ok
    reid_det = jnp.where(reinstated_h, reid_c4r, 0)
    taken = jnp.zeros(d_cap, bool).at[
        jnp.where(reinstated_h, reid_det, d_cap)].set(True, mode='drop')
    create_mask = u_det_conf & (occluded | ~taken) & d_valid

    free = (~valid) | merged_away | del_unconf | retire_age
    free_idx = jnp.nonzero(free, size=t_cap, fill_value=t_cap)[0] \
        .astype(jnp.int32)
    n_free = jnp.sum(free)
    r_rank = jnp.cumsum(reinstated_h) - 1          # [H]
    n_reid_req = jnp.sum(reinstated_h)
    c_rank = n_reid_req + jnp.cumsum(create_mask) - 1   # [D]
    r_ok = reinstated_h & (r_rank < n_free)
    c_ok = create_mask & (c_rank < n_free)
    slot_of_reid = jnp.where(
        r_ok, free_idx[jnp.clip(r_rank, 0, t_cap - 1)], t_cap)
    slot_of_create = jnp.where(
        c_ok, free_idx[jnp.clip(c_rank, 0, t_cap - 1)], t_cap)
    n_dropped = (n_reid_req - jnp.sum(r_ok)) + \
        (jnp.sum(create_mask) - jnp.sum(c_ok))

    reinstate_hist = jnp.full(t_cap, -1, jnp.int32).at[
        slot_of_reid].set(h_idx, mode='drop')
    # reinstated slots get their reID detection; fresh slots theirs
    create_det = jnp.full(t_cap, -1, jnp.int32).at[
        slot_of_create].set(d_idx, mode='drop').at[
        slot_of_reid].set(jnp.where(r_ok, reid_det, 0), mode='drop')

    match_det = jnp.where(matched, col4row, -1)
    feat_ok = matched & ~occluded[jnp.where(matched, col4row, 0)]
    re = reinstate_hist >= 0
    c = create_det >= 0

    # ---- commit: merges ----------------------------------------------------
    src = jnp.where(merge_src >= 0, merge_src, t_idx)
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
    hits = jnp.where(has_merge, hits + hits[src], hits)   # track.py:227-237

    # ---- reinstates read the PRE-save history ------------------------------
    rh = jnp.where(re, reinstate_hist, 0)
    feat_sum = jnp.where(re[:, None], hist_sum[rh], feat_sum)
    feat_count = jnp.where(re, hist_count[rh], feat_count)
    re_hits = h_hits[rh]

    # ---- matched KF corrections (tracker.py:258-272) -----------------------
    m = match_det >= 0
    z = d_tlbrs[jnp.where(m, match_det, 0)]
    up_means, up_covs = kf.batched_update(
        cfg, means, covs, z, jnp.zeros(t_cap, dtype=bool),
        jnp.ones(t_cap, dtype=jnp.float32))
    means = jnp.where(m[:, None], up_means, means)
    covs = jnp.where(m[:, None, None], up_covs, covs)

    # ---- creations (new + reinstated): state from detection ----------------
    cz = d_tlbrs[jnp.where(c, create_det, 0)]
    cr_means, cr_covs = kf.batched_create(cfg, cz)
    means = jnp.where(c[:, None], cr_means, means)
    covs = jnp.where(c[:, None, None], cr_covs, covs)
    kpv = jnp.where(c[:, None], False, kpv)
    inl = jnp.where(c, 1.0, inl)
    fresh = c & ~re
    feat_sum = jnp.where(fresh[:, None], 0.0, feat_sum)
    feat_count = jnp.where(fresh, 0.0, feat_count)

    # ---- boxes / out-of-frame BEFORE feature absorption --------------------
    next_tlbrs = geom.as_tlbr(means[:, :4])
    ios_vals = geom.ios(next_tlbrs,
                        jnp.broadcast_to(frame_tlbr, next_tlbrs.shape))
    out_of_frame = (m | c) & (ios_vals < 0.5)

    # ---- feature updates ----------------------------------------------------
    det_of = jnp.where(m, match_det, jnp.where(c, create_det, 0))
    emb = d_emb[det_of]
    upd = (m & feat_ok & ~out_of_frame) | (c & re)
    feat_sum = jnp.where(upd[:, None], feat_sum + emb, feat_sum)
    feat_count = jnp.where(upd, feat_count + 1.0, feat_count)
    tlbrs = jnp.where((m | c)[:, None], next_tlbrs, tlbrs)

    # ---- bookkeeping fields -------------------------------------------------
    new_hits = jnp.where(m, hits + 1, hits)
    new_hits = jnp.where(re, re_hits, new_hits)
    new_hits = jnp.where(fresh, 0, new_hits)
    new_ages = jnp.where(m | c, 0, jnp.where(keep_unmatched, aged, ages))
    new_labels = jnp.where(c, d_labels[jnp.where(c, create_det, 0)], labels)
    new_labels = jnp.where(re, h_labels[rh], new_labels)
    new_start = jnp.where(c, frame_id, start_f)
    new_end = jnp.where(m | c, frame_id, end_f)
    confirmed_after = new_hits >= confirm_hits

    new_valid = (m & ~out_of_frame) | keep_unmatched | (c & ~out_of_frame)

    # ---- history maintenance ------------------------------------------------
    # clear reinstated entries, then save retiring tracks' features:
    # gap-frame losses (lost_pending), age-outs, and out-of-frame exits
    h_valid2 = h_valid & ~(reinstated_h & r_ok)
    save_mask = lost_pending | retire_age | (out_of_frame & confirmed_after)
    # allocation order: invalid slots ascending, then oldest LRU
    alloc_key = jnp.where(h_valid2, h_lru.astype(jnp.float32),
                          -1e9 + h_idx.astype(jnp.float32))
    alloc_order = jnp.argsort(alloc_key).astype(jnp.int32)
    s_rank = jnp.cumsum(save_mask) - 1
    hist_dst = jnp.where(
        save_mask, alloc_order[jnp.clip(s_rank, 0, h_cap - 1)], -1)
    hist_dst = jnp.where(save_mask & (s_rank < h_cap), hist_dst, -1)
    stolen = jnp.sum(jnp.where(hist_dst >= 0, h_valid2[jnp.where(
        hist_dst >= 0, hist_dst, 0)], False))
    hs = jnp.where(hist_dst >= 0, hist_dst, h_cap)
    hist_sum2 = hist_sum.at[hs].set(feat_sum, mode='drop')
    hist_count2 = hist_count.at[hs].set(feat_count, mode='drop')
    h_labels2 = h_labels.at[hs].set(labels, mode='drop')
    h_lru2 = h_lru.at[hs].set(frame_id, mode='drop')
    h_hits2 = h_hits.at[hs].set(new_hits, mode='drop')
    h_valid2 = h_valid2.at[hs].set(True, mode='drop')
    # cap the store at history_size by evicting oldest-inserted entries
    n_valid = jnp.sum(h_valid2)
    excess = jnp.maximum(n_valid - history_size, 0)
    lru_key = jnp.where(h_valid2, h_lru2.astype(jnp.float32), jnp.inf)
    lru_rank = jnp.argsort(jnp.argsort(lru_key))   # rank by insertion age
    evict = h_valid2 & (lru_rank < excess)
    h_valid_final = h_valid2 & ~evict

    new_lost_pending = jnp.zeros_like(lost_pending)
    new_state = (means, covs, tlbrs, new_valid, new_ages, new_hits,
                 new_labels, new_start, new_end, new_lost_pending, inl,
                 kps, kpv, feat_sum, feat_count)
    new_hist = (hist_sum2, hist_count2, h_labels2, h_valid_final, h_lru2,
                h_hits2)

    info = jnp.concatenate([
        a.astype(jnp.float32).reshape(-1) for a in (
            jnp.stack([frame_id.astype(jnp.float32),
                       n_dropped.astype(jnp.float32),
                       stolen.astype(jnp.float32),
                       jnp.sum(d_valid).astype(jnp.float32)]),
            match_det, merge_src, dup_cond, del_unconf, retire_age,
            out_of_frame, hist_dst, reinstate_hist, create_det,
            new_ages, new_hits, new_labels, new_valid, feat_ok,
            jnp.where(evict, 1.0, 0.0),
            next_tlbrs, means, covs)])
    return new_state, new_hist, info


def _assoc_core(cfg: KalmanConfig, metric: dist.Metric, n_depth: int,
                motion_weight: float, max_assoc_cost: float,
                iou_gate: float, fill_val: float,
                occlusion_thresh: float, conf_thresh: float,
                max_reid_cost: float, dup_gate: float,
                confirm_hits: int, max_age: int, history_size: int,
                state, hist, d_tlbrs, d_labels, d_conf, d_valid, d_emb,
                frame_id, frame_tlbr):
    """Full association frame as ONE traceable unit (cascade + commit) —
    used by the vmapped multi-stream batch kernel and the sharding
    dryrun. The single-stream path dispatches the two halves as separate
    kernels (see _cascade_part for why)."""
    cascade_out = _cascade_part(
        cfg, metric, n_depth, motion_weight, max_assoc_cost, iou_gate,
        fill_val, occlusion_thresh, conf_thresh, max_reid_cost, dup_gate,
        confirm_hits, state, hist, d_tlbrs, d_labels, d_conf, d_valid,
        d_emb)
    return _commit_part(
        cfg, confirm_hits, max_age, history_size,
        state, hist, d_tlbrs, d_labels, d_conf, d_valid, d_emb,
        frame_id, frame_tlbr, cascade_out)


_assoc_kernel = partial(jax.jit, static_argnames=(
    'cfg', 'metric', 'n_depth', 'motion_weight', 'max_assoc_cost',
    'iou_gate', 'fill_val', 'occlusion_thresh', 'conf_thresh',
    'max_reid_cost', 'dup_gate', 'confirm_hits', 'max_age',
    'history_size'))(_assoc_core)

_commit_kernel = partial(jax.jit, static_argnames=(
    'cfg', 'confirm_hits', 'max_age', 'history_size'))(_commit_part)


def _finals_commit_core(cfg: KalmanConfig, conf_thresh: float,
                        max_reid_cost: float, dup_gate: float,
                        confirm_hits: int, max_age: int, history_size: int,
                        state, hist, d_tlbrs, d_labels, d_conf, d_valid,
                        d_emb, frame_id, frame_tlbr,
                        reid_cost, h_reid_ok, occluded, u_det, col4row):
    """Greedy reID/rectify + lifecycle commit in one dispatch (one
    enqueue saved; the greedy matchers stay fast in this commit-sized
    unit — verified on the op trace, unlike the six-auction merge)."""
    u_det_conf, reid_c4r, rect_c4r = _finals_core(
        conf_thresh, max_reid_cost, dup_gate, confirm_hits,
        state[2], state[3], state[4], state[5], d_tlbrs, d_conf,
        reid_cost, h_reid_ok, occluded, u_det, col4row)
    return _commit_part(
        cfg, confirm_hits, max_age, history_size, state, hist,
        d_tlbrs, d_labels, d_conf, d_valid, d_emb, frame_id, frame_tlbr,
        (occluded, col4row, u_det_conf, reid_c4r, rect_c4r))


_finals_commit_kernel = partial(jax.jit, static_argnames=(
    'cfg', 'conf_thresh', 'max_reid_cost', 'dup_gate', 'confirm_hits',
    'max_age', 'history_size'))(_finals_commit_core)


def _scan_finals_commit_core(cfg: KalmanConfig, n_depth: int,
                             conf_thresh: float, max_reid_cost: float,
                             dup_gate: float, confirm_hits: int,
                             max_age: int, history_size: int,
                             eps: float, forbid: float,
                             cost, iou_cost, depth_masks, base_iou_active,
                             base_unconfirmed, u_det, col4row,
                             state, hist, d_tlbrs, d_labels, d_conf,
                             d_valid, d_emb, frame_id, frame_tlbr,
                             reid_cost, h_reid_ok, occluded):
    """Cascade stage scan + greedy finals + lifecycle commit in ONE
    dispatch (association frame: 3 -> 2 enqueues). Downstream fusion —
    same pattern as _lk_commit_core: the finals/commit work is loop-free
    and only consumes the scan's (u_det, col4row) output, so the scan's
    single solver body keeps its standalone working set."""
    u_det, col4row = _stages_scan_core(
        n_depth, cost, iou_cost, depth_masks, base_iou_active,
        base_unconfirmed, u_det, col4row, eps=eps, forbid=forbid)
    return _finals_commit_core(
        cfg, conf_thresh, max_reid_cost, dup_gate, confirm_hits,
        max_age, history_size, state, hist, d_tlbrs, d_labels, d_conf,
        d_valid, d_emb, frame_id, frame_tlbr,
        reid_cost, h_reid_ok, occluded, u_det, col4row)


_scan_finals_commit_kernel = partial(jax.jit, static_argnames=(
    'cfg', 'n_depth', 'conf_thresh', 'max_reid_cost', 'dup_gate',
    'confirm_hits', 'max_age', 'history_size', 'eps',
    'forbid'))(_scan_finals_commit_core)


def _assoc_frame_core(module, out_hw, emb_cap: int, cfg: KalmanConfig,
                      metric: dist.Metric, n_depth: int,
                      motion_weight: float, max_assoc_cost: float,
                      iou_gate: float, fill_val: float,
                      occlusion_thresh: float, confirm_hits: int,
                      conf_thresh: float, max_reid_cost: float,
                      dup_gate: float, max_age: int, history_size: int,
                      eps: float, forbid: float,
                      params, frame, state, hist,
                      d_tlbrs, d_labels, d_conf, d_valid,
                      frame_id, frame_tlbr):
    """The WHOLE association frame in ONE dispatch: crop-resize + OSNet
    + L2 + cost build (loop-free, _extract_costs_core) feeding the stage
    scan + finals + lifecycle commit (_scan_finals_commit_core). Same
    upstream-fusion shape as _lk_commit_core: the auction scan's solver
    body only consumes the extract half's outputs, so its working set
    stays standalone-sized while the big OSNet graph fuses upstream.
    Association frame: 2 -> 1 enqueues."""
    costs, d_emb = _extract_costs_core(
        module, out_hw, emb_cap, cfg, metric, n_depth, motion_weight,
        max_assoc_cost, iou_gate, fill_val, occlusion_thresh,
        confirm_hits, params, frame, state, hist,
        d_tlbrs, d_labels, d_conf, d_valid)
    (cost, iou_cost, reid_cost, occluded, h_reid_ok, depth_masks,
     base_iou_active, base_unconf, u_det, col4row) = costs
    return _scan_finals_commit_core(
        cfg, n_depth, conf_thresh, max_reid_cost, dup_gate, confirm_hits,
        max_age, history_size, eps, forbid,
        cost, iou_cost, depth_masks, base_iou_active, base_unconf,
        u_det, col4row, state, hist, d_tlbrs, d_labels, d_conf,
        d_valid, d_emb, frame_id, frame_tlbr,
        reid_cost, h_reid_ok, occluded)


_assoc_frame_kernel = partial(jax.jit, static_argnames=(
    'module', 'out_hw', 'emb_cap', 'cfg', 'metric', 'n_depth',
    'motion_weight', 'max_assoc_cost', 'iou_gate', 'fill_val',
    'occlusion_thresh', 'confirm_hits', 'conf_thresh', 'max_reid_cost',
    'dup_gate', 'max_age', 'history_size', 'eps',
    'forbid'))(_assoc_frame_core)


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
                 flow_cfg=None,
                 assoc_eps=1e-2):
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
        # auction tolerance: 1e-2 in production (see _cascade_stages);
        # the parity oracle passes 1e-4 to pin exact-optimum tie-breaks
        assert 0 < assoc_eps <= 1
        self.assoc_eps = float(assoc_eps)

        self.kf_cfg = KalmanConfig(**_cfg_kwargs(kalman_filter_cfg))
        self.tracks: dict[int, Track] = {}
        self.hist_tracks: OrderedDict[int, Track] = OrderedDict()
        self.flow = Flow(self.size, **_cfg_kwargs(flow_cfg))
        self.frame_rect = np.asarray(
            geom.to_tlbr(np.array([0, 0, *self.size], np.float32)))

        self.klt_bboxes: dict[int, np.ndarray] = {}
        self.homography = None

        self._dt = 1 / 30.0
        # one batched H2D for the dt-dependent constants (init_mats is
        # NumPy: its old eager construction cost ~100 ms/reset in enqueue
        # RPCs on the tunnel-attached dev chip)
        self._acc_cov, self._meas_mat, self._trans_mat = jax.device_put(
            kf.init_mats(self.kf_cfg, self._dt))
        self._frame_rect_dev = jnp.asarray(self.frame_rect, jnp.float32)

        # device-resident state + host presentation mirrors
        self._dev_state = None
        self._hist_store = None
        self._slot_ids: list = [None] * MAX_TRACKS   # slot -> trk_id
        self._hist_slot_tid: dict[int, int] = {}     # hist slot -> trk_id
        self._pending: list = []                     # (kind, meta, info_dev)
        self._mirrors_dirty = True        # host mirrors are authoritative
        self._det_count_hint = 0          # from the last applied assoc info
        self.overflow = OverflowCounters()

    # -- lifecycle ---------------------------------------------------------

    def reset(self, dt):
        """Reset for a new input context (tracker.py:109-119)."""
        self._dt = dt
        self._acc_cov, self._meas_mat, self._trans_mat = jax.device_put(
            kf.init_mats(self.kf_cfg, dt))
        self.hist_tracks.clear()
        self._hist_slot_tid.clear()
        self._hist_store = None
        self._det_count_hint = 0
        Track._count = 0

    def init(self, frame, detections):
        """Initialize from detections in the first frame
        (tracker.py:121-137)."""
        self._pending = []
        self.tracks.clear()
        self._slot_ids = [None] * MAX_TRACKS
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
        # frame marker so buffered consumers snapshot the init frame too
        self._pending.append(('mark', {'frame_id': 0}, None))

    # -- tracking-only frames (device-chained) ------------------------------

    def track(self, frame, frame_id=None):
        """Tracking-only frame: one chained device dispatch, zero host
        syncs (vs compute_flow + apply_kalman, tracker.py:139-148).

        ``frame_id`` (optional) tags the deferred info so buffered
        consumers (sync(snapshots=True)) can emit per-frame track
        snapshots without a per-frame sync."""
        if self.flow.device_state is None:
            self.flow.init(frame)
            return
        if self._dev_state is None or self._mirrors_dirty:
            self._upload_state()
        from .ops import flow_kernels as fk
        n_active = sum(1 for t in self.tracks.values() if t.active)
        self.overflow.bump('flow_tracks_clipped',
                           n_active - fk.MAX_FLOW_TRACKS)
        f_cap = fk.flow_budget(n_active)

        # two chained dispatches (zero host reads): preprocess + point
        # assembly, then pyramidal LK + RANSAC/KF/commit — see the
        # _gap_points_core and _lk_commit_core comment blocks
        spec = self.flow.spec
        prev_state = self.flow.device_state
        (cur_state, all_prev, all_valid, inside, forder, f_tlbrs,
         f_valid) = _gap_pre_kernel(spec, jnp.asarray(frame),
                                    self._dev_state, prev_state,
                                    f_cap=f_cap)
        new_state, info, next_seed = _lk_commit_kernel(
            self.kf_cfg, spec, float(self.age_penalty), self.confirm_hits,
            prev_state[0], prev_state[1], cur_state[0], cur_state[1],
            all_prev, all_valid, self._dev_state,
            inside, f_tlbrs, f_valid, forder, self.flow.seed_dev,
            self._trans_mat, self._acc_cov, self._frame_rect_dev)
        self._dev_state = new_state
        self.flow.advance(cur_state, next_seed)
        self._pending.append(('gap', {'slot_ids': list(self._slot_ids),
                                      'frame_id': frame_id}, info))

    def track_chain(self, frames, frame_ids):
        """K consecutive tracking-only frames in TWO dispatches (the
        offline/file-mode fast path; see the _gap_chain_core comment
        block). Semantically identical to ``for f, i in zip(frames,
        frame_ids): self.track(f, i)`` — gap-frame decisions were
        already device-resident and deferred, so chaining only removes
        enqueue round trips, not host observation points.

        ``frames`` is a sequence of [H, W, 3] uint8 arrays (host or
        device)."""
        if self.flow.device_state is None or len(frames) == 1:
            for f, fid in zip(frames, frame_ids):
                self.track(f, fid)
            return
        if self._dev_state is None or self._mirrors_dirty:
            self._upload_state()
        from .ops import flow_kernels as fk
        n_active = sum(1 for t in self.tracks.values() if t.active)
        self.overflow.bump('flow_tracks_clipped',
                           (n_active - fk.MAX_FLOW_TRACKS) * len(frames))
        f_cap = fk.flow_budget(n_active)

        spec = self.flow.spec
        cur_states = _gap_chain_pre_kernel(
            spec, *[jnp.asarray(f) for f in frames])
        new_state, flow_f, next_seed, infos = _gap_chain_kernel(
            self.kf_cfg, spec, float(self.age_penalty), self.confirm_hits,
            f_cap, cur_states, self.flow.device_state, self._dev_state,
            self.flow.seed_dev, self._trans_mat, self._acc_cov,
            self._frame_rect_dev)
        self._dev_state = new_state
        self.flow.advance(flow_f, next_seed)
        self.flow._frame_count += len(frames) - 1
        self._pending.append(
            ('gap_chain', {'slot_ids': list(self._slot_ids),
                           'frame_ids': list(frame_ids)}, infos))

    # -- association ----------------------------------------------------------

    def update(self, frame_id, detections, embeddings):
        """Host-array association entry (PublicDetector-style recarrays).
        Synchronous: mirrors are current on return (tracker.py:185-293)."""
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
        self.update_device(frame_id, det_dev, jnp.asarray(d_emb),
                           host_emb=d_emb)
        self.sync()

    def update_device(self, frame_id, det_dev, emb_dev, host_emb=None):
        """Device-array association: ONE dispatch, ZERO blocking reads.
        The decisions are made on device (_assoc_kernel); the info vector
        joins the pending queue and is replayed at the next sync()."""
        if self._dev_state is None or self._mirrors_dirty:
            self._upload_state()
        self._ensure_hist_store()
        d_tlbrs_dev, d_labels_dev, d_conf_dev, d_valid_dev = det_dev

        n_depth = (self.max_age + 2) // 2
        fill_val = min(self.max_assoc_cost + 0.1, 1.0)
        # multi-dispatch cascade (zero host reads): every solver
        # while-loop runs in its own small kernel to keep VMEM residency
        # (see the _assoc_costs_core comment block)
        st = self._dev_state
        (cost, iou_cost, reid_cost, occluded, h_reid_ok, depth_masks,
         base_iou_active, base_unconf, u_det, col4row) = \
            _assoc_costs_kernel(
                self.kf_cfg, self.metric, n_depth, self.motion_weight,
                self.max_assoc_cost, 1.0 - self.iou_thresh, fill_val,
                self.occlusion_thresh, self.confirm_hits,
                st, self._hist_store,
                d_tlbrs_dev, d_labels_dev, d_conf_dev, d_valid_dev,
                emb_dev)
        costs = (cost, iou_cost, reid_cost, occluded, h_reid_ok,
                 depth_masks, base_iou_active, base_unconf, u_det, col4row)
        self._stages_and_commit(frame_id, det_dev, emb_dev, costs,
                                host_emb=host_emb)

    def update_device_fused(self, frame_id, frame_dev, det_dev, extractor):
        """Device-array association with the ReID extraction FUSED into
        the cost kernel: crops + OSNet + L2 + cost matrices in one
        dispatch (vs extract + costs as two), with a two-bucket crop
        budget — 64 crops when the scene is small (every MOT17-density
        row), the full padded batch otherwise. Detections beyond the
        budget associate appearance-free like occluded ones; overflow is
        counted at sync and warned."""
        if self._dev_state is None or self._mirrors_dirty:
            self._upload_state()
        self._ensure_hist_store()
        d_tlbrs_dev, d_labels_dev, d_conf_dev, d_valid_dev = det_dev
        d_cap = int(d_tlbrs_dev.shape[0])
        # bucket heuristic: host-side estimate of scene size (active
        # mirrors lag by at most one txt-flush window; the det-count
        # hint comes from the most recently applied association info)
        n_active = sum(1 for t in self.tracks.values() if t.active)
        est = max(n_active, self._det_count_hint)
        emb_cap = 64 if (est <= 56 and d_cap > 64) else d_cap

        n_depth = (self.max_age + 2) // 2
        fill_val = min(self.max_assoc_cost + 0.1, 1.0)
        if not os.environ.get('FASTMOT_SPLIT_ASSOC'):
            # whole association frame as ONE kernel (extract + costs +
            # stage scan + finals + commit — see _assoc_frame_core)
            forbid = _assoc_forbid(self.max_assoc_cost,
                                   1.0 - self.iou_thresh, fill_val)
            new_state, new_hist, info = _assoc_frame_kernel(
                extractor.module, extractor._out_hw, emb_cap,
                self.kf_cfg, self.metric, n_depth, self.motion_weight,
                self.max_assoc_cost, 1.0 - self.iou_thresh, fill_val,
                self.occlusion_thresh, self.confirm_hits,
                self.conf_thresh, self.max_reid_cost,
                1.0 - self.duplicate_thresh, self.max_age,
                self.history_size, self.assoc_eps, forbid,
                extractor.params, frame_dev, self._dev_state,
                self._hist_store,
                d_tlbrs_dev, d_labels_dev, d_conf_dev, d_valid_dev,
                np.int32(frame_id), self._frame_rect_dev)
            self._dev_state = new_state
            self._hist_store = new_hist
            self._pending.append(('assoc', {'frame_id': frame_id,
                                            'host_emb': None,
                                            'emb_cap': emb_cap}, info))
            return
        costs, emb_dev = _extract_costs_kernel(
            extractor.module, extractor._out_hw, emb_cap,
            self.kf_cfg, self.metric, n_depth, self.motion_weight,
            self.max_assoc_cost, 1.0 - self.iou_thresh, fill_val,
            self.occlusion_thresh, self.confirm_hits,
            extractor.params, frame_dev, self._dev_state,
            self._hist_store,
            d_tlbrs_dev, d_labels_dev, d_conf_dev, d_valid_dev)
        self._stages_and_commit(frame_id, det_dev, emb_dev, costs,
                                emb_cap=emb_cap)

    def _stages_and_commit(self, frame_id, det_dev, emb_dev, costs,
                           host_emb=None, emb_cap=None):
        """Shared back half of an association frame: the solver stage
        kernels + the finals/commit kernel (see update_device)."""
        d_tlbrs_dev, d_labels_dev, d_conf_dev, d_valid_dev = det_dev
        (cost, iou_cost, reid_cost, occluded, h_reid_ok, depth_masks,
         base_iou_active, base_unconf, u_det, col4row) = costs
        n_depth = (self.max_age + 2) // 2
        fill_val = min(self.max_assoc_cost + 0.1, 1.0)
        forbid = _assoc_forbid(self.max_assoc_cost, 1.0 - self.iou_thresh,
                               fill_val)
        if os.environ.get('FASTMOT_CHAINED_STAGES'):
            for d in range(n_depth):
                u_det, col4row = _stage_kernel(
                    False, cost, depth_masks[d], u_det, col4row,
                    eps=self.assoc_eps, forbid=forbid)
            u_det, col4row = _stage_kernel(
                True, iou_cost, base_iou_active, u_det, col4row,
                eps=self.assoc_eps, forbid=forbid)
            u_det, col4row = _stage_kernel(
                False, iou_cost, base_unconf, u_det, col4row,
                eps=self.assoc_eps, forbid=forbid)
            new_state, new_hist, info = _finals_commit_kernel(
                self.kf_cfg, self.conf_thresh, self.max_reid_cost,
                1.0 - self.duplicate_thresh, self.confirm_hits,
                self.max_age, self.history_size, self._dev_state,
                self._hist_store, d_tlbrs_dev, d_labels_dev, d_conf_dev,
                d_valid_dev, emb_dev, np.int32(frame_id),
                self._frame_rect_dev, reid_cost, h_reid_ok, occluded,
                u_det, col4row)
        else:
            # scan + finals + commit fused: 2 dispatches per association
            # frame total (see _scan_finals_commit_core)
            new_state, new_hist, info = _scan_finals_commit_kernel(
                self.kf_cfg, n_depth, self.conf_thresh, self.max_reid_cost,
                1.0 - self.duplicate_thresh, self.confirm_hits,
                self.max_age, self.history_size, self.assoc_eps, forbid,
                cost, iou_cost, depth_masks, base_iou_active, base_unconf,
                u_det, col4row, self._dev_state, self._hist_store,
                d_tlbrs_dev, d_labels_dev, d_conf_dev, d_valid_dev,
                emb_dev, np.int32(frame_id), self._frame_rect_dev,
                reid_cost, h_reid_ok, occluded)
        self._dev_state = new_state
        self._hist_store = new_hist
        self._pending.append(('assoc', {'frame_id': frame_id,
                                        'host_emb': host_emb,
                                        'emb_cap': emb_cap}, info))

    # -- deferred host bookkeeping ---------------------------------------------

    def sync(self, infos=None, snapshots=False):
        """Apply pending device results (gap frames + associations) to the
        host Track mirrors, in dispatch order. Pass pre-fetched ``infos``
        to reuse a larger batched device_get.

        With ``snapshots=True``, returns ``{frame_id: [(trk_id, tlbr)]}``
        of the confirmed+active tracks after each tagged frame's replay —
        the buffered-consumption path for txt writing (one device_get per
        flush instead of one sync per frame)."""
        pending, self._pending = self._pending, []
        result = {} if snapshots else None
        if not pending:
            return result
        if infos is None:
            infos = jax.device_get([info for _, _, info in pending])
        # expand chained gap entries into per-frame replays (the stacked
        # [K, L] info was fetched as one array above; rows split on host)
        entries = []
        for (kind, meta, _), flat in zip(pending, infos):
            if kind == 'gap_chain':
                for t, fid in enumerate(meta['frame_ids']):
                    entries.append((('gap', {'slot_ids': meta['slot_ids'],
                                             'frame_id': fid}), flat[t]))
            else:
                entries.append(((kind, meta), flat))
        for k, ((kind, meta), flat) in enumerate(entries):
            if kind == 'gap':
                self._apply_gap_info(meta, flat)
            elif kind == 'assoc':
                self._apply_assoc_info(meta, flat)
            # 'mark' entries carry no device work (init frames)
            if snapshots:
                fid = meta.get('frame_id')
                nxt = entries[k + 1][0][1].get('frame_id') \
                    if k + 1 < len(entries) else None
                if fid is not None and fid != nxt:
                    result[fid] = [
                        (t.trk_id, t.tlbr.copy())
                        for t in self.tracks.values()
                        if t.confirmed and t.active]
        return result

    def _apply_gap_info(self, meta, flat):
        slot_ids = meta['slot_ids']
        (h_ok, h_mat, next_tlbrs, lost, has_klt, klt_tlbrs, new_inl,
         bg_prev, bg_cur, bg_inlier, est_ok) = self._unpack_info(flat)
        if not bool(h_ok):
            for trk in self.tracks.values():
                trk.keypoints = np.empty((0, 2), np.float32)
            self.klt_bboxes = {}
            self.homography = None
            LOGGER.warning('Camera motion estimation failed')
            # cleared tracks do NOT enter reID history (tracker.py:160-162)
            self.tracks.clear()
            self._slot_ids = [None] * MAX_TRACKS
            return
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
                    # moved to history; the hist slot arrives in the next
                    # association's info (lost_pending save). The slot id
                    # mapping stays until then.
                    self.hist_tracks[tid] = self.tracks.pop(tid)
                    self._trim_hist()
                else:
                    del self.tracks[tid]
                    self._slot_ids[i] = None

    def _assoc_layout(self):
        t, d, h = MAX_TRACKS, MAX_DETS, self._hist_cap
        return [
            ('head', (4,), np.float32),
            ('match_det', (t,), np.int32), ('merge_src', (t,), np.int32),
            ('dup', (t,), bool), ('del_unconf', (t,), bool),
            ('retire_age', (t,), bool), ('out_of_frame', (t,), bool),
            ('hist_dst', (t,), np.int32), ('reinstate_hist', (t,), np.int32),
            ('create_det', (t,), np.int32),
            ('new_ages', (t,), np.int32), ('new_hits', (t,), np.int32),
            ('new_labels', (t,), np.int32), ('new_valid', (t,), bool),
            ('feat_ok', (t,), bool), ('evict', (h,), bool),
            ('next_tlbrs', (t, 4), np.float32),
            ('means', (t, 8), np.float32), ('covs', (t, 8, 8), np.float32),
        ]

    def _unpack_assoc(self, flat):
        out = {}
        off = 0
        for name, shape, dtype in self._assoc_layout():
            n = int(np.prod(shape))
            arr = flat[off:off + n].reshape(shape)
            off += n
            if dtype is bool:
                arr = arr > 0.5
            elif dtype is not np.float32:
                arr = np.rint(arr).astype(dtype)
            out[name] = arr
        assert off == flat.size, (off, flat.size)
        return out

    def _apply_assoc_info(self, meta, flat):
        """Replay the device's association decisions onto the host Track
        mirrors: logging, ID assignment, history id<->slot bookkeeping."""
        frame_id = meta['frame_id']
        host_emb = meta['host_emb']
        a = self._unpack_assoc(flat)
        slot_ids = self._slot_ids
        self.overflow.bump('track_slots_exhausted', int(a['head'][1]))
        self.overflow.bump('hist_slots_stolen', int(a['head'][2]))
        n_dets = int(a['head'][3])
        self._det_count_hint = n_dets
        emb_cap = meta.get('emb_cap')
        if emb_cap is not None and n_dets > emb_cap:
            self.overflow.bump('emb_budget_exceeded', n_dets - emb_cap)
        nt = a['next_tlbrs'].astype(np.float64)

        def state_of(i):
            return (a['means'][i].copy(), a['covs'][i].copy())

        # 1. merges + duplicates (tracker.py:387-401)
        for jslot in range(MAX_TRACKS):
            i = int(a['merge_src'][jslot])
            if i < 0:
                continue
            u_tid, m_tid = slot_ids[i], slot_ids[jslot]
            t_u = self.tracks.get(u_tid)
            t_m = self.tracks.get(m_tid)
            if t_u is None or t_m is None:
                continue
            LOGGER.debug(f"{'Merged:':<14}{u_tid} -> {m_tid}")
            t_m.merge_continuation(t_u)
            del self.tracks[u_tid]
            slot_ids[i] = None
        for i in np.flatnonzero(a['dup']):
            LOGGER.debug(f"{'Duplicate:':<14}{slot_ids[i]}")

        # 2. matched updates (tracker.py:258-272)
        for i in np.flatnonzero(a['match_det'] >= 0):
            tid = slot_ids[i]
            track = self.tracks.get(tid)
            if track is None:
                continue
            det_id = int(a['match_det'][i])
            is_valid = bool(a['feat_ok'][i]) and not a['out_of_frame'][i]
            if track.hits == self.confirm_hits - 1:
                LOGGER.info(f"{'Found:':<14}{track}")
            emb = host_emb[det_id] if host_emb is not None else None
            track.add_detection(frame_id, nt[i], state_of(i), emb,
                                is_valid and emb is not None)
            if is_valid and emb is None:
                track.avg_feat.count += 1   # features live on device
            if a['out_of_frame'][i]:
                if track.confirmed:
                    LOGGER.info(f"{'Out:':<14}{track}")
                    self.hist_tracks[tid] = self.tracks.pop(tid)
                    self._trim_hist()
                else:
                    del self.tracks[tid]
                slot_ids[i] = None

        # 3. unmatched aging / deletion / retirement (tracker.py:274-284)
        for i in np.flatnonzero(a['del_unconf']):
            tid = slot_ids[i]
            track = self.tracks.get(tid)
            if track is None:
                continue
            track.mark_missed()
            LOGGER.debug(f"{'Unconfirmed:':<14}{track}")
            del self.tracks[tid]
            slot_ids[i] = None
        for i in np.flatnonzero(a['retire_age']):
            tid = slot_ids[i]
            track = self.tracks.get(tid)
            if track is None:
                continue
            track.mark_missed()
            LOGGER.info(f"{'Lost:':<14}{track}")
            self.hist_tracks[tid] = self.tracks.pop(tid)
            self._trim_hist()
        # survivors' ages
        for i in range(MAX_TRACKS):
            tid = slot_ids[i]
            track = self.tracks.get(tid) if tid is not None else None
            if track is not None and a['match_det'][i] < 0 and \
                    a['new_valid'][i]:
                track.age = int(a['new_ages'][i])

        # 4. history saves: map hist slots to retired track ids
        for i in np.flatnonzero(a['hist_dst'] >= 0):
            tid = slot_ids[i]
            if tid is None:
                continue
            s = int(a['hist_dst'][i])
            old = self._hist_slot_tid.get(s)
            if old is not None and old != tid:
                self.hist_tracks.pop(old, None)
            self._hist_slot_tid[s] = tid
            if not a['new_valid'][i]:
                slot_ids[i] = None

        # 5. reinstates (tracker.py:249-256)
        for i in np.flatnonzero(a['reinstate_hist'] >= 0):
            s = int(a['reinstate_hist'][i])
            tid = self._hist_slot_tid.pop(s, None)
            track = self.hist_tracks.pop(tid, None) if tid is not None \
                else None
            det_id = int(a['create_det'][i])
            if track is None:
                continue
            LOGGER.info(f"{'Reidentified:':<14}{track}")
            emb = host_emb[det_id] if host_emb is not None else None
            track.reinstate(frame_id, nt[i], state_of(i), emb)
            if emb is None:
                track.avg_feat.count += 1
            self.tracks[tid] = track
            slot_ids[i] = tid

        # 6. new tracks, in detection order for deterministic IDs
        # (tracker.py:286-293)
        creations = [(int(a['create_det'][i]), i)
                     for i in np.flatnonzero(
                         (a['create_det'] >= 0)
                         & (a['reinstate_hist'] < 0))]
        for det_id, i in sorted(creations):
            new_trk = Track(frame_id, nt[i], state_of(i),
                            int(a['new_labels'][i]), self.confirm_hits)
            self.tracks[new_trk.trk_id] = new_trk
            slot_ids[i] = new_trk.trk_id
            LOGGER.debug(f"{'Detected:':<14}{new_trk}")
            if a['out_of_frame'][i]:
                del self.tracks[new_trk.trk_id]
                slot_ids[i] = None

        # 7. history evictions (LRU cap)
        for s in np.flatnonzero(a['evict']):
            tid = self._hist_slot_tid.pop(int(s), None)
            if tid is not None:
                self.hist_tracks.pop(tid, None)

        # 8. drop slot labels for anything no longer live
        for i in range(MAX_TRACKS):
            if not a['new_valid'][i] and slot_ids[i] is not None and \
                    slot_ids[i] not in self.tracks:
                slot_ids[i] = None

    def _trim_hist(self):
        while len(self.hist_tracks) > self.history_size:
            old_id, _ = self.hist_tracks.popitem(last=False)
            for s, tid in list(self._hist_slot_tid.items()):
                if tid == old_id:
                    del self._hist_slot_tid[s]

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
        self._dev_state = jax.device_put(self._host_state_arrays())
        self._ensure_hist_store(reset=True)
        self._mirrors_dirty = False

    def _host_state_arrays(self):
        """Compact the host Track mirrors into the padded state arrays
        (the numpy image of the device state tuple). Also rebuilds the
        slot table. Used by _upload_state and by the stream-axis tracker,
        which stacks several trackers' arrays into one [S, ...] upload."""
        from .ops import flow_kernels as fk
        # pending infos refer to the pre-upload slot table; flush first
        self.sync()
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
        hits = np.zeros(MAX_TRACKS, np.int32)
        labels = np.full(MAX_TRACKS, -2, np.int32)
        start_f = np.zeros(MAX_TRACKS, np.int32)
        end_f = np.zeros(MAX_TRACKS, np.int32)
        lost_pending = np.zeros(MAX_TRACKS, bool)
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
            hits[i] = trk.hits
            labels[i] = trk.label
            start_f[i] = trk.start_frame
            end_f[i] = trk.end_frame
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
        return (means, covs, tlbrs, valid, ages, hits, labels, start_f,
                end_f, lost_pending, inl, kps, kpv, fsum, fcnt)

    def _ensure_hist_store(self, reset=False):
        if self._hist_store is not None and not reset:
            return
        self._hist_store = jax.device_put(self._host_hist_arrays(reset))

    def _host_hist_arrays(self, reset=False):
        """Padded numpy image of the device history store; with ``reset``
        the id<->slot map is rebuilt from the host mirrors."""
        h = self._hist_cap
        hist_sum = np.zeros((h, FEAT_DIM), np.float32)
        hist_count = np.zeros(h, np.float32)
        h_labels = np.full(h, -2, np.int32)
        h_valid = np.zeros(h, bool)
        h_lru = np.zeros(h, np.int32)
        h_hits = np.zeros(h, np.int32)
        if reset:
            # rebuild from host mirrors (the features themselves live in
            # the track objects only when the host path supplied them)
            self._hist_slot_tid = {}
            for s, (tid, trk) in enumerate(
                    list(self.hist_tracks.items())[:h]):
                if trk.avg_feat.sum is not None:
                    hist_sum[s] = trk.avg_feat.sum
                hist_count[s] = trk.avg_feat.count
                h_labels[s] = trk.label
                h_valid[s] = True
                h_lru[s] = trk.end_frame
                h_hits[s] = trk.hits
                self._hist_slot_tid[s] = tid
        return (hist_sum, hist_count, h_labels, h_valid, h_lru, h_hits)

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
                    self.hist_tracks[tid] = self.tracks.pop(tid)
                    self._trim_hist()
                else:
                    del self.tracks[tid]

    # -- helpers --------------------------------------------------------------

    def _mark_lost(self, trk_id):
        """Legacy helper (tracker.py:295-300)."""
        track = self.tracks.pop(trk_id)
        if track.confirmed:
            self.hist_tracks[trk_id] = track
            self._trim_hist()
        self._mirrors_dirty = True

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
