"""Stream-axis tracker: S streams' tracking state in one [S, ...] pytree.

The reference (fastmot) is strictly single-stream; serving many streams
per chip (BASELINE config 5) with per-stream ``MultiTracker`` instances
works but dispatches S kernels per frame and runs S copies of the host
shell — measured to flatten past 4 streams (docs/PERFORMANCE.md).

``StreamTracker`` instead holds ONE device state with a leading stream
axis and dispatches vmapped versions of the exact same kernels
(``_chained_track_core``, ``_assoc_core``, ``_preprocess_jit``) once per
frame for ALL streams. The per-stream ``MultiTracker`` host shells are
kept purely as presentation mirrors: the batched info vectors are split
per stream and replayed through the existing ``_apply_gap_info`` /
``_apply_assoc_info`` logic at sync time, off the frame loop.

Multi-chip scale-out: pass a ``jax.sharding.Mesh`` with a ``'streams'``
axis and the stacked state is placed with ``NamedSharding(P('streams'))``
— XLA partitions the vmapped kernels across chips with zero collectives
in the frame loop (the streams are independent; SURVEY.md §2.3/§5.8).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..kalman import KalmanConfig
from ..ops import distance as dist
from ..tracker import (MAX_DETS, MAX_TRACKS, MultiTracker,
                       _assoc_costs_core, _commit_part, _finals_core,
                       _gap_commit_core, _gap_points_core, _stage_core)

__all__ = ['StreamTracker']

# The batched frame paths mirror the single-stream multi-dispatch
# structure (tracker._assoc_costs_core / _gap_points_core comment
# blocks): each solver while-loop gets its own vmapped compilation unit
# so it keeps VMEM residency; stages chain through [S, ...] device
# arrays with zero host reads.


@partial(jax.jit, static_argnames=('spec',))
def _preprocess_batch_kernel(spec, frames):
    from ..ops import flow_kernels as fk
    return jax.vmap(partial(fk._preprocess_jit, spec))(frames)


@partial(jax.jit, static_argnames=('spec', 'f_cap'))
def _gap_points_batch(spec, f_cap, states, prev_states):
    return jax.vmap(
        lambda st, pre: _gap_points_core(spec, st, pre, f_cap)
    )(states, prev_states)


@partial(jax.jit, static_argnames=('spec',))
def _lk_batch(spec, prev_pyr, prev_tabs, cur_pyr, cur_tabs,
              all_prev, all_valid):
    from ..ops import flow_kernels as fk
    return jax.vmap(partial(fk.lk_core, spec))(
        prev_pyr, prev_tabs, cur_pyr, cur_tabs, all_prev, all_valid)


@partial(jax.jit, static_argnames=('cfg', 'spec', 'age_penalty',
                                   'confirm_hits'))
def _gap_commit_batch(cfg: KalmanConfig, spec, age_penalty: float,
                      confirm_hits: int, states, inside, f_tlbrs, f_valid,
                      forder, all_prev, all_cur, status, seeds,
                      trans, acc_cov, frame_tlbr):
    f = partial(_gap_commit_core, cfg, spec, age_penalty, confirm_hits)
    return jax.vmap(f, in_axes=(0,) * 9 + (None, None, None))(
        states, inside, f_tlbrs, f_valid, forder, all_prev, all_cur,
        status, seeds, trans, acc_cov, frame_tlbr)


@partial(jax.jit, static_argnames=(
    'cfg', 'metric', 'n_depth', 'motion_weight', 'max_assoc_cost',
    'iou_gate', 'fill_val', 'occlusion_thresh', 'confirm_hits'))
def _assoc_costs_batch(cfg: KalmanConfig, metric: dist.Metric,
                       n_depth: int, motion_weight: float,
                       max_assoc_cost: float, iou_gate: float,
                       fill_val: float, occlusion_thresh: float,
                       confirm_hits: int, states, hists, dets, embs):
    f = partial(_assoc_costs_core, cfg, metric, n_depth, motion_weight,
                max_assoc_cost, iou_gate, fill_val, occlusion_thresh,
                confirm_hits)

    def one(state, hist, det, emb):
        d_tlbrs, d_labels, d_conf, d_valid = det
        return f(state, hist, d_tlbrs, d_labels, d_conf, d_valid, emb)

    return jax.vmap(one)(states, hists, dets, embs)


@partial(jax.jit, static_argnames=('exclude_matched',))
def _stage_batch(exclude_matched: bool, cost, base_mask, u_det,
                 col4row_final):
    return jax.vmap(partial(_stage_core, exclude_matched))(
        cost, base_mask, u_det, col4row_final)


@partial(jax.jit, static_argnames=('conf_thresh', 'max_reid_cost',
                                   'dup_gate', 'confirm_hits'))
def _finals_batch(conf_thresh: float, max_reid_cost: float,
                  dup_gate: float, confirm_hits: int,
                  tlbrs, t_valid, ages, hits, d_tlbrs, d_conf,
                  reid_cost, h_reid_ok, occluded, u_det, col4row_final):
    f = partial(_finals_core, conf_thresh, max_reid_cost, dup_gate,
                confirm_hits)
    return jax.vmap(f)(tlbrs, t_valid, ages, hits, d_tlbrs, d_conf,
                       reid_cost, h_reid_ok, occluded, u_det,
                       col4row_final)


@partial(jax.jit, static_argnames=('cfg', 'confirm_hits', 'max_age',
                                   'history_size'))
def _commit_batch(cfg: KalmanConfig, confirm_hits: int, max_age: int,
                  history_size: int, states, hists, dets, embs,
                  frame_id, frame_tlbr, cascade_out):
    f = partial(_commit_part, cfg, confirm_hits, max_age, history_size)

    def one(state, hist, det, emb, casc):
        d_tlbrs, d_labels, d_conf, d_valid = det
        return f(state, hist, d_tlbrs, d_labels, d_conf, d_valid, emb,
                 frame_id, frame_tlbr, casc)

    return jax.vmap(one)(states, hists, dets, embs, cascade_out)


class StreamTracker:
    """S logical trackers sharing one [S, ...] device state.

    Public surface: ``init / track / update_device / sync / reset`` plus
    indexable per-stream host mirrors via ``self.trackers[s]`` (Track
    dicts, IDs, logging — the same presentation shell as MultiTracker).
    """

    def __init__(self, size, metric, n_streams, mesh=None, **tracker_cfg):
        assert n_streams >= 1
        self.n_streams = n_streams
        self.trackers = [MultiTracker(size, metric, **tracker_cfg)
                         for _ in range(n_streams)]
        t0 = self.trackers[0]
        self.kf_cfg = t0.kf_cfg
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._sharding = NamedSharding(mesh, P('streams'))

        self._dev_state = None        # [S, ...] pytree
        self._hist_store = None       # [S, H, ...]
        self._prev_pre = None         # batched flow preprocess state
        self._seeds = None            # [S] uint32

    # -- helpers -------------------------------------------------------------

    def _put(self, tree):
        if self._sharding is None:
            return jax.device_put(tree)
        sh = self._sharding
        return jax.device_put(
            tree, jax.tree_util.tree_map(lambda _: sh, tree))

    def _stack_from_mirrors(self):
        """Stack every stream's host state arrays into one upload."""
        per = [trk._host_state_arrays() for trk in self.trackers]
        self._dev_state = self._put(tuple(
            np.stack([p[i] for p in per]) for i in range(len(per[0]))))
        hist = [trk._host_hist_arrays(reset=True) for trk in self.trackers]
        self._hist_store = self._put(tuple(
            np.stack([h[i] for h in hist]) for i in range(len(hist[0]))))
        for trk in self.trackers:
            trk._mirrors_dirty = False
            trk._dev_state = None      # the stacked state is authoritative

    def _preprocess_batch(self, frames):
        return _preprocess_batch_kernel(self.trackers[0].flow.spec, frames)

    @property
    def _dirty(self):
        return self._dev_state is None or any(
            t._mirrors_dirty for t in self.trackers)

    # -- lifecycle -------------------------------------------------------------

    def reset(self, cap_dt):
        for trk in self.trackers:
            trk.reset(cap_dt)
        self._dev_state = None
        self._hist_store = None
        self._prev_pre = None

    def init(self, frames, detections_per_stream):
        """First frame: per-stream host init, one stacked upload.

        ``frames``: [S, H, W, 3] device (or host) array.
        """
        frames = jnp.asarray(frames)
        for trk, dets in zip(self.trackers, detections_per_stream):
            trk._pending = []
            trk.tracks.clear()
            trk._slot_ids = [None] * MAX_TRACKS
            self._init_stream_tracks(trk, dets)
        self._stack_from_mirrors()
        self._prev_pre = self._preprocess_batch(frames)
        self._seeds = self._put(np.zeros(self.n_streams, np.uint32))

    @staticmethod
    def _init_stream_tracks(trk, detections):
        """Host-side first-frame track creation (tracker.py:121-137),
        without the per-stream device upload MultiTracker.init does."""
        import logging

        from .. import kalman as kf
        from ..track import Track
        from ..tracker import _create_kernel
        logger = logging.getLogger(__name__)
        n = min(len(detections), MAX_DETS)
        trk.overflow.bump('detections_clipped', len(detections) - MAX_DETS)
        if n:
            tlbrs = np.zeros((MAX_DETS, 4), np.float32)
            tlbrs[:n] = detections.tlbr[:n]
            means, covs = jax.device_get(
                _create_kernel(trk.kf_cfg, jnp.asarray(tlbrs)))
            for i, det in enumerate(detections[:n]):
                new_trk = Track(0, det.tlbr, (means[i], covs[i]), det.label,
                                trk.confirm_hits)
                trk.tracks[new_trk.trk_id] = new_trk
                trk._slot_ids[i] = new_trk.trk_id
                logger.debug(f"{'Detected:':<14}{new_trk}")
        trk._mirrors_dirty = True

    # -- frame paths ------------------------------------------------------------

    def track(self, frames, frame_id=None):
        """Tracking-only frame for ALL streams: one dispatch.

        ``frames``: [S, H, W, 3] device array (BGR uint8).
        """
        frames = jnp.asarray(frames)
        if self._prev_pre is None:
            self._prev_pre = self._preprocess_batch(frames)
            self._seeds = self._put(np.zeros(self.n_streams, np.uint32))
            return
        if self._dirty:
            self._stack_from_mirrors()
        t0 = self.trackers[0]
        from ..ops import flow_kernels as fk
        max_active = 0
        for trk in self.trackers:
            n_active = sum(1 for t in trk.tracks.values() if t.active)
            max_active = max(max_active, n_active)
            trk.overflow.bump('flow_tracks_clipped',
                              n_active - fk.MAX_FLOW_TRACKS)
        # one static budget for the whole batch: the densest stream picks
        f_cap = fk.flow_budget(max_active)

        spec = t0.flow.spec
        cur_pre = self._preprocess_batch(frames)
        all_prev, all_valid, inside, forder, f_tlbrs, f_valid = \
            _gap_points_batch(spec, f_cap, self._dev_state, self._prev_pre)
        all_cur, status = _lk_batch(
            spec, self._prev_pre[0], self._prev_pre[1],
            cur_pre[0], cur_pre[1], all_prev, all_valid)
        new_state, infos, next_seeds = _gap_commit_batch(
            self.kf_cfg, spec, float(t0.age_penalty), t0.confirm_hits,
            self._dev_state, inside, f_tlbrs, f_valid, forder,
            all_prev, all_cur, status, self._seeds,
            t0._trans_mat, t0._acc_cov, t0._frame_rect_dev)
        self._dev_state = new_state
        self._prev_pre = cur_pre
        self._seeds = next_seeds
        for s, trk in enumerate(self.trackers):
            trk._pending.append(('gap', {'slot_ids': list(trk._slot_ids),
                                         'frame_id': frame_id}, infos[s]))

    def update_device(self, frame_id, det_batch, emb_batch):
        """Association frame for ALL streams: one dispatch, zero reads.

        ``det_batch``: (tlbr [S,D,4], label [S,D], conf [S,D], valid [S,D])
        ``emb_batch``: [S, D, F]
        """
        if self._dirty:
            self._stack_from_mirrors()
        t0 = self.trackers[0]
        n_depth = (t0.max_age + 2) // 2
        fill_val = min(t0.max_assoc_cost + 0.1, 1.0)
        st = self._dev_state
        (cost, iou_cost, reid_cost, occluded, h_reid_ok, depth_masks,
         base_iou_active, base_unconf, u_det, col4row) = \
            _assoc_costs_batch(
                self.kf_cfg, t0.metric, n_depth, t0.motion_weight,
                t0.max_assoc_cost, 1.0 - t0.iou_thresh, fill_val,
                t0.occlusion_thresh, t0.confirm_hits,
                st, self._hist_store, det_batch, emb_batch)
        for d in range(n_depth):
            u_det, col4row = _stage_batch(
                False, cost, depth_masks[d], u_det, col4row)
        u_det, col4row = _stage_batch(
            True, iou_cost, base_iou_active, u_det, col4row)
        u_det, col4row = _stage_batch(
            False, iou_cost, base_unconf, u_det, col4row)
        u_det_conf, reid_c4r, rect_c4r = _finals_batch(
            t0.conf_thresh, t0.max_reid_cost, 1.0 - t0.duplicate_thresh,
            t0.confirm_hits, st[2], st[3], st[4], st[5],
            det_batch[0], det_batch[2], reid_cost, h_reid_ok, occluded,
            u_det, col4row)
        cascade_out = (occluded, col4row, u_det_conf, reid_c4r, rect_c4r)
        new_state, new_hist, infos = _commit_batch(
            self.kf_cfg, t0.confirm_hits, t0.max_age, t0.history_size,
            st, self._hist_store, det_batch, emb_batch,
            jnp.int32(frame_id), t0._frame_rect_dev, cascade_out)
        self._dev_state = new_state
        self._hist_store = new_hist
        for s, trk in enumerate(self.trackers):
            trk._pending.append(
                ('assoc', {'frame_id': frame_id, 'host_emb': None},
                 infos[s]))

    # -- deferred host bookkeeping ------------------------------------------------

    def sync(self):
        """ONE batched device_get for every stream's pending infos, then
        replay them through the per-stream mirrors."""
        all_infos = [info for trk in self.trackers
                     for (_, _, info) in trk._pending]
        if not all_infos:
            return
        fetched = jax.device_get(all_infos)
        off = 0
        for trk in self.trackers:
            n = len(trk._pending)
            trk.sync(infos=fetched[off:off + n])
            off += n

    def visible_tracks(self, stream: int):
        self.sync()
        return (t for t in self.trackers[stream].tracks.values()
                if t.confirmed and t.active)
