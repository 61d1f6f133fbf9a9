"""KLT optical-flow tracker with camera-motion estimation.

Behavioral reference: fastmot/flow.py (OpenCV GFTT/FAST corners, pyramidal
Lucas-Kanade, RANSAC homography/affine). The TPU-native kernels live in
``ops/flow_kernels.py``: pyramidal LK over a fixed point budget, Shi-Tomasi
response + grid-bucketed top-k corner selection (replacing GFTT's
min-distance sweep and FAST's ring test with one detector serving both
roles), and fixed-budget parallel-hypothesis RANSAC replacing OpenCV's
sequential adaptive RANSAC.

``Flow.predict`` mirrors flow.py:135-264: propagate or re-detect per-track
keypoints with depth-ordered foreground masking, track all points plus
background points in ONE batched LK solve, estimate the camera homography
from background matches (failure => (empty, None), the tracker clears), and
fit a scale-clamped similarity per track.
"""
from __future__ import annotations

import logging
from types import SimpleNamespace

import numpy as np

from .ops import flow_kernels as fk

LOGGER = logging.getLogger(__name__)


def _params_dict(p, defaults):
    out = dict(defaults)
    if p is not None:
        out.update(vars(p) if isinstance(p, SimpleNamespace) else dict(p))
    return out


class Flow:
    """KLT tracker over a fixed per-frame point budget.

    Capacity model (vs the reference's dynamic arrays): at most
    ``fk.MAX_FLOW_TRACKS`` tracks participate per frame, each with up to
    ``fk.KP_PER_TRACK`` keypoints, plus ``fk.BG_KP`` background points —
    all padded and masked so the whole predict step is shape-stable.
    """

    def __init__(self, size,
                 bg_feat_scale_factor=(0.1, 0.1),
                 opt_flow_scale_factor=(0.5, 0.5),
                 feat_density=0.005,
                 feat_dist_factor=0.06,
                 ransac_max_iter=500,
                 ransac_conf=0.99,
                 max_error=100,
                 inlier_thresh=4,
                 bg_feat_thresh=10,
                 obj_feat_params=None,
                 opt_flow_params=None):
        self.size = tuple(int(s) for s in size)
        assert 0 < bg_feat_scale_factor[0] <= 1 and 0 < bg_feat_scale_factor[1] <= 1
        self.bg_feat_scale_factor = tuple(bg_feat_scale_factor)
        assert 0 < opt_flow_scale_factor[0] <= 1 and 0 < opt_flow_scale_factor[1] <= 1
        self.opt_flow_scale_factor = tuple(opt_flow_scale_factor)
        assert 0 <= feat_density <= 1
        self.feat_density = feat_density
        assert feat_dist_factor >= 0
        self.feat_dist_factor = feat_dist_factor
        assert ransac_max_iter >= 0
        self.ransac_max_iter = ransac_max_iter
        assert 0 <= ransac_conf <= 1
        self.ransac_conf = ransac_conf
        assert 0 <= max_error <= 255
        self.max_error = max_error
        assert inlier_thresh >= 1
        self.inlier_thresh = inlier_thresh
        assert bg_feat_thresh >= 0
        self.bg_feat_thresh = bg_feat_thresh

        self.obj_feat_params = _params_dict(obj_feat_params, {
            'maxCorners': 1000, 'qualityLevel': 0.06, 'blockSize': 3})
        self.opt_flow_params = _params_dict(opt_flow_params, {
            'winSize': (5, 5), 'maxLevel': 5, 'criteria': (3, 10, 0.03)})

        # background keypoints for visualization
        self.bg_keypoints = np.empty((0, 2), np.float32)
        self.prev_bg_keypoints = np.empty((0, 2), np.float32)

        self._spec = fk.FlowSpec(
            size=self.size,
            opt_scale=self.opt_flow_scale_factor,
            bg_scale=self.bg_feat_scale_factor,
            win=int(self.opt_flow_params['winSize'][0]),
            max_level=int(self.opt_flow_params['maxLevel']),
            iters=int(self.opt_flow_params['criteria'][1]),
            quality_level=float(self.obj_feat_params['qualityLevel']),
            max_error=float(self.max_error),
            feat_density=float(self.feat_density),
            feat_dist_factor=float(self.feat_dist_factor),
            ransac_iters=int(self.ransac_max_iter),
            inlier_thresh=int(self.inlier_thresh),
        )
        self._prev_pyr = None  # device pyramid of the previous frame
        self._frame_count = 0

    def init(self, frame):
        """Preprocess the first frame (flow.py:121-133)."""
        import jax
        self._prev_pyr = fk.preprocess(self._spec, frame)
        self.bg_keypoints = np.empty((0, 2), np.float32)
        self.prev_bg_keypoints = np.empty((0, 2), np.float32)
        self._frame_count = 0
        self.seed_dev = jax.device_put(np.uint32(0))

    @property
    def spec(self):
        return self._spec

    @property
    def device_state(self):
        """(gray, pyramid, bg) device tuple of the previous frame — used by
        the tracker's fused track-frame kernel."""
        return self._prev_pyr

    def advance(self, cur_state, seed_dev=None, failed: bool = False):
        """Adopt the current frame's preprocessed state (called by the
        fused path after it ran the flow in-kernel)."""
        self._prev_pyr = cur_state
        self._frame_count += 1
        if seed_dev is not None:
            self.seed_dev = seed_dev
        if failed:
            self.bg_keypoints = np.empty((0, 2), np.float32)

    def next_seed(self) -> int:
        return self._frame_count

    def predict(self, frame, tracks):
        """Predict tracklet positions and camera motion (flow.py:135-264).

        Returns ``({trk_id: tlbr}, homography)`` — or ``({}, None)`` when
        camera motion cannot be estimated.
        """
        if self._prev_pyr is None:
            self.init(frame)
            return {}, None

        cur_pyr = fk.preprocess(self._spec, frame)

        # order tracks from closest to farthest (track.py:160-162)
        tracks = sorted(tracks, reverse=True)
        tracks = tracks[:fk.MAX_FLOW_TRACKS]
        n = len(tracks)
        f_cap = fk.flow_budget(n)   # 64/128 bucket (static kernel shape)

        t_tlbrs = np.zeros((f_cap, 4), np.float32)
        t_valid = np.zeros(f_cap, bool)
        t_kps = np.zeros((f_cap, fk.KP_PER_TRACK, 2), np.float32)
        t_kp_valid = np.zeros((f_cap, fk.KP_PER_TRACK), bool)
        for i, trk in enumerate(tracks):
            t_tlbrs[i] = trk.tlbr
            t_valid[i] = True
            k = min(len(trk.keypoints), fk.KP_PER_TRACK)
            if k:
                t_kps[i, :k] = trk.keypoints[:k]
                t_kp_valid[i, :k] = True

        out = fk.flow_step(self._spec, self._prev_pyr, cur_pyr,
                           t_tlbrs, t_valid, t_kps, t_kp_valid,
                           self._frame_count)
        self._prev_pyr = cur_pyr
        self._frame_count += 1

        (homog_ok, h_mat, bg_prev, bg_cur, bg_inlier,
         est_tlbrs, est_valid, inlier_ratio,
         out_prev_kps, out_kps, out_kp_valid) = (np.asarray(o) for o in out)

        if not bool(homog_ok):
            self.bg_keypoints = np.empty((0, 2), np.float32)
            for trk in tracks:
                trk.keypoints = np.empty((0, 2), np.float32)
            LOGGER.warning('Camera motion estimation failed')
            return {}, None

        keep = bg_inlier.astype(bool)
        self.prev_bg_keypoints = bg_prev[keep]
        self.bg_keypoints = bg_cur[keep]

        next_bboxes = {}
        for i, trk in enumerate(tracks):
            kv = out_kp_valid[i].astype(bool)
            trk.prev_keypoints = out_prev_kps[i][kv]
            trk.keypoints = out_kps[i][kv]
            if est_valid[i]:
                next_bboxes[trk.trk_id] = est_tlbrs[i].astype(np.float64)
                trk.inlier_ratio = float(inlier_ratio[i])
            else:
                trk.keypoints = np.empty((0, 2), np.float32)
        return next_bboxes, np.asarray(h_mat, dtype=np.float64)
