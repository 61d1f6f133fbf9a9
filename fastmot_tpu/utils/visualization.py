"""Drawing utilities (behavioral reference: utils/visualization.py).

Rendering is host-side OpenCV work in both the reference and here — it is
not on the TPU hot path and only runs when ``--show``/``--output-uri``
drawing is requested.
"""
from __future__ import annotations

import colorsys

import cv2
import numpy as np


GOLDEN_RATIO = 0.618033988749895


def get_color(idx, s=0.8, vmin=0.7):
    """Deterministic per-ID color via golden-ratio hue stepping
    (visualization.py:51-55)."""
    h = np.fmod(idx * GOLDEN_RATIO, 1.0)
    v = 1.0 - np.fmod(idx * GOLDEN_RATIO, 1.0 - vmin)
    r, g, b = colorsys.hsv_to_rgb(h, s, v)
    return int(255 * b), int(255 * g), int(255 * r)


def draw_bbox(frame, tlbr, color, thickness=2, text=None):
    tlbr = np.asarray(tlbr, int)
    cv2.rectangle(frame, (tlbr[0], tlbr[1]), (tlbr[2], tlbr[3]),
                  color, thickness)
    if text is not None:
        (tw, th), _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_DUPLEX, 0.5, 1)
        cv2.rectangle(frame, (tlbr[0], tlbr[1] - th - 6),
                      (tlbr[0] + tw + 2, tlbr[1]), color, cv2.FILLED)
        cv2.putText(frame, text, (tlbr[0] + 1, tlbr[1] - 4),
                    cv2.FONT_HERSHEY_DUPLEX, 0.5, (0, 0, 0), 1, cv2.LINE_AA)


class Visualizer:
    """Visualizer with the reference's draw toggles
    (visualization.py:100-146)."""

    def __init__(self,
                 draw_detections=False,
                 draw_confidence=False,
                 draw_covariance=False,
                 draw_klt=False,
                 draw_obj_flow=False,
                 draw_bg_flow=False,
                 draw_trajectory=False):
        self.draw_detections = draw_detections
        self.draw_confidence = draw_confidence
        self.draw_covariance = draw_covariance
        self.draw_klt = draw_klt
        self.draw_obj_flow = draw_obj_flow
        self.draw_bg_flow = draw_bg_flow
        self.draw_trajectory = draw_trajectory

    def render(self, frame, tracks, detections=None, klt_bboxes=None,
               prev_bg_keypoints=None, bg_keypoints=None):
        for track in tracks:
            color = get_color(track.trk_id)
            draw_bbox(frame, track.tlbr, color, 2, str(track.trk_id))
            if self.draw_trajectory and len(track.bboxes) > 1:
                pts = np.array([[(b[0] + b[2]) / 2, b[3]]
                                for b in track.bboxes], np.int32)
                cv2.polylines(frame, [pts], False, color, 2)
            if self.draw_obj_flow and len(track.keypoints):
                for pt in track.keypoints:
                    cv2.circle(frame, tuple(np.rint(pt).astype(int)), 1,
                               color, cv2.FILLED)
            if self.draw_covariance and track.state is not None:
                mean, cov = track.state
                self._draw_cov_ellipse(frame, mean[:2], cov[:2, :2], color)
                self._draw_cov_ellipse(frame, mean[2:4], cov[2:4, 2:4], color)
        if self.draw_detections and detections is not None:
            for det in detections:
                text = f'{det.conf:.2f}' if self.draw_confidence else None
                draw_bbox(frame, det.tlbr, (255, 255, 255), 1, text)
        if self.draw_klt and klt_bboxes is not None:
            for tlbr in klt_bboxes:
                draw_bbox(frame, tlbr, (0, 165, 255), 1)
        if self.draw_bg_flow and bg_keypoints is not None and \
                prev_bg_keypoints is not None:
            for p0, p1 in zip(prev_bg_keypoints, bg_keypoints):
                cv2.line(frame, tuple(np.rint(p0).astype(int)),
                         tuple(np.rint(p1).astype(int)), (0, 255, 0), 1)

    @staticmethod
    def _draw_cov_ellipse(frame, center, cov, color):
        """95%-confidence covariance ellipse (visualization.py:81-97)."""
        vals, vecs = np.linalg.eigh(cov)
        order = vals.argsort()[::-1]
        vals, vecs = vals[order], vecs[:, order]
        angle = np.degrees(np.arctan2(vecs[1, 0], vecs[0, 0]))
        # 95% chi-square quantile for 2 dof
        width, height = 2.0 * np.sqrt(np.maximum(vals, 0.0) * 5.9915)
        cv2.ellipse(frame, tuple(np.rint(center).astype(int)),
                    (int(width / 2), int(height / 2)), angle, 0, 360,
                    color, 1, cv2.LINE_AA)
