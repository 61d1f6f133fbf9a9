"""Track state objects and feature aggregators.

Behavioral reference: fastmot/track.py. These are host-side bookkeeping
objects (ID allocation, bounded history deques, lifecycle flags); all
numerical per-frame work on track state happens in the batched device
kernels (kalman.py, tracker.py) over fixed-capacity arrays.
"""
from __future__ import annotations

from collections import deque

import numpy as np

from .models import get_label_name


class ClusterFeature:
    """Online k-means appearance pool over a fixed [K, D] centroid array
    (role of the reference's ClusterFeature, track.py:11-66). Not used by
    the default association path (AverageFeature is) but kept for
    capability parity.

    Formulation: centroids and counts live in padded arrays and every
    operation is a vectorized assignment — ``update`` accepts one OR a
    batch of embeddings, fills empty slots first, then assigns the rest
    to their nearest (cosine) centroid and applies each centroid's
    running-mean correction in one fused step per batch. ``merge``
    absorbs the smaller track's raw features into the larger track's
    pool as one such batch. (The reference replays features one at a
    time through scalar updates; the batched assignment uses the
    centroids as of the batch start, which converges to the same pool
    for the multi-view appearance data this models.)"""

    def __init__(self, num_clusters, metric):
        self.num_clusters = num_clusters
        self.metric = metric
        self.clusters = None
        self.cluster_sizes = None
        self._next_idx = 0

    def __len__(self):
        return self._next_idx

    def __call__(self):
        return self.clusters[:self._next_idx]

    def update(self, embeddings):
        """Absorb one [D] or a batch [N, D] of embeddings."""
        emb = np.atleast_2d(np.asarray(embeddings))
        if self.clusters is None:
            self.clusters = np.zeros((self.num_clusters, emb.shape[1]),
                                     emb.dtype)
            self.cluster_sizes = np.zeros(self.num_clusters, int)
        # fill empty centroid slots first (the pool's warmup phase)
        n_fill = min(self.num_clusters - self._next_idx, len(emb))
        if n_fill:
            sl = slice(self._next_idx, self._next_idx + n_fill)
            self.clusters[sl] = emb[:n_fill]
            self.cluster_sizes[sl] += 1
            self._next_idx += n_fill
            emb = emb[n_fill:]
        if not len(emb):
            return
        # batch-assign to nearest centroid by cosine similarity, then
        # one running-mean correction per centroid:
        #   c += sum_assigned(e - c) / (size + n_assigned)
        norm = self.clusters / np.maximum(
            np.linalg.norm(self.clusters, axis=1, keepdims=True), 1e-12)
        e_norm = emb / np.maximum(
            np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(e_norm @ norm.T, axis=1)            # [N]
        counts = np.bincount(assign, minlength=self.num_clusters)
        delta = np.zeros_like(self.clusters)
        np.add.at(delta, assign, emb - self.clusters[assign])
        new_sizes = self.cluster_sizes + counts
        self.clusters += delta / np.maximum(new_sizes, 1)[:, None]
        self.cluster_sizes = new_sizes

    def distance(self, embeddings):
        """Min distance of each embedding to any centroid (track.py:37-41)."""
        embeddings = np.atleast_2d(embeddings)
        if self.clusters is None:
            return np.ones(len(embeddings))
        clusters = self.clusters[:self._next_idx]
        clusters = clusters / np.maximum(
            np.linalg.norm(clusters, axis=1, keepdims=True), 1e-12)
        if str(self.metric).lower().endswith('cosine'):
            emb = embeddings / np.maximum(
                np.linalg.norm(embeddings, axis=1, keepdims=True), 1e-12)
            d = 1.0 - clusters @ emb.T
        else:
            diff = clusters[:, None, :] - embeddings[None, :, :]
            d = np.sqrt(np.sum(diff * diff, axis=-1))
        return d.min(axis=0)

    def merge(self, features, other, other_features):
        """Merge two pools: the side with more raw features keeps its
        centroids; the other side's features are absorbed as ONE batch
        (role of track.py:43-55)."""
        mine = [f for f in features if f is not None]
        theirs = [f for f in other_features if f is not None]
        if len(mine) > len(theirs):
            if theirs:
                self.update(np.stack(theirs))
        else:
            if mine:
                other.update(np.stack(mine))
            self.clusters = other.clusters.copy()
            self.cluster_sizes = other.cluster_sizes.copy()
            self._next_idx = other._next_idx


class SmoothFeature:
    """EMA feature (track.py:69-88). Kept for capability parity."""

    def __init__(self, learning_rate=0.9):
        self.lr = learning_rate
        self.smooth = None

    def __call__(self):
        return self.smooth

    def update(self, embedding):
        if self.smooth is None:
            self.smooth = embedding.copy()
        else:
            self.smooth = (1.0 - self.lr) * self.smooth + self.lr * embedding
            self.smooth /= np.linalg.norm(self.smooth)


class AverageFeature:
    """Running L2-normalized mean embedding — the aggregator used for
    association and reID (track.py:91-126)."""

    def __init__(self):
        self.sum = None
        self.avg = None
        self.count = 0

    def __call__(self):
        return self.avg

    def is_valid(self):
        return self.count > 0

    def update(self, embedding):
        self.count += 1
        if self.sum is None:
            self.sum = np.array(embedding, dtype=np.float32, copy=True)
            self.avg = self.sum.copy()
        else:
            self.sum += embedding
            avg = self.sum / self.count
            self.avg = avg / np.linalg.norm(avg)

    def merge(self, other):
        self.count += other.count
        if self.sum is None:
            self.sum = other.sum
            self.avg = other.avg
        elif other.sum is not None:
            self.sum += other.sum
            avg = self.sum / self.count
            self.avg = avg / np.linalg.norm(avg)


class Track:
    """A single tracklet (track.py:129-225). Same public surface:
    ``trk_id, start_frame, frame_ids, bboxes, state, label, age, hits,
    avg_feat, inlier_ratio, keypoints`` and the lifecycle methods."""

    _count = 0

    def __init__(self, frame_id, tlbr, state, label, confirm_hits=1,
                 buffer_size=30):
        self.trk_id = self.next_id()
        self.start_frame = frame_id
        self.frame_ids = deque([frame_id], maxlen=buffer_size)
        self.bboxes = deque([np.asarray(tlbr, dtype=np.float64)],
                            maxlen=buffer_size)
        self.confirm_hits = confirm_hits
        self.state = state  # (mean [8], cov [8, 8]) numpy arrays
        self.label = int(label)

        self.age = 0
        self.hits = 0
        self.avg_feat = AverageFeature()
        self.last_feat = None

        self.inlier_ratio = 1.0
        self.keypoints = np.empty((0, 2), np.float32)
        self.prev_keypoints = np.empty((0, 2), np.float32)

    def __str__(self):
        x = (self.tlbr[0] + self.tlbr[2]) / 2
        y = (self.tlbr[1] + self.tlbr[3]) / 2
        return (f'{get_label_name(self.label):<10} {self.trk_id:>3}'
                f' at ({int(x):>4}, {int(y):>4})')

    __repr__ = __str__

    def __len__(self):
        return self.end_frame - self.start_frame

    def __lt__(self, other):
        # ordered by approximate distance to the image plane (bottom edge y),
        # closer is greater (track.py:160-162)
        return (self.tlbr[-1], -self.age) < (other.tlbr[-1], -other.age)

    @property
    def tlbr(self):
        return self.bboxes[-1]

    @property
    def end_frame(self):
        return self.frame_ids[-1]

    @property
    def active(self):
        return self.age < 2

    @property
    def confirmed(self):
        return self.hits >= self.confirm_hits

    def update(self, tlbr, state):
        self.bboxes.append(np.asarray(tlbr, dtype=np.float64))
        self.state = state

    def add_detection(self, frame_id, tlbr, state, embedding, is_valid=True):
        self.frame_ids.append(frame_id)
        self.bboxes.append(np.asarray(tlbr, dtype=np.float64))
        self.state = state
        if is_valid:
            self.last_feat = embedding
            self.avg_feat.update(embedding)
        self.age = 0
        self.hits += 1

    def reinstate(self, frame_id, tlbr, state, embedding):
        self.start_frame = frame_id
        self.frame_ids.append(frame_id)
        self.bboxes.append(np.asarray(tlbr, dtype=np.float64))
        self.state = state
        if embedding is not None:
            self.last_feat = embedding
            self.avg_feat.update(embedding)
        self.age = 0
        self.keypoints = np.empty((0, 2), np.float32)
        self.prev_keypoints = np.empty((0, 2), np.float32)

    def mark_missed(self):
        self.age += 1

    def merge_continuation(self, other):
        self.frame_ids.extend(other.frame_ids)
        self.bboxes.extend(other.bboxes)
        self.state = other.state
        self.age = other.age
        self.hits += other.hits
        self.keypoints = other.keypoints
        self.prev_keypoints = other.prev_keypoints
        if other.last_feat is not None:
            self.last_feat = other.last_feat
        self.avg_feat.merge(other.avg_feat)

    @staticmethod
    def next_id():
        Track._count += 1
        return Track._count
