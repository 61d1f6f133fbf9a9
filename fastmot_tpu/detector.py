"""Object detectors: YOLO / SSD (Flax + fused XLA postprocessing) and the
MOT-Challenge public-detection replay.

Behavioral reference: fastmot/detector.py. The TensorRT engines become
jitted Flax apply functions; preprocessing (resize / letterbox / normalize)
and postprocessing (confidence filter, per-class DIoU-NMS, area/aspect
gates) are fused into the same jitted graph instead of separate
CuPy/Numba stages. ``detect_async`` dispatches the computation (XLA
dispatch is asynchronous); ``postprocess`` blocks on the result —
preserving the reference's CPU/GPU-overlap structure (mot.py:137-158).
"""
from __future__ import annotations

import abc
import configparser
import os
from collections import defaultdict
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .ops import geometry as geom

MAX_DETS = 128      # padded capacity of the final detection set
MAX_RAW = 1024      # candidates entering NMS after confidence filtering

# build YOLO graphs with the phase-packed (fused space-to-depth) letterbox
# when the model's stem folds — FASTMOT_PACKED_STEM=0 restores the
# in-graph reshape/transpose path (the two are bit-identical; the knob
# exists for A/B tracing)
PACKED_STEM = os.environ.get('FASTMOT_PACKED_STEM', '1') != '0'

DET_DTYPE = np.dtype(
    [('tlbr', float, 4),
     ('label', int),
     ('conf', float)],
    align=True
)


def make_detections(tlbrs, labels, confs) -> np.recarray:
    """Build a DET_DTYPE recarray from plain arrays."""
    n = len(tlbrs)
    out = np.empty(n, DET_DTYPE).view(np.recarray)
    if n:
        out.tlbr = tlbrs
        out.label = labels
        out.conf = confs
    return out


class Detector(abc.ABC):
    """Detector interface (detector.py:26-42)."""

    @abc.abstractmethod
    def __init__(self, size):
        self.size = size

    def __call__(self, frame):
        """Detect objects synchronously."""
        self.detect_async(frame)
        return self.postprocess()

    @abc.abstractmethod
    def detect_async(self, frame):
        raise NotImplementedError

    @abc.abstractmethod
    def postprocess(self):
        raise NotImplementedError


def _lerp_matrix(n_in: int, n_out: int) -> jax.Array:
    """[n_out, n_in] bilinear interpolation weights (half-pixel centers,
    edge-clamped): a dense two-tap hat matrix, so a resize becomes two
    matmuls on the MXU instead of a column gather (TPU column gathers on
    a [720, 1280, 3] frame lowered to a serial scan measured ~2 ms; the
    matmul form is ~0.1 ms — same lesson as crop_resize_batch)."""
    pos = jnp.clip((jnp.arange(n_out, dtype=jnp.float32) + 0.5)
                   * (n_in / n_out) - 0.5, 0.0, n_in - 1.0)
    src = jnp.arange(n_in, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - src[None, :]))


def _resize_bilinear_rgb(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize of an HWC image with half-pixel centers, as two
    interpolation-weight matmuls on the MXU."""
    h, w = img.shape[0], img.shape[1]
    oh, ow = out_hw
    wy = _lerp_matrix(h, oh)
    wx = _lerp_matrix(w, ow)
    tmp = jnp.einsum('oy,yxc->oxc', wy, img,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum('px,oxc->opc', wx, tmp,
                      precision=jax.lax.Precision.HIGHEST)


def _resize_phase_packed(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize DIRECTLY into space-to-depth phase packing:
    returns [oh/2, ow/2, 4c] with channel order (qy, qx, c), bit-identical
    to ``_space_to_depth(_resize_bilinear_rgb(img, out_hw)[None])[0]``.

    The four phases are row/column subsets of the resize output, so the
    phase split is absorbed into the interpolation-weight CONSTANTS
    (``wy[q::2]`` / ``wx[p::2]``) — each output element is the same dot
    product as in the plain resize, just routed to its packed position by
    the matmul instead of a post-hoc reshape/transpose. That relayout
    shuffle measured ~0.36 ms/call of the 2.02 ms YOLOv4-512 graph on
    v5e (reshape.2858 + copy.188, r5 op trace); this formulation deletes
    it for zero extra FLOPs."""
    h, w = img.shape[0], img.shape[1]
    oh, ow = out_hw
    assert oh % 2 == 0 and ow % 2 == 0, (oh, ow)
    wy = _lerp_matrix(h, oh)
    wx = _lerp_matrix(w, ow)
    tmps = [jnp.einsum('oy,yxc->oxc', wy[q::2], img,
                       precision=jax.lax.Precision.HIGHEST)
            for q in (0, 1)]
    parts = [jnp.einsum('px,oxc->opc', wx[p::2], t,
                        precision=jax.lax.Precision.HIGHEST)
             for t in tmps for p in (0, 1)]
    return jnp.concatenate(parts, axis=-1)


def _nms_and_gate(det_out, label_mask, conf_thresh, nms_thresh, max_area,
                  min_ar, scale_wh, offset):
    """Shared fused postprocess after head decode (detector.py:322-365):
    confidence filter -> pixel scaling -> class-aware DIoU-NMS over a
    fixed candidate budget -> area/aspect gates. Returns padded arrays
    (tlbr, label, conf, valid) sorted ascending by class."""
    boxes = det_out[:, 0:4]
    obj = det_out[:, 4]
    label = det_out[:, 5].astype(jnp.int32)
    cls_prob = det_out[:, 6]
    score = obj * cls_prob
    keep = label_mask[jnp.clip(label, 0, label_mask.shape[0] - 1)] & \
        (score >= conf_thresh)

    # scale normalized tlwh to pixels and undo the letterbox offset
    xy = boxes[:, 0:2] * scale_wh[:2] - offset
    wh = boxes[:, 2:4] * scale_wh[2:]
    tlbr = geom.to_tlbr(jnp.concatenate([xy, wh], axis=1))

    # fixed-budget candidate selection (top MAX_RAW by score)
    cand_score = jnp.where(keep, score, -1.0)
    top_score, top_i = jax.lax.top_k(cand_score, min(MAX_RAW, score.shape[0]))
    c_tlbr = tlbr[top_i]
    c_label = label[top_i]
    c_obj = obj[top_i]
    c_cls = cls_prob[top_i]
    c_valid = top_score > 0

    # class-aware DIoU-NMS: suppression only within the same class
    # (detector.py:344-354 runs per-class NMS on class-sorted slices)
    overlap = geom._diou_matrix(c_tlbr, 0.6)
    same_cls = c_label[:, None] == c_label[None, :]
    overlap = jnp.where(same_cls, overlap, -jnp.inf)
    nms_keep = geom._greedy_suppress(overlap, c_obj, c_valid, nms_thresh)

    area = geom.area(c_tlbr)
    ar = geom.aspect_ratio(c_tlbr)
    final = nms_keep & (area > 0) & (area <= max_area) & (ar >= min_ar)

    # order by class ascending, then score descending within class
    order_key = c_label.astype(jnp.float32) * 1e4 - c_obj * c_cls
    order_key = jnp.where(final, order_key, jnp.inf)
    order = jnp.argsort(order_key)[:MAX_DETS]
    out_valid = final[order]
    return (c_tlbr[order], c_label[order],
            (c_obj * c_cls)[order], out_valid)


class YOLODetector(Detector):
    """YOLO detector with fused preprocessing + decode + NMS
    (detector.py:220-365)."""

    def __init__(self, size,
                 class_ids,
                 model='YOLOv4',
                 conf_thresh=0.25,
                 nms_thresh=0.5,
                 max_area=800000,
                 min_aspect_ratio=1.2,
                 quantize=None,
                 calib_cache=None):
        super().__init__(size)
        from .models import registry
        from .models.yolo import decode_heads
        self.model = registry.YOLOModel.get_model(model)
        assert 0 <= conf_thresh <= 1
        self.conf_thresh = conf_thresh
        assert 0 <= nms_thresh <= 1
        self.nms_thresh = nms_thresh
        assert max_area >= 0
        self.max_area = max_area
        assert min_aspect_ratio >= 0
        self.min_aspect_ratio = min_aspect_ratio

        self.label_mask = np.zeros(self.model.NUM_CLASSES, dtype=bool)
        try:
            self.label_mask[tuple(class_ids),] = True
        except IndexError as err:
            raise ValueError('Unsupported class IDs') from err

        self.module, self.params = self.model.init_params()
        assert quantize in (None, 'int8'), quantize
        self.quantize = quantize
        if quantize == 'int8':
            # int8 weight path (role of the reference's INT8 engine
            # build flag, ssd.py:76-83); calib_cache adds calibrated
            # activation fake-quant (calibrator.py:59-67's cache)
            from .models.quantize import QuantizedModule, load_calib_ranges
            act_ranges, in_ranges = load_calib_ranges(calib_cache)
            self.module = QuantizedModule(
                self.module, act_ranges=act_ranges, in_ranges=in_ranges)
            self.params = self.module.quantize(self.params)
        self._decode_heads = decode_heads

        # letterbox geometry (detector.py:302-320)
        src_size = np.array(self.size)
        c, ih, iw = self.model.INPUT_SHAPE
        dst_size = np.array([iw, ih])
        if self.model.LETTERBOX:
            scale_factor = min(dst_size / src_size)
            scaled_size = np.rint(src_size * scale_factor).astype(int)
            img_offset = ((dst_size - scaled_size) / 2).astype(int)
            self._roi = (int(img_offset[1]), int(img_offset[0]),
                         int(scaled_size[1]), int(scaled_size[0]))
            self.upscaled_sz = np.rint(dst_size / scale_factor).astype(int)
            self.bbox_offset = (self.upscaled_sz - src_size) / 2
        else:
            self._roi = (0, 0, ih, iw)
            self.upscaled_sz = src_size
            self.bbox_offset = np.zeros(2)

        self._pending = None
        self._kernel = self._build_kernel()

    def _build_kernel(self):
        module = self.module
        c, ih, iw = self.model.INPUT_SHAPE
        oy, ox, rh, rw = self._roi
        anchors = tuple(tuple(a) for a in self.model.ANCHORS)
        scales = tuple(self.model.SCALES)
        new_coords = self.model.NEW_COORDS
        label_mask = jnp.asarray(self.label_mask)
        scale_wh = jnp.asarray(
            np.concatenate([self.upscaled_sz, self.upscaled_sz]),
            jnp.float32)
        offset = jnp.asarray(self.bbox_offset, jnp.float32)
        conf_thresh = self.conf_thresh
        nms_thresh = self.nms_thresh
        max_area = self.max_area
        min_ar = self.min_aspect_ratio
        decode = self._decode_heads

        # phase-packed preprocessing: when the darknet stem folds to
        # space-to-depth and the letterbox geometry is 2-aligned, build
        # the packed [ih/2, iw/2, 12] input inside the resize matmuls
        # (see _resize_phase_packed) instead of shuffling layout in-graph
        pack = (PACKED_STEM and self.quantize is None
                and hasattr(module, 'stem_packs')
                and module.stem_packs(ih, iw)
                and ih % 2 == 0 and iw % 2 == 0
                and rh % 2 == 0 and rw % 2 == 0
                and oy % 2 == 0 and ox % 2 == 0)

        if pack:
            @jax.jit
            def net_kernel(params, frame):
                f = frame.astype(jnp.float32)
                rgb = f[..., ::-1] / 255.0
                packed = _resize_phase_packed(rgb, (rh, rw))
                canvas = jnp.full((ih // 2, iw // 2, 4 * c), 0.5, jnp.float32)
                canvas = jax.lax.dynamic_update_slice(
                    canvas, packed, (oy // 2, ox // 2, 0))
                heads = module.apply(params, canvas[None], prepacked=True)
                return decode(heads, anchors, scales, (ih, iw), new_coords)[0]
        else:
            @jax.jit
            def net_kernel(params, frame):
                f = frame.astype(jnp.float32)
                rgb = f[..., ::-1] / 255.0
                resized = _resize_bilinear_rgb(rgb, (rh, rw))
                canvas = jnp.full((ih, iw, 3), 0.5, jnp.float32)
                canvas = jax.lax.dynamic_update_slice(
                    canvas, resized, (oy, ox, 0))
                heads = module.apply(params, canvas[None])
                return decode(heads, anchors, scales, (ih, iw), new_coords)[0]

        # NMS in its own small kernel: the score-ordered suppression
        # while-loop runs ~an order of magnitude faster than when fused
        # into the conv graph's compilation unit (VMEM residency — same
        # effect as the tracker's solvers, tracker._assoc_costs_core)
        @jax.jit
        def nms_kernel(det_out):
            return _nms_and_gate(det_out, label_mask, conf_thresh, nms_thresh,
                                 max_area, min_ar, scale_wh, offset)

        def kernel(params, frame):
            return nms_kernel(net_kernel(params, frame))

        return kernel

    def detect_async(self, frame):
        """Dispatch the fused detector graph (non-blocking)."""
        self._pending = self._kernel(self.params, jnp.asarray(frame))

    def postprocess(self):
        """Block on the dispatched graph and build the recarray."""
        tlbr, label, conf, valid = jax.device_get(self._pending)
        self._pending = None
        keep = valid
        return make_detections(tlbr[keep].astype(float),
                               label[keep].astype(int),
                               conf[keep].astype(float))

    def postprocess_device(self):
        """Return the padded (tlbr, label, conf, valid) DEVICE arrays
        without any host synchronization — consumed directly by the
        tracker's association kernel (one batched readback at the end of
        the association instead of one per stage)."""
        out = self._pending
        self._pending = None
        return out


class SSDDetector(Detector):
    """SSD detector with frame tiling into one batch (detector.py:45-217)."""

    def __init__(self, size,
                 class_ids,
                 model='SSDInceptionV2',
                 tile_overlap=0.25,
                 tiling_grid=(4, 2),
                 conf_thresh=0.5,
                 merge_thresh=0.6,
                 max_area=120000,
                 quantize=None,
                 calib_cache=None):
        super().__init__(size)
        from .models import registry
        from .models.ssd import decode_ssd, generate_anchors
        self.model = registry.SSDModel.get_model(model)
        assert 0 <= tile_overlap <= 1
        self.tile_overlap = tile_overlap
        assert tiling_grid[0] >= 1 and tiling_grid[1] >= 1
        self.tiling_grid = tuple(tiling_grid)
        assert 0 <= conf_thresh <= 1
        self.conf_thresh = conf_thresh
        assert 0 <= merge_thresh <= 1
        self.merge_thresh = merge_thresh
        assert max_area >= 0
        self.max_area = max_area

        self.label_mask = np.zeros(self.model.NUM_CLASSES, dtype=bool)
        try:
            self.label_mask[tuple(class_ids),] = True
        except IndexError as err:
            raise ValueError('Unsupported class IDs') from err

        self.batch_size = int(np.prod(self.tiling_grid))
        self.tiles, self.tiling_region_sz = self._generate_tiles()
        self.scale_factor = np.array(self.size) / self.tiling_region_sz
        self.module, self.params = self.model.init_params()
        assert quantize in (None, 'int8'), quantize
        self.quantize = quantize
        if quantize == 'int8':
            # the reference's INT8 calibrated engine build existed FOR the
            # SSD path (ssd.py:76-83 + calibrator.py:8-67); same knobs as
            # YOLODetector: int8-stored weights dequantized in-graph, and
            # calib_cache adds calibrated activation fake-quant
            from .models.quantize import QuantizedModule, load_calib_ranges
            act_ranges, in_ranges = load_calib_ranges(calib_cache)
            self.module = QuantizedModule(
                self.module, act_ranges=act_ranges, in_ranges=in_ranges)
            self.params = self.module.quantize(self.params)
        self._anchors = jnp.asarray(generate_anchors())
        self._decode = decode_ssd
        self._pending = None
        self._kernel = self._build_kernel()

    def _generate_tiles(self):
        """Tile layout over a slightly upscaled region (detector.py:123-131)."""
        c, ih, iw = self.model.INPUT_SHAPE
        tile_size = np.array([iw, ih])
        tiling_grid = np.array(self.tiling_grid)
        step_size = (1 - self.tile_overlap) * tile_size
        total_size = np.rint((tiling_grid - 1) * step_size + tile_size).astype(int)
        tiles = np.array([
            np.asarray(geom.to_tlbr(np.array(
                [c_i * step_size[0], r * step_size[1], iw, ih], np.float32)))
            for r in range(tiling_grid[1]) for c_i in range(tiling_grid[0])])
        return tiles.astype(np.float32), tuple(total_size)

    def _build_kernel(self):
        module = self.module
        c, ih, iw = self.model.INPUT_SHAPE
        rw, rh = self.tiling_region_sz
        tiles = jnp.asarray(self.tiles, jnp.int32)
        tiles_f = jnp.asarray(self.tiles, jnp.float32)
        scale = jnp.asarray(self.scale_factor, jnp.float32)
        label_mask = jnp.asarray(self.label_mask)
        anchors = self._anchors
        topk = self.model.TOPK
        decode = self._decode
        conf_thresh = self.conf_thresh
        merge_thresh = self.merge_thresh
        nms_thresh = self.model.NMS_THRESH
        max_area = self.max_area
        postprocess = self._postprocess_device

        @jax.jit
        def kernel(params, frame):
            f = frame.astype(jnp.float32)
            rgb = f[..., ::-1]
            region = _resize_bilinear_rgb(rgb, (rh, rw))
            crops = jnp.stack([
                jax.lax.dynamic_slice(region, (tiles[i, 1], tiles[i, 0], 0),
                                      (ih, iw, 3))
                for i in range(tiles.shape[0])])
            x = crops * (2.0 / 255.0) - 1.0    # detector.py:152
            locs, confs = module.apply(params, x)
            det_out = decode(locs, confs, anchors, topk)
            return postprocess(det_out, tiles_f, scale, label_mask,
                               conf_thresh, max_area, merge_thresh,
                               nms_thresh)

        return kernel

    @staticmethod
    def _postprocess_device(det_out, tiles_f, scale, label_mask,
                            conf_thresh, max_area, merge_thresh,
                            nms_thresh=0.5):
        """Fused SSD postprocess (detector.py:154-217) — filter, pixel
        scaling, per-tile class-aware NMS (the role NMS_TRT played inside
        each engine run, reference ssd.py:105/136-143), and the
        cross-tile IoM merge as padded array ops; no per-detection host
        Python.

        The merge is connected components over the symmetric relation
        "cross-tile, same label, IoM >= thresh", via min-label
        propagation to a fixpoint; each component collapses to its
        min-index member with the enclosing box and max confidence.
        Documented divergence: the reference's Numba DFS walks a
        *directed* neighbor list that keeps only IoM-improving edges per
        tile (detector.py:188-195) — an artifact of its running-max scan.
        The IoM relation itself is symmetric, so components differ only
        in contrived asymmetric cases; the symmetric closure is
        order-independent (the DFS result depends on detection order).
        """
        n_tiles, topk = det_out.shape[0], det_out.shape[1]
        n = n_tiles * topk
        rows = det_out.reshape(n, 7)
        tile_id = jnp.repeat(jnp.arange(n_tiles), topk)
        label = rows[:, 1].astype(jnp.int32)
        conf = rows[:, 2]
        t = tiles_f[tile_id]                        # [n, 4]
        tw = (t[:, 2] - t[:, 0] + 1.0)
        th = (t[:, 3] - t[:, 1] + 1.0)
        xy_scale = jnp.stack([tw, th, tw, th], -1)
        off = jnp.stack([t[:, 0], t[:, 1], t[:, 0], t[:, 1]], -1)
        sc = jnp.concatenate([scale, scale])
        tlbr = jnp.rint((rows[:, 3:7] * xy_scale + off) * sc[None, :])
        area = geom.area(tlbr)
        valid = (conf >= conf_thresh) & \
            label_mask[jnp.clip(label, 0, label_mask.shape[0] - 1)] & \
            (area > 0) & (area <= max_area)

        # per-tile class-aware greedy NMS (wave-parallel, exact): within
        # one tile several anchors firing on one object must collapse to
        # the best-scoring box BEFORE the cross-tile merge, which only
        # links detections from different tiles. IoU is invariant to the
        # axis-aligned pixel scaling, so suppressing in pixel space ==
        # suppressing in tile space.
        def _tile_nms(b, s, v, lab):
            iou = geom.bbox_ious(b, b)
            overlap = jnp.where(lab[:, None] == lab[None, :], iou, 0.0)
            return geom._greedy_suppress(overlap, s, v, nms_thresh)

        keep_nms = jax.vmap(_tile_nms)(tlbr.reshape(n_tiles, topk, 4),
                                       conf.reshape(n_tiles, topk),
                                       valid.reshape(n_tiles, topk),
                                       label.reshape(n_tiles, topk))
        valid = valid & keep_nms.reshape(n)

        # cross-tile IoM adjacency (symmetric)
        iom = geom.iom_matrix(tlbr)
        edge = (iom >= merge_thresh) & (tile_id[:, None] != tile_id[None, :]) \
            & (label[:, None] == label[None, :]) \
            & valid[:, None] & valid[None, :]

        # min-label propagation to fixpoint (components are tiny: at most
        # one member per tile)
        idx = jnp.arange(n, dtype=jnp.int32)
        init = jnp.where(valid, idx, n)

        def cond(state):
            lbl, changed = state
            return changed

        def body(state):
            lbl, _ = state
            nbr_min = jnp.min(jnp.where(edge, lbl[None, :], n), axis=1)
            new = jnp.minimum(lbl, nbr_min)
            return new, jnp.any(new != lbl)

        lbl, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))

        # collapse each component onto its min-index representative
        safe = jnp.where(valid, lbl, n)
        tl = jnp.full((n, 2), jnp.inf).at[safe].min(tlbr[:, :2], mode='drop')
        br = jnp.full((n, 2), -jnp.inf).at[safe].max(tlbr[:, 2:], mode='drop')
        cmax = jnp.zeros(n).at[safe].max(conf, mode='drop')
        keep = valid & (lbl == idx)
        out_tlbr = jnp.where(keep[:, None],
                             jnp.concatenate([tl, br], axis=1), 0.0)
        out_conf = jnp.where(keep, cmax, 0.0)

        # class-ascending stable order (detector.py:216), padded to MAX_DETS
        order_key = jnp.where(keep, label.astype(jnp.float32) * n + idx,
                              jnp.inf)
        order = jnp.argsort(order_key)[:MAX_DETS]
        return (out_tlbr[order], label[order], out_conf[order], keep[order])

    def detect_async(self, frame):
        self._pending = self._kernel(self.params, jnp.asarray(frame))

    def postprocess(self):
        """Block on the fused graph (filter + cross-tile merge run on
        device; see _postprocess_device) and build the recarray."""
        tlbr, label, conf, valid = jax.device_get(self._pending)
        self._pending = None
        keep = valid
        return make_detections(tlbr[keep].astype(float),
                               label[keep].astype(int),
                               conf[keep].astype(float))

    def postprocess_device(self):
        """Padded (tlbr, label, conf, valid) DEVICE arrays, no host sync —
        the SSD path supports the all-device association like YOLO."""
        out = self._pending
        self._pending = None
        return out

class PublicDetector(Detector):
    """Replays MOT Challenge public detections (detector.py:368-431)."""

    def __init__(self, size,
                 class_ids,
                 frame_skip,
                 sequence_path=None,
                 conf_thresh=0.5,
                 max_area=800000):
        super().__init__(size)
        assert tuple(class_ids) == (1,)
        self.frame_skip = frame_skip
        assert sequence_path is not None
        seq_root = Path(sequence_path)
        if not seq_root.is_absolute():
            seq_root = Path(__file__).parents[1] / sequence_path
        self.seq_root = seq_root
        assert 0 <= conf_thresh <= 1
        self.conf_thresh = conf_thresh
        assert max_area >= 0
        self.max_area = max_area

        assert self.seq_root.exists(), f'{self.seq_root} not found'
        seqinfo = configparser.ConfigParser()
        seqinfo.read(self.seq_root / 'seqinfo.ini')
        self.seq_size = (int(seqinfo['Sequence']['imWidth']),
                         int(seqinfo['Sequence']['imHeight']))

        self.detections = defaultdict(list)
        self.frame_id = 0

        size_arr = np.array(self.size, float)
        seq_size = np.array(self.seq_size, float)
        det_txt = self.seq_root / 'det' / 'det.txt'
        for row in np.loadtxt(det_txt, delimiter=','):
            frame_id = int(row[0]) - 1
            tlbr = np.asarray(geom.to_tlbr(row[2:6].astype(np.float32)),
                              dtype=float)
            conf = 1.0
            label = 1  # person
            tlbr[:2] = tlbr[:2] / seq_size * size_arr
            tlbr[2:] = tlbr[2:] / seq_size * size_arr
            tlbr = np.rint(tlbr)
            area = max(tlbr[2] - tlbr[0] + 1, 0) * max(tlbr[3] - tlbr[1] + 1, 0)
            if conf >= self.conf_thresh and area <= self.max_area:
                self.detections[frame_id].append((tlbr, label, conf))

    def detect_async(self, frame):
        pass

    def postprocess(self):
        dets = self.detections[self.frame_id]
        out = np.array(dets, DET_DTYPE).view(np.recarray) if dets else \
            np.empty(0, DET_DTYPE).view(np.recarray)
        self.frame_id += self.frame_skip
        return out

    def postprocess_device(self):
        """Padded device arrays for the all-device association path."""
        import jax
        det = self.postprocess()
        n = min(len(det), MAX_DETS)
        tlbrs = np.zeros((MAX_DETS, 4), np.float32)
        labels = np.full(MAX_DETS, -1, np.int32)
        confs = np.zeros(MAX_DETS, np.float32)
        valid = np.zeros(MAX_DETS, bool)
        if n:
            tlbrs[:n] = det.tlbr[:n]
            labels[:n] = det.label[:n]
            confs[:n] = det.conf[:n]
            valid[:n] = True
        return jax.device_put((tlbrs, labels, confs, valid))
