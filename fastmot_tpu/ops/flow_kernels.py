"""TPU-native optical-flow kernels: corners, pyramidal LK, RANSAC.

Behavioral reference: fastmot/flow.py, which uses OpenCV
(goodFeaturesToTrack, FastFeatureDetector, calcOpticalFlowPyrLK,
findHomography, estimateAffinePartial2D) plus Numba filters. The TPU
formulation replaces every data-dependent sequential construct with a
fixed-budget, masked, batched equivalent:

  * GFTT / FAST -> one Shi-Tomasi (min-eigenvalue) response map per image
    and grid-bucketed top-k selection. The 8-px candidate grid plays the
    role of GFTT's minDistance sweep; the same detector serves background
    points (role of FAST). This is a documented divergence: corner
    *positions* differ from OpenCV's, but the downstream LK/RANSAC
    pipeline only needs well-spread trackable points.
  * The reference's sequential per-track foreground-mask carving
    (flow.py:160-181: each processed track zeroes its region) becomes a
    depth-ordered "blocked by any nearer track" test, evaluated in
    parallel: exact point-in-box tests for keypoints, an 8-px cell raster
    for visible-area estimation.
  * cv2.calcOpticalFlowPyrLK -> pyramidal iterative LK over a fixed
    [N_POINTS] budget with bilinear gather sampling (5x5 window, 6 levels,
    10 iterations — matching the reference's opt_flow_params,
    cfg/mot.json:84-88).
  * cv2.findHomography(RANSAC) / cv2.estimateAffinePartial2D -> fixed-
    budget parallel hypothesis RANSAC: all hypotheses are generated,
    solved (batched DLT / closed-form similarity), and scored in one shot;
    best hypothesis is refined by masked least squares.

Everything here is pure jnp inside a single ``flow_step`` jit; Pallas
variants of the LK sampler can slot in later without changing callers.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_FLOW_TRACKS = 128   # hard cap (MOT20 density: 50-80 objects/frame)
KP_PER_TRACK = 32


def flow_budget(n_active: int) -> int:
    """Static per-frame LK track budget. The flow cores are shape-generic
    in the track axis; callers pad to the smallest bucket covering the
    host-side active count (exact at dispatch time). The LK gather is
    row-COUNT-bound (u8 vs f16 rows measured identical), so every unused
    track slot costs 32 gathered rows per loop iteration — finer buckets
    buy real time on typical scenes (a 40-track MOT17 frame pads to 48,
    not 64: ~20% fewer rows) while MOT20-density crowds still get the
    full cap. Each bucket compiles one variant of the three gap-frame
    kernels; the persistent XLA cache amortizes that across runs."""
    for b in (32, 48, 64, 96):
        if n_active <= b:
            return b
    return MAX_FLOW_TRACKS
BG_KP = 256
CELL = 8          # candidate-corner grid pitch (full-res pixels)
BG_CELL = 4       # candidate grid pitch on the bg-scale image
HYP_H = 256       # homography RANSAC hypotheses
HYP_A = 64        # per-track similarity RANSAC hypotheses
RANSAC_REPROJ = 3.0  # cv2 default ransacReprojThreshold in pixels


@dataclasses.dataclass(frozen=True)
class FlowSpec:
    """Static flow configuration (hashable; used as a jit static arg)."""
    size: tuple[int, int]            # frame (W, H)
    opt_scale: tuple[float, float]   # optical-flow working scale
    bg_scale: tuple[float, float]    # background-detection scale
    win: int = 5                     # LK window size
    max_level: int = 5               # LK pyramid max level (inclusive)
    iters: int = 10                  # LK iterations per level
    quality_level: float = 0.06      # corner quality relative to box max
    max_error: float = 100.0         # max LK patch error (intensity units)
    feat_density: float = 0.005      # min keypoints per visible-area pixel
    feat_dist_factor: float = 0.06   # retained for config parity
    ransac_iters: int = 500          # retained for config parity
    inlier_thresh: int = 4           # min inliers for valid estimates

    @property
    def opt_size(self):
        return (round(self.opt_scale[0] * self.size[0]),
                round(self.opt_scale[1] * self.size[1]))

    @property
    def bg_size(self):
        return (round(self.bg_scale[0] * self.size[0]),
                round(self.bg_scale[1] * self.size[1]))


# ---------------------------------------------------------------------------
# Image helpers
# ---------------------------------------------------------------------------

def _resize_bilinear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize matching OpenCV's half-pixel-center convention,
    as two interpolation-weight matmuls on the MXU (column gathers on a
    full frame lower to a serial scan on TPU — see
    detector._lerp_matrix). Dtype-preserving: bf16 inputs run bf16
    matmuls with f32 accumulation (the flow path's images are 8-bit
    values, exactly representable in bf16; see _preprocess_jit)."""
    h, w = img.shape
    oh, ow = out_hw

    def lerp_matrix(n_in, n_out):
        pos = jnp.clip((jnp.arange(n_out, dtype=jnp.float32) + 0.5)
                       * (n_in / n_out) - 0.5, 0.0, n_in - 1.0)
        src = jnp.arange(n_in, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - src[None, :]))

    wy = lerp_matrix(h, oh).astype(img.dtype)
    wx = lerp_matrix(w, ow).astype(img.dtype)
    if img.dtype == jnp.bfloat16:
        tmp = jnp.einsum('oy,yx->ox', wy, img,
                         preferred_element_type=jnp.float32)
        return jnp.einsum('px,ox->op', wx, tmp.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
    tmp = jnp.einsum('oy,yx->ox', wy, img,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum('px,ox->op', wx, tmp,
                      precision=jax.lax.Precision.HIGHEST)


def _downsample2(img: jax.Array) -> jax.Array:
    """2x2 average-pool downsample (pyramid level step). Accumulates in
    f32 so bf16 pyramids don't compound rounding across levels (storage
    stays in the input dtype)."""
    h, w = img.shape
    h2, w2 = h // 2, w // 2
    img = img[:h2 * 2, :w2 * 2]
    return img.reshape(h2, 2, w2, 2).astype(jnp.float32) \
        .mean(axis=(1, 3)).astype(img.dtype)


def _shi_tomasi_response(img: jax.Array) -> jax.Array:
    """Min-eigenvalue corner response with 3x3 gradient/window sums.
    Computes in f32 regardless of the (possibly bf16) image dtype: the
    squared-gradient sums span ~5 decades and bf16's 8-bit mantissa
    would perturb the corner ranking."""
    img = img.astype(jnp.float32)
    ix = jnp.zeros_like(img)
    iy = jnp.zeros_like(img)
    ix = ix.at[:, 1:-1].set((img[:, 2:] - img[:, :-2]) * 0.5)
    iy = iy.at[1:-1, :].set((img[2:, :] - img[:-2, :]) * 0.5)

    def box3(x):
        xp = jnp.pad(x, 1)
        s = (xp[:-2, :] + xp[1:-1, :] + xp[2:, :])
        s = (s[:, :-2] + s[:, 1:-1] + s[:, 2:])
        return s

    sxx = box3(ix * ix)
    syy = box3(iy * iy)
    sxy = box3(ix * iy)
    tr = sxx + syy
    det_term = jnp.sqrt(jnp.maximum((sxx - syy) ** 2 + 4.0 * sxy ** 2, 0.0))
    return 0.5 * (tr - det_term)


def _grid_candidates(resp: jax.Array, cell: int):
    """Per-cell argmax of the response map -> candidate points + scores.

    Plays the role of GFTT's minDistance: at most one candidate per
    ``cell`` x ``cell`` pixels guarantees spread-out corners.

    Formulated as two ``reduce_window`` pools (max of the response,
    then min of the winner-masked linear index — row-major first-match,
    identical tie behavior to a flattened argmax) instead of the
    obvious reshape/transpose: splitting the lane dimension of a
    full-res [720, 1280] map into [gh, gw, cell^2] cost ~0.85 ms per
    5-frame preprocess in relayout copies on v5e (r5 op trace,
    reshape.100/copy.1338); pooling keeps the native layout."""
    h, w = resp.shape
    gh, gw = h // cell, w // cell
    r = resp[:gh * cell, :gw * cell]
    win = (cell, cell)
    score = jax.lax.reduce_window(r, -jnp.inf, jax.lax.max, win, win,
                                  'VALID')                      # [gh, gw]
    # winner mask at full res (first row-major max per cell wins):
    # linear index of every winning pixel, min-pooled per cell
    up = jnp.repeat(jnp.repeat(score, cell, axis=0), cell, axis=1)
    lin = (jnp.arange(gh * cell, dtype=jnp.int32)[:, None] * w
           + jnp.arange(gw * cell, dtype=jnp.int32)[None, :])
    big = jnp.int32(h * w)
    masked = jnp.where(r >= up, lin, big)
    win_idx = jax.lax.reduce_window(masked, big, jax.lax.min, win, win,
                                    'VALID')                    # [gh, gw]
    cy = win_idx // w
    cx = win_idx % w
    pts = jnp.stack([cx.reshape(-1), cy.reshape(-1)],
                    axis=-1).astype(jnp.float32)
    return pts, score.reshape(-1)


def _in_box(pts: jax.Array, tlbr: jax.Array) -> jax.Array:
    """Inclusive point-in-box test (matches _rect_filter, flow.py:283-294)."""
    return ((pts[..., 0] >= tlbr[..., 0]) & (pts[..., 0] <= tlbr[..., 2])
            & (pts[..., 1] >= tlbr[..., 1]) & (pts[..., 1] <= tlbr[..., 3]))


# ---------------------------------------------------------------------------
# Pyramidal Lucas-Kanade
# ---------------------------------------------------------------------------

def _bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0
    fy = y - y0
    flat = img.reshape(-1)
    a = flat[y0 * w + x0]
    b = flat[y0 * w + x1]
    c = flat[y1 * w + x0]
    d = flat[y1 * w + x1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


LK_EXTRA_STEPS = 1        # same-cell GN steps per row gather (see gn_step)
TAB_DTYPE = jnp.uint8     # window-table storage: image values are 8-bit
                          # at heart — cv2's own LK pyramids ARE uint8
                          # (buildOpticalFlowPyramid), so rounding the
                          # (float) pyramid to u8 matches the reference's
                          # quantization while halving table build traffic
                          # and gather bytes vs the round-3 f16 tables.
                          # Interpolation still happens in f32 after the
                          # gather (the role of cv2's Q14 fixed point).


def _window_table(img: jax.Array, win: int) -> jax.Array:
    """[H*W, (win+3)^2] float16 table of the (win+3) x (win+3) window
    around every pixel: row (y, x) holds img[y-half-1 : y+half+3,
    x-half-1 : x+half+3] (edge-padded). One row contains the four corner
    (win+2)^2 patches a bilinear sample of a (win+2)-wide window needs,
    which is the ``win x win`` value patch PLUS a 1-px halo for central-
    difference gradients. LK's hot loop therefore does ONE row gather
    per point per iteration, and the template's value AND gradient
    patches come from the same row — no separate gradient images or
    gradient tables exist at all (they were 2/3 of the r2 preprocess
    cost, docs/PERFORMANCE.md)."""
    h, w = img.shape
    half = (win - 1) // 2
    wide = win + 3
    pad = jnp.pad(img, ((half + 1, half + 2), (half + 1, half + 2)),
                  mode='edge')
    if TAB_DTYPE == jnp.uint8:
        # round ONCE before the tap stack so all 64 copies of a pixel
        # quantize identically (and the stack moves 1-byte values)
        pad = jnp.clip(jnp.round(pad), 0.0, 255.0).astype(jnp.uint8)
    taps = [pad[dy:dy + h, dx:dx + w]
            for dy in range(wide) for dx in range(wide)]
    return jnp.stack(taps, axis=-1).reshape(
        h * w, wide * wide).astype(TAB_DTYPE)


def _gather_window_rows(tab: jax.Array, w, h, win: int,
                        x: jax.Array, y: jax.Array, off=0):
    """ONE contiguous row gather per point on a _window_table. Returns
    ``(rows [P, wide, wide] f32, x0, y0)`` — the integer anchor cell and
    its (win+3)^2 window, from which any subpixel sample with the same
    anchor can be interpolated exactly (see _interp_halo). ``w``/``h``/
    ``off`` may be traced scalars: the fused multi-level LK loop selects
    the pyramid level at runtime, with ``off`` the level's row offset
    into the CONCATENATED table."""
    wide = win + 3
    x = jnp.clip(x, 0.0, jnp.asarray(w, jnp.float32) - 1.001)
    y = jnp.clip(y, 0.0, jnp.asarray(h, jnp.float32) - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    rows = jnp.take(tab, off + y0 * w + x0, axis=0)          # [P, wide^2]
    p = rows.shape[0]
    r = rows.reshape(p, wide, wide).astype(jnp.float32)
    return r, x0, y0


def _interp_halo(r: jax.Array, fx: jax.Array, fy: jax.Array,
                 win: int) -> jax.Array:
    """[P, win+2, win+2] bilinear blend of a gathered window's four
    corner patches at fractional offsets ``fx``/``fy`` in [0, 1)."""
    inner = win + 2
    fx = fx[:, None, None]
    fy = fy[:, None, None]
    p00 = r[:, :inner, :inner]
    p01 = r[:, :inner, 1:]
    p10 = r[:, 1:, :inner]
    p11 = r[:, 1:, 1:]
    return ((1 - fy) * (1 - fx) * p00 + (1 - fy) * fx * p01
            + fy * (1 - fx) * p10 + fy * fx * p11)


def _sample_patch_halo(tab: jax.Array, w, h, win: int,
                       x: jax.Array, y: jax.Array, off=0) -> jax.Array:
    """[P, win+2, win+2] bilinearly interpolated window (value patch +
    1-px gradient halo) at subpixel points, from ONE row gather per
    point on a _window_table. out[i, j] = sample(y - half - 1 + i,
    x - half - 1 + j); the ``win x win`` value patch is the center
    slice [1:win+1, 1:win+1]."""
    r, x0, y0 = _gather_window_rows(tab, w, h, win, x, y, off)
    x = jnp.clip(x, 0.0, jnp.asarray(w, jnp.float32) - 1.001)
    y = jnp.clip(y, 0.0, jnp.asarray(h, jnp.float32) - 1.001)
    return _interp_halo(r, x - x0, y - y0, win)


def lk_pyramidal(prev_pyr, prev_tabs, cur_pyr, cur_tabs, pts, valid,
                 spec: FlowSpec):
    """Track ``pts`` (at optical-flow scale) from prev to cur pyramid.

    Implements the iterative pyramidal LK of cv2.calcOpticalFlowPyrLK
    (flow.py:203-209): per level, the 2x2 normal matrix G comes from the
    template (prev) window gradients; ``iters`` Gauss-Newton steps update
    the displacement; the result seeds the next finer level. Returns
    (new_pts, status, err) with err = mean |patch difference| as in OpenCV.

    ``prev_tabs``/``cur_tabs`` are the CONCATENATED per-level window
    tables (_preprocess_jit), so all levels run inside ONE
    ``lax.while_loop`` in one small kernel — one dispatch instead of one
    loop kernel per level, with the level selected at runtime from the
    loop state (each iteration is either a template build at a freshly
    entered level or one Gauss-Newton step; every iteration costs one
    contiguous-row gather either way). Gradients are central differences
    of the sampled halo patch (bilinear interpolation and the difference
    operator commute, so this equals sampling a precomputed d/dx image
    everywhere except the 1-px image border).
    """
    n_levels = len(prev_pyr)
    n_pts = pts.shape[0]
    wi = spec.win
    ww = wi * wi
    # static per-level geometry -> ONE runtime-indexed [L, 3] row per
    # iteration (three separate vectors cost three dynamic-slices per
    # loop trip, ~3 us of the body on the r4 op trace)
    dims = [img.shape for img in prev_pyr]                  # [(h, w)]
    level_offs = np.cumsum([0] + [h * w for h, w in dims[:-1]])
    geo = jnp.array([[h, w, o] for (h, w), o in zip(dims, level_offs)],
                    jnp.int32)                              # [L, 3]
    # cv2 criteria (COUNT | EPS): iterate until every point's step falls
    # below eps or the count cap — typically ~3 rounds/level. The patch
    # error is tracked INSIDE the loop (at the pre-step position) so no
    # extra sample is needed after convergence; only level 0's value is
    # consumed, gated at spec.max_error.
    #
    # Double-step: the gathered (win+3)^2 window covers every subpixel
    # sample whose integer anchor cell is unchanged, so when a
    # Gauss-Newton step stays within the anchor cell a SECOND exact step
    # is taken from the same rows (new fractional weights, zero extra
    # gather). Near convergence steps are subpixel, so most iterations
    # advance two steps per row gather — the gather is ~60% of the loop
    # body's cost (17.5 us of ~29 us per iteration on the r4 op trace).
    # Per-point step budgets keep the cv2 COUNT criterion exact.
    eps2 = 0.03 * 0.03
    zf = jnp.zeros(n_pts, jnp.float32)
    zb = jnp.zeros(n_pts, bool)

    def level_template(lvl):
        scale = jnp.exp2(-lvl.astype(jnp.float32))
        p = pts * scale
        g = geo[lvl]
        t_halo = _sample_patch_halo(prev_tabs, g[1], g[0], wi,
                                    p[:, 0], p[:, 1], g[2])
        t_patch = t_halo[:, 1:wi + 1, 1:wi + 1].reshape(n_pts, ww)
        gx = (0.5 * (t_halo[:, 1:wi + 1, 2:wi + 2]
                     - t_halo[:, 1:wi + 1, 0:wi])).reshape(n_pts, ww)
        gy = (0.5 * (t_halo[:, 2:wi + 2, 1:wi + 1]
                     - t_halo[:, 0:wi, 1:wi + 1])).reshape(n_pts, ww)
        gxx = jnp.sum(gx * gx, axis=1)
        gyy = jnp.sum(gy * gy, axis=1)
        gxy = jnp.sum(gx * gy, axis=1)
        det = gxx * gyy - gxy * gxy
        # cv2-style minimum-eigenvalue gate (minEigThreshold=1e-4 on
        # G / window area) rejects flat/degenerate windows outright
        min_eig = 0.5 * (gxx + gyy - jnp.sqrt(
            jnp.maximum((gxx - gyy) ** 2 + 4.0 * gxy ** 2, 0.0)))
        inv_ok = min_eig / float(ww) > 1e-4
        det_safe = jnp.where(det > 1e-12, det, 1.0)
        return t_patch, gx, gy, gxx, gyy, gxy, det_safe, inv_ok

    # loop state: (lvl, fresh, it, v, active, err, ok, steps, templates...)
    zi = jnp.zeros(n_pts, jnp.int32)
    tmpl0 = (jnp.zeros((n_pts, ww)), jnp.zeros((n_pts, ww)),
             jnp.zeros((n_pts, ww)), zf, zf, zf, jnp.ones(n_pts), zb)
    state0 = (jnp.int32(n_levels - 1), jnp.bool_(True), jnp.int32(0),
              jnp.zeros_like(pts), zb, zf, valid, zi, tmpl0)

    def cond(st):
        return st[0] >= 0

    def start_level(st):
        lvl, _, _, v, _, err, ok, _, _ = st
        tmpl = level_template(lvl)
        # active starts at VALID, not all-ones: the padded/invalid points
        # sample garbage that never satisfies the eps criterion, and one
        # never-converging point pins the whole level at the full
        # iteration budget (measured: 768 pad points kept every level at
        # 10 trips; valid-masked + double-step, levels end in ~5)
        return (lvl, jnp.bool_(False), jnp.int32(0), v,
                valid, err, ok, zi, tmpl)

    def gn_step(st):
        lvl, fresh, it, v, active, err, ok, steps, tmpl = st
        t_patch, gx, gy, gxx, gyy, gxy, det_safe, inv_ok = tmpl
        scale = jnp.exp2(-lvl.astype(jnp.float32))
        p = pts * scale
        g = geo[lvl]
        h, w = g[0], g[1]
        wf = jnp.asarray(w, jnp.float32)
        hf = jnp.asarray(h, jnp.float32)
        rows, x0, y0 = _gather_window_rows(
            cur_tabs, w, h, wi, p[:, 0] + v[:, 0], p[:, 1] + v[:, 1],
            g[2])

        def gn_math(fx, fy):
            c_halo = _interp_halo(rows, fx, fy, wi)
            c_patch = c_halo[:, 1:wi + 1, 1:wi + 1].reshape(n_pts, ww)
            diff = t_patch - c_patch
            e = jnp.mean(jnp.abs(diff), axis=1)
            bx = jnp.sum(diff * gx, axis=1)
            by = jnp.sum(diff * gy, axis=1)
            dx = (gyy * bx - gxy * by) / det_safe
            dy = (gxx * by - gxy * bx) / det_safe
            # trust region: a Gauss-Newton step larger than the window is
            # meaningless and catapults the track (observed at borders)
            return jnp.clip(jnp.stack([dx, dy], axis=-1),
                            -float(wi), float(wi)), e

        # step 1 — at the gather position itself (exact by construction)
        xc = jnp.clip(p[:, 0] + v[:, 0], 0.0, wf - 1.001)
        yc = jnp.clip(p[:, 1] + v[:, 1], 0.0, hf - 1.001)
        step1, e1 = gn_math(xc - x0, yc - y0)
        err = jnp.where(active, e1, err)
        v = v + jnp.where((active & inv_ok)[:, None], step1, 0.0)
        still1 = jnp.sum(step1 * step1, axis=1) >= eps2
        steps = steps + active.astype(jnp.int32)
        active = active & inv_ok & still1 & (steps < spec.iters)

        # extra step(s) — exact resamples from the SAME rows while the
        # stepped position keeps the anchor cell (floor unchanged after
        # clip). Near convergence steps are subpixel, so one gather often
        # serves two exact Gauss-Newton steps. Per-point step budgets
        # keep the cv2 COUNT criterion exact. LK_EXTRA_STEPS=1 is the
        # measured lockstep optimum (r5 A/B, scripts/prof_lk.py, 48
        # tracks on-chip): each unconditional evaluation costs ~0.14
        # ms/LK whether or not any point can use it (extra=3 was +0.43
        # ms vs extra=0), and gating an evaluation behind
        # ``lax.cond(any(do2))`` is WORSE (+6 us per cond per trip,
        # +1.1 ms/LK — conditionals in hot while bodies are
        # pathological, docs/PERFORMANCE.md lowering lesson #1). The
        # double-step keeps most of the gather savings on converging
        # video; the quad-step's extra two evaluations never paid for
        # themselves on any measured workload.
        for _ in range(LK_EXTRA_STEPS):
            x2 = jnp.clip(p[:, 0] + v[:, 0], 0.0, wf - 1.001)
            y2 = jnp.clip(p[:, 1] + v[:, 1], 0.0, hf - 1.001)
            same = (jnp.floor(x2).astype(jnp.int32) == x0) & \
                   (jnp.floor(y2).astype(jnp.int32) == y0)
            do2 = active & same
            step2, e2 = gn_math(x2 - x0, y2 - y0)
            err = jnp.where(do2, e2, err)
            v = v + jnp.where(do2[:, None], step2, 0.0)
            still2 = jnp.sum(step2 * step2, axis=1) >= eps2
            steps = steps + do2.astype(jnp.int32)
            active = jnp.where(do2, active & still2 & (steps < spec.iters),
                               active)

        it = it + 1
        # level complete -> fold the eigen gate into ok, seed the next
        # finer level (guess doubles except when leaving level 0)
        done = (~jnp.any(active)) | (it >= spec.iters)
        ok = jnp.where(done, ok & inv_ok, ok)
        v = jnp.where(done & (lvl > 0), v * 2.0, v)
        lvl = jnp.where(done, lvl - 1, lvl)
        return (lvl, done, it, v, active, err, ok, steps, tmpl)

    def body(st):
        return jax.lax.cond(st[1], start_level, gn_step, st)

    st = jax.lax.while_loop(cond, body, state0)
    v, err, ok = st[3], st[5], st[6]

    new_pts = pts + v
    h0, w0 = cur_pyr[0].shape
    inb = ((new_pts[:, 0] >= 0) & (new_pts[:, 0] <= w0 - 1)
           & (new_pts[:, 1] >= 0) & (new_pts[:, 1] <= h0 - 1))
    return new_pts, ok & inb, err


# ---------------------------------------------------------------------------
# RANSAC: homography (background / camera motion)
# ---------------------------------------------------------------------------

def _normalize_pts(pts, valid):
    """Hartley normalization over valid points; returns (pts_n, T 3x3)."""
    cnt = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / cnt
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=1))
    mean_d = jnp.sum(jnp.where(valid, d, 0.0)) / cnt
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-6)
    t_mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    t_mat = t_mat.at[0, 0].set(s).at[1, 1].set(s)
    t_mat = t_mat.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return (pts - mean) * s, t_mat


def _dlt_rows(p, q):
    """Two DLT rows for correspondence p -> q (each [..., 2])."""
    x, y = p[..., 0], p[..., 1]
    u, v = q[..., 0], q[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    return r1, r2


def _solve_dlt(a_mat):
    """Least-squares solution of A h = 0 under the h22 = 1 gauge.

    A [..., r, 9]: solve A[..., :8] h8 = -A[..., 8] via normal equations +
    statically unrolled Cholesky. Equivalent to the SVD null-space up to
    the gauge (Hartley normalization keeps h22 far from 0 for camera-like
    homographies, and the DLT rows well-conditioned). Replaces batched
    jnp.linalg.svd, whose Jacobi custom-calls measured ~6.5 ms per frame
    on a v5e — the single largest cost of the gap-frame kernel.
    Degenerate samples yield clamped garbage that scores ~0 inliers and
    is discarded by the hypothesis argmax, like SVD's null vector would.
    """
    from . import smallmat as sm
    a8 = a_mat[..., :, :8]
    a9 = a_mat[..., :, 8]
    n_mat = jnp.sum(a8[..., :, :, None] * a8[..., :, None, :], axis=-3)
    n_mat = n_mat + 1e-8 * jnp.eye(8, dtype=a_mat.dtype)
    rhs = -jnp.sum(a8 * a9[..., :, None], axis=-2)
    h8 = sm.chol_solve(n_mat, rhs[..., None])[..., 0]
    return jnp.concatenate([h8, jnp.ones_like(h8[..., :1])], axis=-1)


def _apply_h(h_mat, pts):
    denom = h_mat[..., 2, 0] * pts[..., 0] + h_mat[..., 2, 1] * pts[..., 1] \
        + h_mat[..., 2, 2]
    denom = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
    x = (h_mat[..., 0, 0] * pts[..., 0] + h_mat[..., 0, 1] * pts[..., 1]
         + h_mat[..., 0, 2]) / denom
    y = (h_mat[..., 1, 0] * pts[..., 0] + h_mat[..., 1, 1] * pts[..., 1]
         + h_mat[..., 1, 2]) / denom
    return jnp.stack([x, y], axis=-1)


def ransac_homography(prev_pts, cur_pts, valid, key, inlier_thresh: int):
    """Fixed-budget RANSAC homography (role of cv2.findHomography).

    All HYP_H 4-point hypotheses are solved and scored in parallel; the
    best is refined twice by masked DLT over its inliers. Returns
    (ok, H 3x3, inlier_mask).
    """
    n = prev_pts.shape[0]
    cnt = jnp.sum(valid)

    p_n, t1 = _normalize_pts(prev_pts, valid)
    q_n, t2 = _normalize_pts(cur_pts, valid)

    # compact valid indices to the front for sampling
    order = jnp.argsort(~valid, stable=True)
    u = jax.random.uniform(key, (HYP_H, 4))
    samp = order[(u * jnp.maximum(cnt, 1)).astype(jnp.int32) % n]  # [HYP_H, 4]

    p_s = p_n[samp]                  # [HYP_H, 4, 2]
    q_s = q_n[samp]
    r1, r2 = _dlt_rows(p_s, q_s)     # [HYP_H, 4, 9]
    a_mat = jnp.concatenate([r1, r2], axis=1)  # [HYP_H, 8, 9]
    h_vec = _solve_dlt(a_mat)
    h_cand = h_vec.reshape(-1, 3, 3)

    # score hypotheses by inlier count in *unnormalized* space
    t2_inv = jnp.linalg.inv(t2)
    h_px = t2_inv[None] @ h_cand @ t1[None]
    proj = _apply_h(h_px[:, None], prev_pts[None, :, :])  # [HYP_H, n, 2]
    err2 = jnp.sum((proj - cur_pts[None]) ** 2, axis=-1)
    inl = (err2 < RANSAC_REPROJ ** 2) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    inlier = inl[best]
    h_best = h_px[best]

    # guarded refinement: the all-inlier masked DLT can LOSE accuracy in
    # float32 (observed: a 256/256-inlier hypothesis refined into a
    # 24-inlier model), so a refined model is only adopted when it keeps
    # at least as many inliers as the current one.
    def refine(state, _):
        h_best, inlier = state
        r1, r2 = _dlt_rows(p_n, q_n)             # [n, 9] each
        w = inlier[:, None].astype(jnp.float32)
        a_full = jnp.concatenate([r1 * w, r2 * w], axis=0)  # [2n, 9]
        h_vec = _solve_dlt(a_full)
        h_ref = t2_inv @ h_vec.reshape(3, 3) @ t1
        proj = _apply_h(h_ref[None], prev_pts)
        err2 = jnp.sum((proj - cur_pts) ** 2, axis=-1)
        new_inlier = (err2 < RANSAC_REPROJ ** 2) & valid
        better = jnp.sum(new_inlier) >= jnp.sum(inlier)
        h_best = jnp.where(better, h_ref, h_best)
        inlier = jnp.where(better, new_inlier, inlier)
        return (h_best, inlier), None

    (h_best, inlier), _ = refine((h_best, inlier), None)
    (h_best, inlier), _ = refine((h_best, inlier), None)

    h_norm = h_best / jnp.where(jnp.abs(h_best[2, 2]) > 1e-9,
                                h_best[2, 2], 1e-9)
    n_inl = jnp.sum(inlier)
    ok = (cnt >= 4) & (n_inl >= inlier_thresh)
    return ok, h_norm, inlier


# ---------------------------------------------------------------------------
# RANSAC: per-track partial affine (similarity)
# ---------------------------------------------------------------------------

def ransac_similarity(prev_pts, cur_pts, valid, key, inlier_thresh: int):
    """Fixed-budget RANSAC similarity fit for ONE track
    (role of cv2.estimateAffinePartial2D, flow.py:244-248).

    Model: q = [[a, -b], [b, a]] p + t. Hypotheses from 2-point closed
    form (complex ratio); best refined by masked least squares. Returns
    (ok, A 2x3, inlier_mask, n_matched, n_inliers).
    """
    n = prev_pts.shape[0]
    cnt = jnp.sum(valid)

    order = jnp.argsort(~valid, stable=True)
    u = jax.random.uniform(key, (HYP_A, 2))
    samp = order[(u * jnp.maximum(cnt, 1)).astype(jnp.int32) % n]

    p1, p2 = prev_pts[samp[:, 0]], prev_pts[samp[:, 1]]
    q1, q2 = cur_pts[samp[:, 0]], cur_pts[samp[:, 1]]
    dp = p2 - p1
    dq = q2 - q1
    denom = dp[:, 0] ** 2 + dp[:, 1] ** 2
    denom = jnp.maximum(denom, 1e-9)
    # (a + ib) = dq / dp in complex arithmetic
    a = (dq[:, 0] * dp[:, 0] + dq[:, 1] * dp[:, 1]) / denom
    b = (dq[:, 1] * dp[:, 0] - dq[:, 0] * dp[:, 1]) / denom
    tx = q1[:, 0] - (a * p1[:, 0] - b * p1[:, 1])
    ty = q1[:, 1] - (b * p1[:, 0] + a * p1[:, 1])

    px, py = prev_pts[:, 0], prev_pts[:, 1]
    proj_x = a[:, None] * px[None] - b[:, None] * py[None] + tx[:, None]
    proj_y = b[:, None] * px[None] + a[:, None] * py[None] + ty[:, None]
    err2 = (proj_x - cur_pts[None, :, 0]) ** 2 + (proj_y - cur_pts[None, :, 1]) ** 2
    inl = (err2 < RANSAC_REPROJ ** 2) & valid[None, :]
    best = jnp.argmax(jnp.sum(inl, axis=1))
    inlier = inl[best]
    aff_best = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    aff_best = aff_best.at[0, 0].set(a[best]).at[0, 1].set(-b[best]) \
        .at[0, 2].set(tx[best])
    aff_best = aff_best.at[1, 0].set(b[best]).at[1, 1].set(a[best]) \
        .at[1, 2].set(ty[best])

    # masked least-squares refinement of [a, b, tx, ty]
    def refine(inlier):
        w = inlier.astype(jnp.float32)
        sw = jnp.maximum(jnp.sum(w), 1.0)
        sx = jnp.sum(w * px)
        sy = jnp.sum(w * py)
        sxx = jnp.sum(w * (px * px + py * py))
        su = jnp.sum(w * cur_pts[:, 0])
        sv = jnp.sum(w * cur_pts[:, 1])
        sxu = jnp.sum(w * (px * cur_pts[:, 0] + py * cur_pts[:, 1]))
        sxv = jnp.sum(w * (px * cur_pts[:, 1] - py * cur_pts[:, 0]))
        # normal equations for the 4 parameters
        m = jnp.array([[0.0] * 4] * 4)
        m = m.at[0, 0].set(sxx).at[0, 2].set(sx).at[0, 3].set(sy)
        m = m.at[1, 1].set(sxx).at[1, 2].set(-sy).at[1, 3].set(sx)
        m = m.at[2, 0].set(sx).at[2, 1].set(-sy).at[2, 2].set(sw)
        m = m.at[3, 0].set(sy).at[3, 1].set(sx).at[3, 3].set(sw)
        rhs = jnp.array([sxu, sxv, su, sv])
        # m is the (symmetric PSD) normal matrix of the similarity LS fit;
        # unrolled Cholesky avoids the per-element LU loop of batched
        # jnp.linalg.solve under the track vmap
        from . import smallmat as sm
        sol = sm.chol_solve(m + 1e-6 * jnp.eye(4), rhs[:, None])[:, 0]
        a_r, b_r, tx_r, ty_r = sol[0], sol[1], sol[2], sol[3]
        proj_x = a_r * px - b_r * py + tx_r
        proj_y = b_r * px + a_r * py + ty_r
        err2 = (proj_x - cur_pts[:, 0]) ** 2 + (proj_y - cur_pts[:, 1]) ** 2
        new_inlier = (err2 < RANSAC_REPROJ ** 2) & valid
        aff = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        aff = aff.at[0, 0].set(a_r).at[0, 1].set(-b_r).at[0, 2].set(tx_r)
        aff = aff.at[1, 0].set(b_r).at[1, 1].set(a_r).at[1, 2].set(ty_r)
        return new_inlier, aff

    # guarded refinement (see ransac_homography): only adopt a refit that
    # keeps at least as many inliers
    for _ in range(2):
        new_inlier, aff_try = refine(inlier)
        better = jnp.sum(new_inlier) >= jnp.sum(inlier)
        aff_best = jnp.where(better, aff_try, aff_best)
        inlier = jnp.where(better, new_inlier, inlier)

    n_inl = jnp.sum(inlier)
    ok = (cnt >= 3) & (n_inl >= inlier_thresh)
    return ok, aff_best, inlier, cnt, n_inl


# ---------------------------------------------------------------------------
# Frame preprocessing and the fused flow step
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=('spec',))
def _preprocess_jit(spec: FlowSpec, frame_bgr: jax.Array):
    """BGR uint8 frame -> per-frame flow state.

    Everything derivable from a single frame is computed here exactly
    once — the pyramid, the per-level combined window tables (value +
    gradient halo; the LK template AND search samples both come from the
    same table), the full-res corner candidates, and the background
    candidates — so the per-frame flow step never recomputes
    previous-frame quantities.
    """
    # f32 pyramid. A bf16 integer-rounded pyramid was tried in r5
    # (halves resize/carry traffic, arguably closer to cv2's u8
    # pyramids): it bought only ~0.04 ms/frame on the trace but cost
    # ~3 MOTA points on the CLI accuracy harness (test_app_cli) —
    # sub-level precision in the DOWNSAMPLE chain matters to LK even
    # though the window tables quantize to u8. Reverted; see
    # docs/PERFORMANCE.md negative results.
    f = frame_bgr.astype(jnp.float32)
    # OpenCV BGR2GRAY weights
    gray = f[..., 2] * 0.299 + f[..., 1] * 0.587 + f[..., 0] * 0.114
    ow, oh = spec.opt_size
    base = _resize_bilinear(gray, (oh, ow))
    pyr = [base]
    for _ in range(spec.max_level):
        pyr.append(_downsample2(pyr[-1]))

    # ONE combined f16 window table (value + gradient halo) for ALL
    # levels, concatenated along rows so the fused multi-level LK loop
    # gathers from a single array — see _window_table / lk_pyramidal
    tabs = jnp.concatenate([_window_table(img, spec.win) for img in pyr],
                           axis=0)

    resp = _shi_tomasi_response(gray)
    cand_pts, cand_score = _grid_candidates(resp, CELL)

    bw, bh = spec.bg_size
    bg = _resize_bilinear(gray, (bh, bw))
    bg_resp = _shi_tomasi_response(bg)
    bg_pts_s, bg_score = _grid_candidates(bg_resp, BG_CELL)
    bg_scale = jnp.array([spec.bg_scale[0], spec.bg_scale[1]])
    bg_pts_full = bg_pts_s / bg_scale

    return (tuple(pyr), tabs, cand_pts, cand_score,
            bg_pts_full, bg_score)


def preprocess(spec: FlowSpec, frame: np.ndarray):
    return _preprocess_jit(spec, jnp.asarray(frame))


def flow_points_core(spec: FlowSpec, prev_state, t_tlbrs, t_valid,
                     t_kps, t_kp_valid):
    """Corner management + keypoint/background point assembly — the
    pre-LK half of a flow step (no while-loops; cheap mask algebra)."""
    (prev_pyr, prev_tabs, cand_pts, cand_score,
     bg_pts_full, bg_score) = prev_state
    w_f, h_f = spec.size
    frame_tlbr = jnp.array([0.0, 0.0, w_f - 1.0, h_f - 1.0])
    t_idx = jnp.arange(t_tlbrs.shape[0])   # track budget = input shape

    # clip track boxes to the frame (intersection, flow.py:163)
    in_tl = jnp.maximum(t_tlbrs[:, 0:2], frame_tlbr[0:2])
    in_br = jnp.minimum(t_tlbrs[:, 2:4], frame_tlbr[2:4])
    inside = jnp.concatenate([in_tl, in_br], axis=1)

    # ---- corner candidates (precomputed in the previous frame's
    # preprocess) -------------------------------------------------------
    # candidate-in-box matrix and depth-order blocking:
    # tracks arrive sorted near-to-far; candidate c is blocked for track i
    # if any nearer (smaller-index) valid track's box contains it —
    # the parallel form of the reference's fg_mask carving.
    in_box = _in_box(cand_pts[None, :, :], inside[:, None, :]) \
        & t_valid[:, None]                                    # [T, C]
    blocked = jnp.cumsum(in_box.astype(jnp.int32), axis=0) - in_box.astype(jnp.int32)
    free = in_box & (blocked == 0)

    # visible area per track from the CELL raster (role of mask_area)
    visible_area = jnp.sum(free, axis=1) * (CELL * CELL)

    # ellipse filter (flow.py:298-306) on candidates
    center = (t_tlbrs[:, 0:2] + t_tlbrs[:, 2:4]) * 0.5
    semi = (t_tlbrs[:, 2:4] - t_tlbrs[:, 0:2] + 1.0) * 0.5
    rel = (cand_pts[None] - center[:, None]) / jnp.maximum(semi[:, None], 1e-6)
    in_ellipse = jnp.sum(rel ** 2, axis=-1) <= 1.0

    # quality threshold relative to best response in the visible box
    box_max = jnp.max(jnp.where(free, cand_score[None], -jnp.inf), axis=1)
    quality_ok = cand_score[None] >= spec.quality_level * \
        jnp.maximum(box_max[:, None], 1e-6)

    cand_ok = free & in_ellipse & quality_ok
    cand_masked = jnp.where(cand_ok, cand_score[None], -jnp.inf)
    top_score, top_i = jax.lax.top_k(cand_masked, KP_PER_TRACK)  # [T, K]
    new_kps = cand_pts[top_i]
    new_valid = jnp.isfinite(top_score)

    # ---- propagate existing keypoints (_rect_filter) ---------------------
    kp_in_box = _in_box(t_kps, inside[:, None, :])
    # blocked if inside any nearer valid track's box
    kp_in_other = _in_box(t_kps[:, :, None, :], inside[None, None, :, :]) \
        & t_valid[None, None, :]                               # [T, K, T]
    nearer = (t_idx[None, None, :] < t_idx[:, None, None])
    kp_blocked = jnp.any(kp_in_other & nearer, axis=-1)
    prop_valid = t_kp_valid & kp_in_box & ~kp_blocked
    prop_count = jnp.sum(prop_valid, axis=1)

    need_detect = prop_count < spec.feat_density * visible_area
    use_new = need_detect[:, None]
    kps = jnp.where(use_new[..., None], new_kps, t_kps)
    kp_valid = jnp.where(use_new, new_valid, prop_valid) & t_valid[:, None]

    # ---- background candidates (precomputed) ------------------------------
    bg_in_track = jnp.any(_in_box(bg_pts_full[None], inside[:, None, :])
                          & t_valid[:, None], axis=0)
    bg_ok = ~bg_in_track & (bg_score >
                            0.01 * jnp.maximum(jnp.max(bg_score), 1e-6))
    bg_masked = jnp.where(bg_ok, bg_score, -jnp.inf)
    n_bg = min(BG_KP, bg_masked.shape[0])
    bg_top_score, bg_top_i = jax.lax.top_k(bg_masked, n_bg)
    bg_kp = bg_pts_full[bg_top_i]
    bg_valid = jnp.isfinite(bg_top_score)

    all_prev = jnp.concatenate([kps.reshape(-1, 2), bg_kp], axis=0)
    all_valid = jnp.concatenate([kp_valid.reshape(-1), bg_valid], axis=0)
    return all_prev, all_valid, inside


def lk_core(spec: FlowSpec, prev_pyr, prev_tabs, cur_pyr, cur_tabs,
            all_prev, all_valid):
    """One batched pyramidal-LK solve for all points — ONLY the
    while-loops, so it can compile as its own small kernel (inside a
    large module the loop state spills out of VMEM and every
    Gauss-Newton round costs several times its standalone time; same
    effect as the association solvers, see tracker._assoc_costs_core)."""
    opt_scale = jnp.array([spec.opt_scale[0], spec.opt_scale[1]])
    cur_scaled, status, err = lk_pyramidal(
        prev_pyr, prev_tabs, cur_pyr, cur_tabs,
        all_prev * opt_scale, all_valid, spec)
    all_cur = cur_scaled / opt_scale
    status = status & all_valid & (err < spec.max_error)
    return all_cur, status


def flow_post_core(spec: FlowSpec, t_tlbrs, t_valid, inside,
                   all_prev, all_cur, status, seed):
    """RANSAC homography/similarity + box estimates — the post-LK half
    of a flow step (scan-based fixed-budget solvers, no while-loops)."""
    w_f, h_f = spec.size
    frame_tlbr = jnp.array([0.0, 0.0, w_f - 1.0, h_f - 1.0])
    f_cap = t_tlbrs.shape[0]               # track budget = input shape
    t_idx = jnp.arange(f_cap)
    n_track_pts = f_cap * KP_PER_TRACK
    trk_prev = all_prev[:n_track_pts].reshape(f_cap, KP_PER_TRACK, 2)
    trk_cur = all_cur[:n_track_pts].reshape(f_cap, KP_PER_TRACK, 2)
    trk_status = status[:n_track_pts].reshape(f_cap, KP_PER_TRACK)
    bg_prev = all_prev[n_track_pts:]
    bg_cur = all_cur[n_track_pts:]
    bg_status = status[n_track_pts:]

    # ---- camera motion ----------------------------------------------------
    key = jax.random.PRNGKey(seed)
    h_ok, h_mat, bg_inlier = ransac_homography(
        bg_prev, bg_cur, bg_status, jax.random.fold_in(key, 0),
        spec.inlier_thresh)

    # ---- per-track similarity fit (vmapped) ------------------------------
    # foreground filter on matched points: in-frame and not captured by a
    # nearer track's box (parallel stand-in for the second fg_mask pass,
    # flow.py:240, 262-263)
    cur_in_frame = _in_box(trk_cur, frame_tlbr[None, None, :])
    cur_in_other = _in_box(trk_cur[:, :, None, :], inside[None, None, :, :]) \
        & t_valid[None, None, :]
    nearer = (t_idx[None, None, :] < t_idx[:, None, None])
    cur_blocked = jnp.any(cur_in_other & nearer, axis=-1)
    match_valid = trk_status & cur_in_frame & ~cur_blocked

    keys = jax.random.split(jax.random.fold_in(key, 1), f_cap)
    sim_ok, aff, sim_inlier, n_matched, n_inl = jax.vmap(
        lambda p, c, v, k: ransac_similarity(p, c, v, k, spec.inlier_thresh)
    )(trk_prev, trk_cur, match_valid, keys)

    # ---- bbox estimate (flow.py:272-279) ---------------------------------
    a_col = aff[:, :, 0]
    scale = jnp.sqrt(jnp.sum(a_col * a_col, axis=1))
    scale = jnp.where((scale < 0.9) | (scale > 1.1), 1.0, scale)
    tl = t_tlbrs[:, 0:2]
    tl_new = jnp.einsum('tij,tj->ti', aff[:, :, 0:2], tl) + aff[:, :, 2]
    wh = (t_tlbrs[:, 2:4] - t_tlbrs[:, 0:2] + 1.0) * scale[:, None]
    est = jnp.concatenate([tl_new, tl_new + wh - 1.0], axis=1)
    est = jnp.round(est)

    est_in_frame = (jnp.minimum(est[:, 2], frame_tlbr[2]) >=
                    jnp.maximum(est[:, 0], frame_tlbr[0])) & \
                   (jnp.minimum(est[:, 3], frame_tlbr[3]) >=
                    jnp.maximum(est[:, 1], frame_tlbr[1]))
    est_valid = t_valid & sim_ok & est_in_frame & (n_inl >= spec.inlier_thresh)
    inlier_ratio = n_inl / jnp.maximum(n_matched, 1)

    out_kp_valid = sim_inlier & match_valid
    return (h_ok, h_mat, bg_prev, bg_cur, bg_inlier & bg_status,
            est, est_valid, inlier_ratio.astype(jnp.float32),
            trk_prev, trk_cur, out_kp_valid)


def flow_step_core(spec: FlowSpec, prev_state, cur_state,
                   t_tlbrs, t_valid, t_kps, t_kp_valid, seed):
    """One flow step over two preprocessed frame states (see
    _preprocess_jit): corner management, one batched LK solve, camera
    homography RANSAC, per-track similarity fits. Composition of
    flow_points_core / lk_core / flow_post_core as a single traceable
    unit (used by the fused chained-track kernel; the single-stream hot
    path dispatches the three parts separately)."""
    all_prev, all_valid, inside = flow_points_core(
        spec, prev_state, t_tlbrs, t_valid, t_kps, t_kp_valid)
    all_cur, status = lk_core(
        spec, prev_state[0], prev_state[1], cur_state[0], cur_state[1],
        all_prev, all_valid)
    return flow_post_core(spec, t_tlbrs, t_valid, inside,
                          all_prev, all_cur, status, seed)


_flow_step_jit = partial(jax.jit, static_argnames=('spec',))(flow_step_core)


def flow_step(spec: FlowSpec, prev_state, cur_state, t_tlbrs, t_valid,
              t_kps, t_kp_valid, seed: int):
    """Host entry: run the jitted step over two preprocessed states."""
    return _flow_step_jit(spec, prev_state, cur_state,
                          jnp.asarray(t_tlbrs), jnp.asarray(t_valid),
                          jnp.asarray(t_kps), jnp.asarray(t_kp_valid),
                          jnp.uint32(seed))
