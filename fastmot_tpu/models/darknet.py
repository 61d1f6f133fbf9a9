"""Darknet .cfg parser, interpreter module, and .weights loader.

Capability reference: scripts/yolo2onnx.py in the reference repo (Darknet
cfg parser + weight loader + ONNX graph builder, 919 LoC). The TPU-native
inversion: instead of converting to an intermediate format, the parsed cfg
IS the model — ``DarknetModule`` executes the layer list directly in Flax,
and ``load_darknet_weights`` maps the binary weight file onto the module's
parameter tree in traversal order. This makes every Darknet-family model
(YOLOv3/v4/tiny/CSP/Scaled) runnable from its upstream cfg + weights with
no conversion step, matching yolo2onnx.py's supported layer set:
convolutional (bn + leaky/mish/swish/logistic/linear), shortcut, route
(multi-input concat + groups), upsample, maxpool; yolo sections become
head outputs consumed by models.yolo.decode_heads.
"""
from __future__ import annotations

import io
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def parse_cfg(text: str) -> list[dict]:
    """Parse Darknet cfg text into an ordered list of section dicts."""
    sections: list[dict] = []
    for raw in text.splitlines():
        line = raw.split('#')[0].strip()
        if not line:
            continue
        if line.startswith('['):
            sections.append({'type': line.strip('[]').strip()})
        else:
            key, _, val = line.partition('=')
            key = key.strip()
            val = val.strip()
            parsed: object
            try:
                parsed = int(val)
            except ValueError:
                try:
                    parsed = float(val)
                except ValueError:
                    if ',' in val:
                        items = [v.strip() for v in val.split(',')]
                        try:
                            parsed = [int(v) for v in items]
                        except ValueError:
                            try:
                                parsed = [float(v) for v in items]
                            except ValueError:
                                parsed = items
                    else:
                        parsed = val
            sections[-1][key] = parsed
    return sections


def _aslist(v):
    # flax module attributes deep-convert lists to tuples — accept both
    return list(v) if isinstance(v, (list, tuple)) else [v]


_DN_ACTS = {
    'leaky': lambda x: jax.nn.leaky_relu(x, 0.1),
    'mish': lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    'swish': jax.nn.silu,
    'logistic': jax.nn.sigmoid,
    'linear': lambda x: x,
}


def _space_to_depth(x):
    """[N, H, W, C] -> [N, H/2, W/2, 4C]; channel packing (qy, qx, c).

    Kept as reshape/transpose: a strided-slice + channel-concat variant
    (4x ``x[:, qy::2, qx::2, :]``) was tried against the v5e op trace
    and REGRESSED the YOLO graph 2.0 -> 3.5 ms/frame — the four strided
    reads lower to slow scalarized copies, while the 6-D transpose is a
    single (merely mediocre, ~0.28 ms) layout shuffle."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _fold_stem_s1(w):
    """Re-express a 3x3 stride-1 conv kernel [3, 3, cin, co] as the exact
    equivalent [3, 3, 4*cin, 4*co] kernel over space-to-depth input,
    producing PHASE-PACKED output (channel (py, px, o) = output pixel
    (2Y+py, 2X+px) channel o). Derivation: for output phase p and tap d,
    the source pixel offset s = p + d - 1 decomposes into cell offset
    floor(s/2) in {-1, 0, 1} and pixel phase s mod 2."""
    cin, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * cin, 4 * co), w.dtype)
    for py in range(2):
        for px in range(2):
            for dy in range(3):
                for dx in range(3):
                    sy, sx = py + dy - 1, px + dx - 1
                    ky, kx = sy // 2 + 1, sx // 2 + 1
                    qy, qx = sy % 2, sx % 2
                    ci = (qy * 2 + qx) * cin
                    oo = (py * 2 + px) * co
                    out = out.at[ky, kx, ci:ci + cin, oo:oo + co].set(
                        w[dy, dx])
    return out


def _fold_stem_s2(w):
    """Re-express a 3x3 stride-2 conv kernel [3, 3, cin, co] as the exact
    equivalent 2x2 STRIDE-1 kernel [2, 2, 4*cin, co] over phase-packed
    input (same packing as _fold_stem_s1 output / _space_to_depth).
    Output positions are the stride-2 grid = the packed cell grid.
    XLA 'SAME' for stride 2 puts the whole pad at the END (out Y taps
    pixels {2Y, 2Y+1, 2Y+2}), so taps reach cells {0, +1} and the conv
    pads (0, 1) on bottom/right only."""
    cin, co = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 4 * cin, co), w.dtype)
    for dy in range(3):
        for dx in range(3):
            ky, kx = dy // 2, dx // 2
            qy, qx = dy % 2, dx % 2
            ci = (qy * 2 + qx) * cin
            out = out.at[ky, kx, ci:ci + cin, :co].set(w[dy, dx])
    return out


class _StemConv(nn.Module):
    """Stem conv executed in space-to-depth form. Declares its kernel
    with nn.Conv's exact parameter shape/name so .weights loading and
    float counting are unchanged; the fold is applied in-graph (the
    kernel is tiny)."""
    features: int
    cin: int
    variant: str                    # 's1' (stride-1 fold) | 's2'
    precision: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_packed):
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (3, 3, self.cin, self.features), jnp.float32)
        if self.variant == 's1':
            wf = _fold_stem_s1(w)
            pad = 'SAME'
        else:
            wf = _fold_stem_s2(w)
            pad = ((0, 1), (0, 1))
        return jax.lax.conv_general_dilated(
            x_packed.astype(self.dtype), wf.astype(self.dtype),
            window_strides=(1, 1), padding=pad,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            precision=self.precision,
            preferred_element_type=jnp.float32)


class _PackedBN(nn.Module):
    """Inference BatchNorm over phase-packed channels: parameters keep
    the UNPACKED channel count (so checkpoints load unchanged) and are
    tiled across the 4 phases at apply time."""
    features: int
    tile: int = 4

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          jnp.float32)
        mean = self.variable('batch_stats', 'mean', nn.initializers.zeros,
                             None, (self.features,), jnp.float32)
        var = self.variable('batch_stats', 'var', nn.initializers.ones,
                            None, (self.features,), jnp.float32)
        mul = jnp.tile(scale * jax.lax.rsqrt(var.value + 1e-5), self.tile)
        add = jnp.tile(bias - mean.value * scale
                       * jax.lax.rsqrt(var.value + 1e-5), self.tile)
        return x * mul + add


class DarknetModule(nn.Module):
    """Executes a parsed Darknet cfg. Returns the list of raw yolo-head
    feature maps (NHWC), in cfg order.

    ``precision`` pins the conv matmul precision ('highest' for float32
    oracle/parity checks; None = platform default, bf16 passes on TPU).
    ``dtype`` sets the conv compute dtype (bfloat16 for MXU throughput;
    BatchNorm and the yolo head outputs stay float32).

    ``s2d_stem`` enables the exact space-to-depth re-expression of the
    leading 3x3 convs (see _fold_stem_s1/_fold_stem_s2): the first conv
    of every Darknet YOLO runs on a 3-channel full-resolution image,
    which fills at most 3 of the MXU's 128 contraction lanes — measured
    ~0.9 ms of a 2.1 ms YOLOv4-512 graph (conv1 at 1.7 TFLOP/s, plus
    layout copies). Folding to the half-resolution phase-packed form
    raises the contraction width to 12->128 with identical arithmetic.
    """
    sections: tuple   # tuple of (frozen) section dicts; net section first
    precision: str | None = None
    dtype: jnp.dtype = jnp.float32
    s2d_stem: bool = True

    def _stem_plan(self, layers, h, w):
        """Number of leading layers the s2d stem path replaces (0 = no
        fold). Guarded: plain 3x3 group-1 convs, even input size, and no
        route/shortcut referencing a layer whose stored output would be
        phase-packed."""
        if not self.s2d_stem or h % 2 or w % 2:
            return 0
        refd = set()
        for i, sec in enumerate(layers):
            if sec['type'] == 'route':
                refd.update(i + l if l < 0 else l
                            for l in _aslist(sec['layers']))
            elif sec['type'] == 'shortcut':
                frm = int(sec['from'])
                refd.add(i + frm if frm < 0 else frm)

        def plain_conv(sec, stride):
            return (sec['type'] == 'convolutional'
                    and int(sec.get('size', 1)) == 3
                    and int(sec.get('stride', 1)) == stride
                    and int(sec.get('groups', 1)) == 1
                    and int(sec.get('pad', 0)) == 1
                    and int(sec.get('batch_normalize', 0)) == 1)

        if layers and plain_conv(layers[0], 2):
            return 1                      # tiny-style stem: one s2 conv
        if (len(layers) > 1 and plain_conv(layers[0], 1)
                and plain_conv(layers[1], 2) and 0 not in refd):
            return 2                      # v3/v4-style stem: s1 then s2
        return 0

    def _stem_layer(self, i, sec, x_packed, cin, variant):
        """One folded stem conv + (tiled) BN + activation, with the same
        parameter tree as the normal path."""
        filters = int(sec['filters'])
        bn = int(sec.get('batch_normalize', 0))
        act = sec.get('activation', 'linear')
        y = _StemConv(filters, cin, variant, name=f'conv{i}',
                      precision=self.precision, dtype=self.dtype)(x_packed)
        tile = 4 if variant == 's1' else 1
        if bn:
            y = _PackedBN(filters, tile, name=f'bn{i}')(y)
        return _DN_ACTS[act](y)

    def stem_packs(self, h, w):
        """True if ``__call__`` would fold the stem for an (h, w) input —
        i.e. a caller may pass phase-packed input via ``prepacked=True``.
        Pure section inspection; usable outside apply()."""
        layers = [s for s in self.sections if s['type'] != 'net']
        return self._stem_plan(layers, h, w) > 0

    @nn.compact
    def __call__(self, x, prepacked=False):
        """``prepacked=True`` means ``x`` is ALREADY in space-to-depth
        form [N, H/2, W/2, 4C] with (qy, qx, c) channel packing (the
        exact `_space_to_depth` layout) — the caller built it for free
        inside its preprocessing matmuls (detector._resize_phase_packed),
        so the in-graph relayout shuffle is skipped. Requires a foldable
        stem (raises otherwise); the parameter tree is identical."""
        outputs = []        # per-layer outputs (index aligned with layers)
        heads = []
        layers = [s for s in self.sections if s['type'] != 'net']
        if prepacked:
            ih, iw = x.shape[1] * 2, x.shape[2] * 2
            stem_n = self._stem_plan(layers, ih, iw)
            if not stem_n:
                raise ValueError('prepacked input requires a foldable '
                                 's2d stem (see _stem_plan guards)')
        else:
            stem_n = self._stem_plan(layers, x.shape[1], x.shape[2])
        if stem_n:
            cin = x.shape[-1] // 4 if prepacked else x.shape[-1]
            packed = x if prepacked else _space_to_depth(x)
            if stem_n == 1:
                x = self._stem_layer(0, layers[0], packed, cin, 's2')
                outputs.append(x)
            else:
                mid = self._stem_layer(0, layers[0], packed, cin, 's1')
                outputs.append(mid)   # phase-packed; guarded unreferenced
                x = self._stem_layer(1, layers[1],
                                     mid.astype(jnp.float32),
                                     int(layers[0]['filters']), 's2')
                outputs.append(x)
        for i, sec in enumerate(layers):
            if i < stem_n:
                continue
            t = sec['type']
            if t == 'convolutional':
                filters = int(sec['filters'])
                size = int(sec.get('size', 1))
                stride = int(sec.get('stride', 1))
                pad = 'SAME' if int(sec.get('pad', 0)) else 'VALID'
                groups = int(sec.get('groups', 1))
                bn = int(sec.get('batch_normalize', 0))
                act = sec.get('activation', 'linear')
                y = nn.Conv(filters, (size, size), (stride, stride),
                            padding=pad, feature_group_count=groups,
                            use_bias=not bn, name=f'conv{i}',
                            precision=self.precision, dtype=self.dtype)(x)
                if bn:
                    y = nn.BatchNorm(use_running_average=True,
                                     name=f'bn{i}', dtype=jnp.float32)(y)
                x = _DN_ACTS[act](y)
            elif t == 'shortcut':
                frm = int(sec['from'])
                src = outputs[i + frm if frm < 0 else frm]
                x = x + src
                act = sec.get('activation', 'linear')
                x = _DN_ACTS[act](x)
            elif t == 'route':
                idxs = [i + l if l < 0 else l for l in _aslist(sec['layers'])]
                feats = [outputs[j] for j in idxs]
                x = feats[0] if len(feats) == 1 else jnp.concatenate(feats, -1)
                g = int(sec.get('groups', 1))
                if g > 1:
                    gid = int(sec.get('group_id', 0))
                    c = x.shape[-1] // g
                    x = x[..., gid * c:(gid + 1) * c]
            elif t == 'upsample':
                s = int(sec.get('stride', 2))
                n, h, w, c = x.shape
                x = jax.image.resize(x, (n, h * s, w * s, c), 'nearest')
            elif t == 'maxpool':
                size = int(sec.get('size', 2))
                stride = int(sec.get('stride', size))
                x = nn.max_pool(x, (size, size), (stride, stride),
                                padding='SAME')
            elif t == 'yolo':
                heads.append(x.astype(jnp.float32))
                # head output is not an input to later layers' compute;
                # darknet keeps the pre-yolo tensor as the layer output
            else:
                raise ValueError(f'Unsupported darknet layer: {t}')
            outputs.append(x)
        return heads


def yolo_meta_from_cfg(sections) -> dict:
    """Extract decode metadata (anchors per head, scales, new_coords,
    classes, input shape) from the parsed cfg."""
    net = next(s for s in sections if s['type'] == 'net')
    yolos = [s for s in sections if s['type'] == 'yolo']
    assert yolos, 'cfg has no yolo sections'
    anchors = []
    scales = []
    new_coords = bool(yolos[0].get('new_coords', 0))
    for y in yolos:
        flat = _aslist(y['anchors'])
        mask = _aslist(y['mask'])
        head_anchors = []
        for m in mask:
            head_anchors += [flat[2 * m], flat[2 * m + 1]]
        anchors.append(head_anchors)
        scales.append(float(y.get('scale_x_y', 1.0)))
    return {
        'num_classes': int(yolos[0]['classes']),
        'input_shape': (3, int(net['height']), int(net['width'])),
        'anchors': anchors,
        'scales': scales,
        'new_coords': new_coords,
    }


def load_darknet_weights(sections, params, weights_path):
    """Map a Darknet .weights binary onto DarknetModule parameters.

    Layout (as consumed by yolo2onnx.py's WeightLoader): 5 int32 header,
    then per convolutional layer in cfg order: [bn: beta, gamma, mean,
    var (each [filters])] or [bias], then conv kernel in OIHW order.
    Flax convs use HWIO, so kernels transpose (2, 3, 1, 0).
    """
    buf = Path(weights_path).read_bytes()
    header = np.frombuffer(buf[:20], dtype=np.int32)
    data = np.frombuffer(buf[20:], dtype=np.float32)
    pos = 0

    def take(n):
        nonlocal pos
        out = data[pos:pos + n]
        assert len(out) == n, 'weights file exhausted early'
        pos += n
        return out

    params = jax.device_get(params)
    p = params['params']
    bstats = params.get('batch_stats', {})
    layers = [s for s in sections if s['type'] != 'net']
    prev_c = 3
    channels = []
    for i, sec in enumerate(layers):
        t = sec['type']
        if t == 'convolutional':
            name = f'conv{i}'
            filters = int(sec['filters'])
            size = int(sec.get('size', 1))
            groups = int(sec.get('groups', 1))
            bn = int(sec.get('batch_normalize', 0))
            c_in = prev_c
            if bn:
                beta = take(filters)
                gamma = take(filters)
                mean = take(filters)
                var = take(filters)
                p[f'bn{i}']['bias'] = beta.copy()
                p[f'bn{i}']['scale'] = gamma.copy()
                bstats[f'bn{i}']['mean'] = mean.copy()
                bstats[f'bn{i}']['var'] = var.copy()
            else:
                p[name]['bias'] = take(filters).copy()
            k = take(filters * (c_in // groups) * size * size)
            k = k.reshape(filters, c_in // groups, size, size)
            p[name]['kernel'] = np.transpose(k, (2, 3, 1, 0)).copy()
            prev_c = filters
        elif t == 'shortcut':
            pass
        elif t == 'route':
            idxs = [i + l if l < 0 else l for l in _aslist(sec['layers'])]
            prev_c = sum(channels[j] for j in idxs)
            g = int(sec.get('groups', 1))
            prev_c //= g
        elif t in ('upsample', 'maxpool', 'yolo'):
            pass
        channels.append(prev_c)
    assert pos == len(data), (
        f'weights file has {len(data) - pos} unconsumed floats')
    out = {'params': p}
    if bstats:
        out['batch_stats'] = bstats
    return jax.tree_util.tree_map(jnp.asarray, out), header


def count_weight_floats(sections) -> int:
    """Number of float32 values a Darknet .weights file holds for this cfg
    (bn: 4 vectors + kernel; else bias + kernel) — the exact layout
    load_darknet_weights consumes. Matches upstream released files
    (yolov4: 64,429,405; yolov3: 62,001,757 — tests/test_cfgs.py)."""
    layers = [s for s in sections if s['type'] != 'net']
    prev_c, channels, total = 3, [], 0
    for i, sec in enumerate(layers):
        t = sec['type']
        if t == 'convolutional':
            f = int(sec['filters'])
            k = int(sec.get('size', 1))
            g = int(sec.get('groups', 1))
            bn = int(sec.get('batch_normalize', 0))
            total += 4 * f if bn else f
            total += f * (prev_c // g) * k * k
            prev_c = f
        elif t == 'route':
            idxs = [i + l if l < 0 else l for l in _aslist(sec['layers'])]
            prev_c = sum(channels[j] for j in idxs) // int(sec.get('groups', 1))
        channels.append(prev_c)
    return total


def yolo_from_cfg(cfg_path, weights_path=None):
    """Build a runnable (module, params, meta) triple from a Darknet cfg
    (+ optional .weights). ``meta`` feeds models.yolo.decode_heads."""
    sections = parse_cfg(Path(cfg_path).read_text())
    meta = yolo_meta_from_cfg(sections)
    module = DarknetModule(sections=tuple(_hashable(s) for s in sections))
    c, h, w = meta['input_shape']
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, c), jnp.float32))
    if weights_path is not None:
        params, _ = load_darknet_weights(sections, params, weights_path)
    return module, params, meta


class _FrozenSection(dict):
    """Hashable section dict so DarknetModule is a valid static pytree."""

    def __hash__(self):
        return hash(tuple(sorted(
            (k, tuple(v) if isinstance(v, list) else v)
            for k, v in self.items())))


def _hashable(sec: dict) -> _FrozenSection:
    return _FrozenSection(sec)
