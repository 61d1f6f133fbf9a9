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


class DarknetModule(nn.Module):
    """Executes a parsed Darknet cfg. Returns the list of raw yolo-head
    feature maps (NHWC), in cfg order.

    ``precision`` pins the conv matmul precision ('highest' for float32
    oracle/parity checks; None = platform default, bf16 passes on TPU).
    ``dtype`` sets the conv compute dtype (bfloat16 for MXU throughput;
    BatchNorm and the yolo head outputs stay float32).
    """
    sections: tuple   # tuple of (frozen) section dicts; net section first
    precision: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outputs = []        # per-layer outputs (index aligned with layers)
        heads = []
        layers = [s for s in self.sections if s['type'] != 'net']
        for i, sec in enumerate(layers):
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
