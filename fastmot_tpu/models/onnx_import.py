"""Import weights from the reference's released ONNX checkpoints.

The reference distributes exactly two kinds of ONNX files
(scripts/download_models.sh): YOLO models exported by its own
scripts/yolo2onnx.py, and OSNet ReID models exported from torchreid by
torch.onnx. Both are consumed here without the onnx package, via the
wire-format reader (protoparse.onnx_initializers):

  * yolo2onnx names every parameter ``{NNN}_convolutional_{conv|bn}_
    {weights|bias|scale|mean|var}`` where NNN is the cfg section ordinal
    (net = 000) — see yolo2onnx.py:249-263. Our zoo modules ARE
    DarknetModules built from the same cfgs, so section ordinal i+1 in
    the ONNX file is layer i in ``DarknetModule`` (``conv{i}``/``bn{i}``)
    and the mapping is exact, kernel layout OIHW -> HWIO.

  * torch.onnx keeps state_dict keys as initializer names
    (``conv1.conv.weight``...), which is the exact input
    osnet_convert.convert_state_dict already consumes.

Every import is shape-checked leaf by leaf and verified for full
coverage: unknown initializers or unfilled model convolutions raise.
"""
from __future__ import annotations

import re
from pathlib import Path

import numpy as np

from .protoparse import onnx_initializers

_YOLO_RE = re.compile(
    r'^(\d{3})_convolutional_(conv|bn)_(weights|bias|scale|mean|var)$')


def yolo_params_from_onnx(sections, params, onnx_path):
    """Map a yolo2onnx-exported .onnx onto DarknetModule parameters.

    ``sections``/``params`` come from the registered zoo model
    (models/yolo.py builds each model from its upstream cfg). Returns the
    updated parameter dict (numpy leaves).
    """
    import jax

    inits = onnx_initializers(Path(onnx_path).read_bytes())
    params = jax.device_get(params)
    p = params['params']
    bstats = params.get('batch_stats', {})

    layers = [s for s in sections if s['type'] != 'net']
    consumed = set()

    def take(name, expect_shape):
        if name not in inits:
            raise KeyError(
                f'ONNX file has no initializer {name!r} — was this file '
                f'exported by yolo2onnx.py from the same cfg?')
        arr = np.asarray(inits[name], np.float32)
        if tuple(arr.shape) != tuple(expect_shape):
            raise ValueError(
                f'{name}: shape {arr.shape} != model {tuple(expect_shape)}')
        consumed.add(name)
        return arr

    n_convs = 0
    for i, sec in enumerate(layers):
        if sec['type'] != 'convolutional':
            continue
        n_convs += 1
        base = f'{i + 1:03d}_convolutional'    # net section is ordinal 000
        kern = p[f'conv{i}']['kernel']         # HWIO
        h, w, cin, cout = kern.shape
        oihw = take(f'{base}_conv_weights', (cout, cin, h, w))
        p[f'conv{i}']['kernel'] = np.transpose(oihw, (2, 3, 1, 0)).copy()
        if int(sec.get('batch_normalize', 0)):
            p[f'bn{i}']['scale'] = take(f'{base}_bn_scale', (cout,))
            p[f'bn{i}']['bias'] = take(f'{base}_bn_bias', (cout,))
            bstats[f'bn{i}']['mean'] = take(f'{base}_bn_mean', (cout,))
            bstats[f'bn{i}']['var'] = take(f'{base}_bn_var', (cout,))
        else:
            p[f'conv{i}']['bias'] = take(f'{base}_conv_bias', (cout,))
    if not n_convs:
        raise ValueError('model has no convolutional sections')

    leftover = {k for k in inits if _YOLO_RE.match(k)} - consumed
    if leftover:
        raise ValueError(
            f'{len(leftover)} convolutional initializers in the ONNX file '
            f'were not consumed (cfg mismatch): {sorted(leftover)[:5]}...')
    out = {'params': p}
    if bstats:
        out['batch_stats'] = bstats
    return out


def torch_state_dict_from_onnx(onnx_path):
    """{state_dict_key: ndarray} from a torch.onnx-exported file —
    drop-in for torch.load()['state_dict'] in osnet conversion."""
    inits = onnx_initializers(Path(onnx_path).read_bytes())
    # torch exports every parameter under its state_dict key; constant-
    # folded aux tensors get numeric names — filter those out
    return {k: np.asarray(v) for k, v in inits.items()
            if not k.isdigit() and '.' in k}
