#!/usr/bin/env python3
"""Convert pretrained checkpoints into fastmot_tpu .npz parameter files.

Capability reference: the reference's offline conversion tooling
(scripts/yolo2onnx.py Darknet->ONNX; FastMOT ships OSNet/SSD weights via
gdown, scripts/download_models.sh). Here:

  * Darknet YOLO: the registered zoo models (models/yolo.py) ARE
    DarknetModules built from generated upstream-layout cfgs, so a
    released ``.weights`` file loads in traversal order and snapshots
    into the registry's .npz cache with exactly matching keys. Every
    conversion is verified by a strict ``load_npz`` into a freshly built
    registered model before the file is declared good.
  * OSNet (torchreid checkpoints, .pth): structural key map
    (models/osnet_convert.py) covering conv/depthwise/bn/gate/fc —
    the complete eval-time tensor set.

  * ONNX (the reference's own released files, scripts/download_models.sh):
    yolov4_crowdhuman.onnx maps by cfg-section ordinal
    (models/onnx_import.py); osnet_x0_25_msmt17.onnx keeps torch
    state_dict keys as initializer names, so the same structural map
    applies. No onnx package needed — the wire format is read directly.
  * TF frozen graphs (ssd_*_coco.pb): Const tensors extracted by the
    same wire reader, mapped structurally (models/ssd_convert.py).

Usage:
  python scripts/convert_weights.py darknet --model YOLOv4 \
      --weights yolov4-crowdhuman.weights
  python scripts/convert_weights.py darknet --cfg custom.cfg \
      --weights custom.weights --out custom.npz
  python scripts/convert_weights.py onnx --model YOLOv4 \
      --onnx yolov4_crowdhuman.onnx
  python scripts/convert_weights.py osnet --ckpt osnet_x0_25_msmt17.onnx \
      --model OSNet025         # .pth checkpoints work too
  python scripts/convert_weights.py ssd --model SSDMobileNetV1 \
      --pb ssd_mobilenet_v1_coco.pb
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np


def _default_out(name):
    from fastmot_tpu.models.registry import WEIGHTS_DIR
    return WEIGHTS_DIR / f'{name}.npz'


def convert_darknet(args):
    import jax
    from fastmot_tpu.models import registry
    from fastmot_tpu.models.darknet import load_darknet_weights
    from fastmot_tpu.models.registry import load_npz, save_npz

    if args.model:
        cls = registry.YOLOModel.get_model(args.model)
        module = cls.build()
        c, h, w = cls.INPUT_SHAPE
        out = Path(args.out) if args.out else _default_out(args.model)
    else:
        assert args.cfg, 'need --model or --cfg'
        from fastmot_tpu.models.darknet import yolo_from_cfg
        module, _, meta = yolo_from_cfg(args.cfg)
        c, h, w = meta['input_shape']
        out = Path(args.out or 'darknet.npz')
    import jax.numpy as jnp
    # fully convolutional: init at a small spatial size for speed
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, c), jnp.float32))
    params, header = load_darknet_weights(module.sections, params,
                                          args.weights)
    save_npz(params, out)
    # verification: strict reload into a fresh tree must cover everything
    fresh = module.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 64, 64, c), jnp.float32))
    load_npz(fresh, out, strict=True)
    print(f'wrote {out} (darknet header {header[:3].tolist()}, '
          f'verified strict reload)')


def convert_onnx_yolo(args):
    """Reference-released yolo2onnx file -> registered zoo npz."""
    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models import registry
    from fastmot_tpu.models.onnx_import import yolo_params_from_onnx
    from fastmot_tpu.models.registry import load_npz, save_npz

    cls = registry.YOLOModel.get_model(args.model)
    module = cls.build()
    if not hasattr(module, 'sections'):
        raise SystemExit(f'{args.model} is not darknet-backed; ONNX '
                         f'ordinal mapping only applies to cfg-built models')
    c, h, w = cls.INPUT_SHAPE
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, c), jnp.float32))
    params = yolo_params_from_onnx(module.sections, params, args.onnx)
    out = Path(args.out) if args.out else _default_out(args.model)
    save_npz(params, out)
    fresh = module.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 64, 64, c), jnp.float32))
    load_npz(fresh, out, strict=True)
    print(f'wrote {out} (verified strict reload)')


def convert_ssd(args):
    """TF frozen graph (.pb) -> registered SSD zoo npz."""
    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models import registry
    from fastmot_tpu.models.protoparse import graphdef_constants
    from fastmot_tpu.models.registry import load_npz
    from fastmot_tpu.models.ssd_convert import convert_frozen_graph

    cls = registry.SSDModel.get_model(args.model)
    module = cls.build()
    c, h, w = cls.INPUT_SHAPE
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, c), jnp.float32))
    consts = graphdef_constants(Path(args.pb).read_bytes())
    flat = convert_frozen_graph(consts, params, cls.BACKBONE)
    out = Path(args.out) if args.out else _default_out(args.model)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **flat)
    load_npz(params, out, strict=True)
    print(f'wrote {out} ({len(flat)} tensors, verified strict reload)')


def convert_osnet(args):
    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models import registry
    from fastmot_tpu.models.osnet_convert import convert_state_dict
    from fastmot_tpu.models.registry import load_npz

    cls = registry.ReIDModel.get_model(args.model)
    module = cls.build()
    c, h, w = cls.INPUT_SHAPE
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, c), jnp.float32))

    if str(args.ckpt).endswith('.onnx'):
        # torch.onnx keeps state_dict keys as initializer names
        from fastmot_tpu.models.onnx_import import torch_state_dict_from_onnx
        state = torch_state_dict_from_onnx(args.ckpt)
    else:
        import torch
        ckpt = torch.load(args.ckpt, map_location='cpu', weights_only=False)
        state = ckpt.get('state_dict', ckpt)
    state = {k.replace('module.', ''): np.asarray(v)
             for k, v in state.items()}
    flat = convert_state_dict(state, channels=cls.CHANNELS)
    out = Path(args.out) if args.out else _default_out(args.model)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **flat)
    # verification: strict reload must cover the whole parameter tree
    load_npz(params, out, strict=True)
    print(f'wrote {out} ({len(flat)} tensors, verified strict reload)')


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest='cmd', required=True)
    pd = sub.add_parser('darknet')
    pd.add_argument('--model', help='registered zoo name, e.g. YOLOv4')
    pd.add_argument('--cfg', help='explicit darknet cfg (instead of --model)')
    pd.add_argument('--weights', required=True)
    pd.add_argument('--out')
    pd.set_defaults(fn=convert_darknet)
    po = sub.add_parser('osnet')
    po.add_argument('--ckpt', required=True,
                    help='torchreid .pth or torch-exported .onnx')
    po.add_argument('--model', default='OSNet025')
    po.add_argument('--out')
    po.set_defaults(fn=convert_osnet)
    px = sub.add_parser('onnx')
    px.add_argument('--model', required=True,
                    help='darknet-backed zoo name, e.g. YOLOv4')
    px.add_argument('--onnx', required=True)
    px.add_argument('--out')
    px.set_defaults(fn=convert_onnx_yolo)
    ps = sub.add_parser('ssd')
    ps.add_argument('--model', required=True,
                    help='SSD zoo name, e.g. SSDMobileNetV1')
    ps.add_argument('--pb', required=True,
                    help='TF frozen inference graph')
    ps.add_argument('--out')
    ps.set_defaults(fn=convert_ssd)
    args = p.parse_args()
    args.fn(args)


if __name__ == '__main__':
    main()
