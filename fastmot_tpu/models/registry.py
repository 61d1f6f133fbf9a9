"""Model registries.

Behavioral reference: the class-attribute registries in
fastmot/models/yolo.py:39-58, ssd.py, reid.py (``__init_subclass__`` +
``get_model(name)``). Engine caching (TensorRT serialize/deserialize,
yolo.py:149-150) maps to parameter caching: models build Flax modules and
initialize or load converted weights from an on-disk .npz cache.
"""
from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

LOGGER = logging.getLogger(__name__)

WEIGHTS_DIR = Path(__file__).parent / 'weights'

_YOLO_REGISTRY: dict[str, type] = {}
_SSD_REGISTRY: dict[str, type] = {}
_REID_REGISTRY: dict[str, type] = {}


def register_yolo(cls):
    _YOLO_REGISTRY[cls.__name__] = cls
    return cls


def register_ssd(cls):
    _SSD_REGISTRY[cls.__name__] = cls
    return cls


def register_reid(cls):
    _REID_REGISTRY[cls.__name__] = cls
    return cls


class _ModelBase:
    """Shared lookup + parameter-cache machinery."""

    INPUT_SHAPE: tuple[int, int, int]  # (C, H, W), reference layout

    @classmethod
    def build(cls):
        raise NotImplementedError

    @classmethod
    def init_params(cls, seed: int = 0):
        """Initialize (or load cached) parameters for this model.

        The analog of the reference's engine cache: if a converted/saved
        weight file exists under ``models/weights/<Name>.npz`` it is
        loaded; otherwise parameters are randomly initialized.
        """
        module = cls.build()
        c, h, w = cls.INPUT_SHAPE
        dummy = jnp.zeros((1, h, w, c), jnp.float32)
        params = module.init(jax.random.PRNGKey(seed), dummy)
        npz = WEIGHTS_DIR / f'{cls.__name__}.npz'
        if npz.exists():
            params = load_npz(params, npz)
            LOGGER.info('Loaded weights from %s', npz)
        else:
            LOGGER.warning('No pretrained weights at %s - using random init',
                           npz)
        return module, params


def load_npz(params, path, strict: bool = True):
    """Overlay a flat .npz of named arrays onto a parameter pytree.

    ``strict`` (default) raises if any npz key does not match a parameter
    path or any parameter is left uncovered — a silently partial overlay
    is indistinguishable from loaded weights and must never pass as one.
    """
    flat = dict(np.load(path))
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    used = set()
    missing = []
    for key_path, leaf in leaves:
        name = '/'.join(str(getattr(k, 'key', k)) for k in key_path)
        if name in flat:
            arr = jnp.asarray(flat[name], dtype=leaf.dtype)
            if arr.shape != leaf.shape:
                raise ValueError(
                    f'{path}: shape mismatch for {name}: '
                    f'{arr.shape} vs expected {leaf.shape}')
            new_leaves.append(arr)
            used.add(name)
        else:
            missing.append(name)
            new_leaves.append(leaf)
    unmatched = sorted(set(flat) - used)
    if strict and (unmatched or missing):
        raise ValueError(
            f'{path} does not cover the parameter tree: '
            f'{len(unmatched)} unmatched npz keys '
            f'(e.g. {unmatched[:3]}), {len(missing)} uncovered params '
            f'(e.g. {missing[:3]}). Regenerate with '
            f'scripts/convert_weights.py, or pass strict=False for a '
            f'deliberate partial overlay.')
    if unmatched:
        LOGGER.warning('%s: %d npz keys unmatched', path, len(unmatched))
    if missing:
        LOGGER.warning('%s: %d params left at init values', path,
                       len(missing))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_npz(params, path):
    """Save a parameter pytree as a flat .npz (for weight conversion)."""
    flat = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = '/'.join(str(getattr(k, 'key', k)) for k in key_path)
        flat[name] = np.asarray(leaf)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


class YOLOModel(_ModelBase):
    NUM_CLASSES: int
    LETTERBOX: bool = False

    @classmethod
    def get_model(cls, name: str):
        return _YOLO_REGISTRY[name]


class SSDModel(_ModelBase):
    NUM_CLASSES: int
    TOPK: int = 100
    NMS_THRESH: float = 0.5   # NMS_TRT nmsThreshold (reference ssd.py:105)

    @classmethod
    def get_model(cls, name: str):
        return _SSD_REGISTRY[name]


class ReIDModel(_ModelBase):
    OUTPUT_LAYOUT: int
    METRIC: str

    @classmethod
    def get_model(cls, name: str):
        return _REID_REGISTRY[name]
