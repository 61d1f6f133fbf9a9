"""Class-ID to label-name mapping.

Behavioral reference: fastmot/models/label.py — the 91-class COCO name
table with index 0 mapped to 'head' (the CrowdHuman convention used by the
default YOLOv4 model), and a mutable global overridable at startup via
``set_label_map`` (label.py:109-121).
"""
from __future__ import annotations

_COCO91 = (
    'head', 'person', 'bicycle', 'car', 'motorcycle', 'airplane', 'bus',
    'train', 'truck', 'boat', 'traffic light', 'fire hydrant', 'street sign',
    'stop sign', 'parking meter', 'bench', 'bird', 'cat', 'dog', 'horse',
    'sheep', 'cow', 'elephant', 'bear', 'zebra', 'giraffe', 'hat', 'backpack',
    'umbrella', 'shoe', 'eye glasses', 'handbag', 'tie', 'suitcase',
    'frisbee', 'skis', 'snowboard', 'sports ball', 'kite', 'baseball bat',
    'baseball glove', 'skateboard', 'surfboard', 'tennis racket', 'bottle',
    'plate', 'wine glass', 'cup', 'fork', 'knife', 'spoon', 'bowl', 'banana',
    'apple', 'sandwich', 'orange', 'broccoli', 'carrot', 'hot dog', 'pizza',
    'donut', 'cake', 'chair', 'couch', 'potted plant', 'bed', 'mirror',
    'dining table', 'window', 'desk', 'toilet', 'door', 'tv', 'laptop',
    'mouse', 'remote', 'keyboard', 'cell phone', 'microwave', 'oven',
    'toaster', 'sink', 'refrigerator', 'blender', 'book', 'clock', 'vase',
    'scissors', 'teddy bear', 'hair drier', 'toothbrush', 'hair brush',
)

_label_map: tuple[str, ...] = _COCO91


def get_label_name(class_id: int) -> str:
    """Look up the label name for a class ID."""
    return _label_map[class_id]


def set_label_map(label_map) -> None:
    """Set a custom label map (sequence of strings indexed by class ID)."""
    global _label_map
    _label_map = tuple(str(label) for label in label_map)
