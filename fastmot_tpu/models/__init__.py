"""Model zoo: YOLO detectors, SSD detectors, and ReID extractors in Flax,
plus the label map. Mirrors the reference's registry surface
(fastmot/models/__init__.py) with TPU-native implementations."""

from .label import get_label_name, set_label_map  # noqa: F401
from .registry import ReIDModel, SSDModel, YOLOModel  # noqa: F401
from . import osnet  # noqa: F401  (registers OSNet025 / OSNet10)
from . import yolo  # noqa: F401  (registers the YOLO family)
from . import ssd  # noqa: F401  (registers the SSD family)

YOLO = YOLOModel
SSD = SSDModel
ReID = ReIDModel
