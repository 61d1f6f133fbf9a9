"""fastmot_tpu: a TPU-native multiple-object-tracking framework in JAX.

A ground-up rebuild of the capabilities of GeekAlexis/FastMOT
(reference: fastmot/__init__.py public surface) with an XLA/Pallas-first
architecture: batched Flax detectors and ReID with fused pre/post-
processing, vectorized Kalman filtering, on-device association, and
fixed-budget optical flow + RANSAC.
"""

from .videoio import VideoIO  # noqa: F401
from .mot import MOT  # noqa: F401
from .feature_extractor import FeatureExtractor  # noqa: F401
from .tracker import MultiTracker  # noqa: F401
from .kalman import KalmanConfig, MeasType  # noqa: F401
from .flow import Flow  # noqa: F401
from .track import Track  # noqa: F401

__version__ = '0.1.0'
