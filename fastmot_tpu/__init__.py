"""fastmot_tpu: a TPU-native multiple-object-tracking framework in JAX.

A ground-up rebuild of the capabilities of GeekAlexis/FastMOT
(reference: fastmot/__init__.py public surface) with an XLA/Pallas-first
architecture: batched Flax detectors and ReID with fused pre/post-
processing, vectorized Kalman filtering, on-device association, and
fixed-budget optical flow + RANSAC.
"""

import os as _os

# Persistent XLA compilation cache — the analog of the reference's TensorRT
# engine cache (utils/inference.py:56-63): first run compiles and caches,
# later runs deserialize. Opt out with FASTMOT_TPU_NO_CACHE=1.
if not _os.environ.get('FASTMOT_TPU_NO_CACHE'):
    import jax as _jax
    _cache_dir = _os.environ.get(
        'FASTMOT_TPU_CACHE_DIR',
        _os.path.join(_os.path.expanduser('~'), '.cache', 'fastmot_tpu_xla'))
    try:
        _jax.config.update('jax_compilation_cache_dir', _cache_dir)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:  # older jax without the knobs — cache is best-effort
        pass

from .videoio import VideoIO  # noqa: F401
from .mot import MOT  # noqa: F401
from .feature_extractor import FeatureExtractor  # noqa: F401
from .tracker import MultiTracker  # noqa: F401
from .kalman import KalmanConfig, KalmanFilter, MeasType  # noqa: F401
from .flow import Flow  # noqa: F401
from .track import Track  # noqa: F401

__version__ = '0.1.0'
