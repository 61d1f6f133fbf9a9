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
    import hashlib as _hashlib
    import jax as _jax

    def _host_tag():
        # XLA:CPU AOT entries record the compile machine's features and
        # SIGSEGV/SIGILL when loaded on a host with different CPUID (the
        # cache key does not include them). Shared home dirs mean several
        # hosts share this cache, so qualify the dir by the host's CPU
        # feature set.
        try:
            with open('/proc/cpuinfo') as f:
                for line in f:
                    if line.startswith('flags'):
                        return _hashlib.sha1(
                            line.encode()).hexdigest()[:10]
        except OSError:
            pass
        import platform as _platform
        return _platform.node() or 'default'

    _cache_dir = _os.environ.get('FASTMOT_TPU_CACHE_DIR') or _os.path.join(
        _os.path.expanduser('~'), '.cache', 'fastmot_tpu_xla', _host_tag())
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
