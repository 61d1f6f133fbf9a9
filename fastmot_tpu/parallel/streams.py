"""Multi-stream scale-out over a TPU mesh.

The reference is single-GPU (SURVEY.md section 2.3); its BASELINE config 5
("8x 1080p streams batched per chip") is the scaling story here. Streams
are embarrassingly parallel, so the natural mesh layout is:

  * ``streams`` axis — data parallelism: each chip (or chip group)
    processes a shard of the stream batch. No cross-chip collectives in
    the frame loop; shardings ride ICI only at the edges.
  * ``model`` axis — optional tensor parallelism inside the detector /
    ReID networks for large models (e.g. YOLOv4-P6 at 1280x1280): conv
    channels and dense features are sharded and XLA inserts psum/
    all-gathers as needed.

``MultiStreamPipeline`` jits a per-frame step function over a
``jax.sharding.Mesh`` with NamedShardings on the leading stream axis; the
same code compiles for 1 chip (mesh of one) and a pod slice.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_stream_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """Build a (streams, model) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ('streams', 'model'))


class MultiStreamPipeline:
    """Shards a batched per-frame step over the stream axis of a mesh.

    ``step_fn(params, frames, state) -> (outputs, state)`` must be pure and
    accept a leading batch (stream) axis on ``frames`` and ``state``.
    """

    def __init__(self, mesh: Mesh, step_fn, params,
                 params_spec=P()):
        self.mesh = mesh
        self.step_fn = step_fn
        stream_sharding = NamedSharding(mesh, P('streams'))
        param_sharding = NamedSharding(mesh, params_spec)
        self.params = jax.device_put(params, param_sharding)
        self._jitted = jax.jit(
            step_fn,
            in_shardings=(param_sharding, stream_sharding, stream_sharding),
            out_shardings=(stream_sharding, stream_sharding),
        )

    def step(self, frames, state):
        """Run one synchronized step for all streams."""
        return self._jitted(self.params, frames, state)

    @property
    def num_streams_per_device(self):
        return self.mesh.shape['streams']
