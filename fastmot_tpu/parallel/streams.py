"""Multi-stream / multi-chip mesh utilities.

The reference is single-GPU (SURVEY.md section 2.3); its BASELINE config 5
("8x 1080p streams batched per chip") is the scaling story here. Streams
are embarrassingly parallel, so the natural mesh layout is:

  * ``streams`` axis — data parallelism: each chip (or chip group)
    processes a shard of the stream batch. No cross-chip collectives in
    the frame loop; shardings ride ICI only at the edges.
    ``MultiStreamMOT(..., mesh=make_stream_mesh(...))`` is the consumer.
  * ``model`` axis — tensor parallelism inside the detector / ReID
    networks for large models (e.g. YOLOv4-P6 at 1280x1280):
    ``conv_channel_shardings`` shards every conv/dense kernel's output
    channels (and the matching per-channel vectors) over the axis, and
    XLA's SPMD partitioner inserts the all-gathers/psums the conv chain
    needs. Exercised by ``__graft_entry__.dryrun_multichip`` and
    ``tests/test_parallel.py::test_conv_channel_tensor_parallelism``.
"""
from __future__ import annotations

import jax
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


def conv_channel_shardings(params, mesh: Mesh, axis: str = 'model'):
    """NamedSharding pytree for output-channel tensor parallelism.

    Every conv/dense ``kernel`` (ndim >= 2) whose output-channel (last)
    axis divides the mesh's ``axis`` size is sharded on that axis; the
    per-channel 1-D vectors that ride along (conv bias, BN scale/bias and
    running stats — all shaped ``[filters]``) shard the same way so each
    device holds exactly its channel slice of the whole layer. Everything
    else is replicated. Passing the result as ``jit in_shardings`` (or
    ``device_put``-ing params with it) is the whole TP story: XLA's SPMD
    partitioner propagates the channel sharding through the conv chain
    and inserts the collectives (scaling-book recipe — annotate, let XLA
    insert collectives).

    Replaces the reference's single-GPU assumption (SURVEY.md 2.3); use
    for models too big or too slow for one chip (YOLOv4-P6 at 1280^2).
    """
    k = mesh.shape[axis]

    def spec(path, leaf):
        shape = getattr(leaf, 'shape', ())
        names = [str(getattr(p, 'key', p)) for p in path]
        leafname = names[-1] if names else ''
        if leafname == 'kernel' and len(shape) >= 2 and shape[-1] % k == 0:
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + [axis])))
        if leafname in ('bias', 'scale', 'mean', 'var') \
                and len(shape) == 1 and shape[0] % k == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)
