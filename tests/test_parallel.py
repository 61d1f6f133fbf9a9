"""Multi-device sharding tests (8-device CPU mesh; see conftest)."""
import numpy as np
import pytest

pytestmark = pytest.mark.multidevice


def test_dryrun_multichip():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parents[1]))
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_stream_mesh_sharding():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fastmot_tpu.parallel import MultiStreamPipeline, make_stream_mesh

    mesh = make_stream_mesh(model_parallel=2)
    assert mesh.shape == {'streams': 4, 'model': 2}

    def step(params, frames, state):
        out = jnp.einsum('sij,jk->sik', frames, params)
        return out.sum(axis=(1, 2)), state + 1

    params = jnp.eye(16)
    pipe = MultiStreamPipeline(mesh, step, params)
    frames = jnp.ones((8, 4, 16))
    state = jnp.zeros(8, jnp.int32)
    out, new_state = pipe.step(frames, state)
    np.testing.assert_allclose(np.asarray(out), 64.0)
    assert (np.asarray(new_state) == 1).all()
