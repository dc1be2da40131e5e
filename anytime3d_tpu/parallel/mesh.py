"""Device mesh and sharding utilities (TPU-native replacement for the
reference's tf.distribute.MirroredStrategy, src/module/AE3D.py:36-42).

Design: one global Mesh('data', 'model'). Data parallelism shards the batch
over 'data'; tensor parallelism shards the channel-heavy kernels (decoder
dense + deconv stacks, head 1x1 projections) over 'model'. With jit +
NamedSharding, XLA chooses and schedules the collectives (psum for grad sync,
all-gather where a TP kernel's activations rejoin) — riding ICI, never DCN,
when the mesh is laid out with 'model' innermost (mesh_utils default).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build Mesh(('data', 'model')). Defaults: all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = mesh_utils.create_device_mesh((data, model), devices=np.asarray(devices))
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the batch axis sharded on 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


# --------------------------------------------------------------------- TP rules

# (path regex, spec) — first match wins. Only the channel-heavy kernels are
# sharded; everything else replicates. Dense kernels are (in, out); conv
# kernels are (k, k, [k,] in, out) — shard the output-channel dim.
DEFAULT_RULES: tuple[tuple[str, P], ...] = (
    (r"decoder/DenseBlock_0/Dense_0/kernel", P(None, "model")),
    (r"decoder/.*Deconv.*/ConvTranspose_0/kernel", P(None, None, None, None, "model")),
    (r"head/.*Conv.*/kernel", P(None, None, None, "model")),
)


def param_sharding_rules(params, mesh: Mesh, rules=DEFAULT_RULES):
    """Pytree of NamedShardings for ``params``: TP rules where they match and
    the leaf rank fits, replicated otherwise."""

    def spec_for(path, leaf):
        path_str = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        for pattern, spec in rules:
            if re.search(pattern, path_str) and len(spec) == leaf.ndim:
                # only shard when the dim divides evenly
                axis = [a for a in spec if a is not None]
                if axis:
                    dim = spec.index(axis[0])
                    if leaf.shape[dim] % mesh.shape["model"] == 0:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, rules=DEFAULT_RULES):
    shardings = param_sharding_rules(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
