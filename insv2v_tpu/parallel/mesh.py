"""Device mesh + sharding policy for data-parallel training.

The TPU-native replacement for the reference's NCCL-backed DDP /
DeepSpeed-ZeRO-2 stack (main.py:57, configs/instruct_v2v.yaml:9-10,
SURVEY.md §5.8): a 1-D ``jax.sharding.Mesh`` over the slice with the
batch axis sharded on ``dp``; gradient all-reduce and metric reductions
are emitted by XLA from the shardings (no hand-written collectives), and
optimizer state is sharded ZeRO-2-style along ``dp`` via
``with_sharding_constraint`` on every leaf whose leading axis divides.

Frozen submodels (VAE, CLIP) and the frozen bulk of the UNet stay
replicated — only the trainable motion-module adam state is worth
sharding (mirroring that only ~motion params train,
pl_trainer/instruct_p2p_video.py:235-246).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_leaf_spec",
    "zero_sharded_like",
    "constrain_zero_sharding",
]

DP_AXIS = "dp"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DP_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leaf_spec(leaf: Any, mesh: Mesh) -> P:
    """ZeRO-style spec: shard the leading axis across dp when divisible."""
    shape = getattr(leaf, "shape", ())
    ndp = mesh.shape[DP_AXIS]
    if len(shape) > 0 and shape[0] % ndp == 0 and shape[0] >= ndp:
        return P(DP_AXIS, *([None] * (len(shape) - 1)))
    return P()


def zero_sharded_like(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree mirroring ``tree`` with ZeRO leaf specs."""
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, shard_leaf_spec(leaf, mesh)), tree
    )


def constrain_zero_sharding(tree: Any, mesh: Mesh) -> Any:
    """Apply ZeRO sharding constraints inside a jitted computation."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, shard_leaf_spec(leaf, mesh))
        ),
        tree,
    )
