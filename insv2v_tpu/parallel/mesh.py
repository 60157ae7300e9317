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
    "init_distributed",
    "make_mesh",
    "make_global_batch",
    "batch_sharding",
    "replicated",
    "shard_leaf_spec",
    "zero_sharded_like",
    "constrain_zero_sharding",
    "assert_zero_sharded",
]

DP_AXIS = "dp"


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Multi-host launcher — the TPU-native analogue of the reference's
    ``num_nodes=args.nnode`` Lightning plumbing (main.py:18-19,59).

    Call BEFORE any device use. With explicit args it wires an arbitrary
    process group (works for multi-process CPU testing with gloo
    collectives); with none it relies on jax's TPU-pod auto-detection.
    After this, ``jax.devices()`` is the global device list, so
    :func:`make_mesh` builds a dp axis spanning hosts and pjit emits
    cross-host collectives over ICI/DCN automatically.

    Returns True if a multi-process group was initialized.
    """
    if coordinator is None and num_processes is None:
        # TPU pod slice: everything comes from the metadata server
        jax.distributed.initialize()
        return jax.process_count() > 1
    if num_processes is not None and num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def make_global_batch(mesh: Mesh, batch: Any) -> Any:
    """Assemble a dp-sharded global batch from this process's local shard.

    Single-process: a plain ``device_put`` with the batch sharding.
    Multi-process: each host feeds its local slice of the global batch
    (``jax.make_array_from_process_local_data``), so the jitted step sees
    one global array without any host gathering the full batch.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        batch,
    )


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


def assert_zero_sharded(opt_state: Any, mesh: Mesh) -> tuple:
    """Assert the MATERIALIZED opt state is actually ZeRO-sharded.

    Checks every committed leaf whose policy spec says P('dp', ...)
    against its real ``.sharding`` — a silent replication regression
    (e.g. jit out_shardings dropped, or the constraint optimized away)
    would otherwise still produce finite losses and pass every dryrun
    (VERDICT r4 #7). Returns ``(n_dp_sharded, n_leaves)`` for logging;
    raises AssertionError if any dp-spec leaf is not dp-sharded or if
    NO leaf is dp-sharded at all (the policy must bite on at least the
    adam moments of the trainable motion params).
    """
    leaves = jax.tree_util.tree_leaves(opt_state)
    n_dp = 0
    for leaf in leaves:
        if not hasattr(leaf, "sharding") or not hasattr(leaf, "ndim"):
            continue
        spec = shard_leaf_spec(leaf, mesh)
        if not spec or spec[0] != DP_AXIS:
            continue
        want = NamedSharding(mesh, spec)
        assert leaf.sharding.is_equivalent_to(want, leaf.ndim), (
            f"opt-state leaf {leaf.shape} should be dp-sharded per policy "
            f"but is {leaf.sharding} (ZeRO regression)")
        n_dp += 1
    assert n_dp > 0, (
        "no opt-state leaf is dp-sharded — the ZeRO policy matched "
        "nothing (shapes too small for this mesh, or a regression)")
    return n_dp, len(leaves)
