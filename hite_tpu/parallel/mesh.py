"""Device mesh + sharding helpers.

Replaces the reference's process/Nextflow parallelism (SURVEY.md §2.E) with
a `jax.sharding.Mesh`: genome chunks ride the data axis ('dp'), intra-chunk
sequence blocks the sequence axis ('sp'), and classifier tensor parallelism
the model axis ('tp').  All collectives are XLA-inserted via NamedSharding
constraints — no explicit NCCL/MPI equivalent exists or is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factor_devices(n: int) -> Tuple[int, int]:
    """Split n devices into (dp, tp): largest dp with tp in {1, 2, 4}."""
    for tp in (4, 2, 1):
        if n % tp == 0 and n // tp >= 1:
            return n // tp, tp
    return n, 1


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if dp is None or tp is None:
        dp, tp = factor_devices(n)
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def param_sharding(mesh: Mesh, params, min_shard: int = 2):
    """NamedSharding tree: shard each leaf's last axis over 'tp' when
    divisible (column-parallel dense/conv channels), else replicate."""
    tp = mesh.shape["tp"]

    def rule(leaf):
        if (
            hasattr(leaf, "ndim") and leaf.ndim >= 1 and tp > 1
            and leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= min_shard * tp
        ):
            spec = [None] * (leaf.ndim - 1) + ["tp"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def batch_sharding(mesh: Mesh):
    """Shard the leading (batch) axis over 'dp'."""

    def rule(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return NamedSharding(mesh, P("dp"))
        return NamedSharding(mesh, P())

    return rule


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize the multi-host JAX runtime (replaces Nextflow executors).

    On a multi-host TPU slice each host calls this once before building
    meshes; `jax.devices()` then spans the slice and the same GSPMD
    shardings ride ICI within a slice and DCN across slices.  Pan-genome
    runs assign whole genomes per host (they share no state), single-genome
    runs shard the pair grid over all hosts' devices.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs.update(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
