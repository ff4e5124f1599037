"""Multi-host coordination for pan-genome runs.

The reference's multi-node story is Nextflow task scheduling over a shared
filesystem (`panHiTE.nf:94-129`, SURVEY.md §2.E).  The TPU-native
equivalent: every host runs the same program under `jax.distributed`
(`parallel.mesh.initialize_multihost`), whole genomes are partitioned
round-robin across hosts (they share no state), and the per-genome results
are exchanged with ONE collective — a byte-level all-gather over the DCN —
instead of files on disk.

All helpers degrade to no-ops in a single-process run, so the pan pipeline
is identical code either way.
"""

from __future__ import annotations

import pickle
from typing import Any, List, Sequence, TypeVar

import numpy as np

T = TypeVar("T")


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def partition(items: Sequence[T], pid: int | None = None,
              nproc: int | None = None) -> List[T]:
    """Round-robin slice of `items` owned by this process."""
    pid = process_index() if pid is None else pid
    nproc = process_count() if nproc is None else nproc
    return [x for i, x in enumerate(items) if i % nproc == pid]


def allgather_bytes(data: bytes) -> List[bytes]:
    """Gather one byte string from every process (order = process index).

    Two collectives: an all-gather of lengths, then an all-gather of the
    max-length-padded payloads (multihost_utils requires equal shapes).
    """
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return [data]
    n = np.asarray([len(data)], dtype=np.int64)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    pad = int(sizes.max())
    buf = np.zeros(pad, dtype=np.uint8)
    buf[: len(data)] = np.frombuffer(data, dtype=np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(jax.process_count(), pad)
    return [gathered[i, : sizes[i]].tobytes() for i in range(len(sizes))]


def allgather_obj(obj: Any) -> List[Any]:
    """All-gather an arbitrary picklable object from every process."""
    return [pickle.loads(b) for b in allgather_bytes(pickle.dumps(obj))]


def merge_dicts(dicts: Sequence[dict]) -> dict:
    """Merge per-process dicts (disjoint keys expected; later wins)."""
    out: dict = {}
    for d in dicts:
        out.update(d)
    return out
