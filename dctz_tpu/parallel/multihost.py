"""Multi-host (pod-slice) orchestration.

Single-controller sharding lives in parallel/sharding.py; this module adds
the multi-process glue for real pod slices, following the standard JAX
multi-host recipe:

  * every host calls `init()` (jax.distributed.initialize from the standard
    env vars or explicit coordinator address);
  * the global 1-D mesh spans all chips of all hosts; each host feeds its
    local block-aligned slice of the input (`host_slice`) via
    `jax.make_array_from_process_local_data`;
  * the device program is byte-identical to the single-host one —
    encode_sharded's `lax.pmax` collectives ride ICI within a slice and DCN
    across hosts (16 B for sf, 512 B for the QT table: negligible);
  * every host materializes ONLY its own shards' streams
    (`local_segments`), writes them as stream.py frames, and host 0 writes
    the stream header — no host ever gathers the full array.

This module is exercised on a single process in CI (n_hosts=1 degenerates
to the single-controller path); the multi-process paths follow the exact
jax.distributed API contract and are documented for pod deployment.
"""

from __future__ import annotations

import numpy as np

import jax

from ..config import CodecConfig
from . import sharding as sh


def init(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op when already initialized or when
    running single-process)."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    if coordinator_address is None and num_processes is None:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_slice(n_total: int, block_size: int = 64) -> tuple[int, int]:
    """[start, stop) of this host's contiguous block-aligned share of a
    flat array of n_total elements (zero-padding handled by the caller)."""
    nproc = jax.process_count()
    pid = jax.process_index()
    n_pad = sh.padded_size(n_total, jax.device_count(), block_size)
    per_host = n_pad // nproc
    assert per_host % block_size == 0
    return pid * per_host, min((pid + 1) * per_host, n_pad)


def global_input(local: np.ndarray, n_total: int, mesh) -> jax.Array:
    """Assemble the distributed global array from per-host local slices."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_pad = sh.padded_size(n_total, mesh.devices.size * jax.process_count()
                           if mesh.devices.ndim == 1 else mesh.devices.size,
                           64)
    sharding = NamedSharding(mesh, P(sh.AXIS))
    return jax.make_array_from_process_local_data(
        sharding, local, global_shape=(n_pad,)
    )


def compress_multihost(
    local: np.ndarray,
    n_total: int,
    error_bound: float = 1e-3,
    mode: str = "ec",
    *,
    config: CodecConfig | None = None,
):
    """Compress a distributed array; returns this host's stream segment
    bytes plus the (replicated) global header fields.

    Single-process runs degenerate to api.compress_sharded on the local
    data. Multi-process: the caller writes segments as stream.py frames
    (host 0 first), yielding a valid DTZS stream of the global array.
    """
    if jax.process_count() == 1:
        from ..api import compress_sharded

        return compress_sharded(local, error_bound, mode, config=config)

    # Multi-process path: global mesh over every chip in the slice.
    import dataclasses

    from ..api import compress_sharded

    cfg = config or CodecConfig(
        mode=mode, error_bound=error_bound, container="v2"
    )
    if cfg.container != "v2":
        cfg = dataclasses.replace(cfg, container="v2")
    mesh = sh.make_mesh()  # all global devices
    garr = global_input(np.asarray(local).reshape(-1), n_total, mesh)
    # encode_sharded operates on the global array; each host's device_get of
    # addressable shards yields only its local streams.
    return compress_sharded(garr, config=cfg, mesh=mesh)
