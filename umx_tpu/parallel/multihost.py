"""Multi-host (DCN) input distribution for fleet runs.

The reference is a single-process binary (SURVEY §2d); this module is
the scale-out story past one host.  Design follows the demix workload's
communication structure: a track's forward pass needs NO cross-chip
collectives at all, so the only multi-host problem is *input
distribution* — hand each host its own slice of the track list and let
every host run the ordinary data-parallel fleet (engine/fleet.py) over
its LOCAL chips and ICI.  DCN carries nothing but the initial work
split and the final metric gather; audio samples never cross hosts.

Topology:

    host 0: tracks 0, H, 2H, ...  -> local (dp, tp) mesh over its chips
    host 1: tracks 1, H+1, ...    -> local mesh
    ...                                (H = process count)

Every function degrades gracefully to single-process (process_count==1)
so the same code path runs everywhere; unit tests exercise the
partitioning with explicit process ids.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from umx_tpu.config import EngineConfig


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed for a multi-host run.

    Call once per process before any other jax use, with either explicit
    arguments or cluster-environment auto-detection (the no-argument
    form works on TPU pods / GKE).  Returns True when a multi-process
    runtime is active after the call; safely degrades to False for
    single-process runs so callers need no branching.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process run (no coordinator/cluster env), or already
        # initialized — both leave jax.process_count() authoritative
        pass
    return jax.process_count() > 1


def partition_tracks(
    n_tracks: int, process_id: int | None = None, process_count: int | None = None
) -> list[int]:
    """Global track indices owned by this process: round-robin
    ``[pid, pid+P, pid+2P, ...]`` — balanced to within one track and
    independent of track lengths being known up front."""
    pid = jax.process_index() if process_id is None else process_id
    num = jax.process_count() if process_count is None else process_count
    if not 0 <= pid < num:
        raise ValueError(f"process_id {pid} out of range for {num} processes")
    return list(range(pid, n_tracks, num))


@dataclass
class MultihostFleetResult:
    """Local results plus the bookkeeping to reassemble globally."""

    # global index -> (n_targets, 2, n_i) stems, for THIS host's tracks
    local: dict[int, np.ndarray]
    process_id: int
    process_count: int

    def owned_indices(self) -> list[int]:
        return sorted(self.local)


def demix_tracks_multihost(
    params,
    tracks: list[np.ndarray],
    cfg: EngineConfig = EngineConfig(),
    mesh=None,
    seeds: list[int] | None = None,
    process_id: int | None = None,
    process_count: int | None = None,
) -> MultihostFleetResult:
    """Fleet demix with per-host track queues (DCN-free hot path).

    ``tracks`` is the GLOBAL track list, identical on every host (only
    metadata-cheap: arrays may be lazily loaded by the caller per owned
    index — pass loader callables to defer I/O).  Each host demixes its
    round-robin slice over a mesh of its local devices and returns its
    local results; nothing is transferred across hosts.

    ``mesh`` defaults to a dp-only mesh over ``jax.local_devices()``.
    """
    from umx_tpu.engine.fleet import demix_tracks
    from umx_tpu.parallel.mesh import make_mesh

    pid = jax.process_index() if process_id is None else process_id
    num = jax.process_count() if process_count is None else process_count
    owned = partition_tracks(len(tracks), pid, num)

    local_tracks = []
    for i in owned:
        t = tracks[i]
        t = t() if callable(t) else t  # lazy loader support
        local_tracks.append(np.asarray(t, np.float32))

    if mesh is None and len(jax.local_devices()) > 1:
        mesh = make_mesh(devices=jax.local_devices())

    local_seeds = [seeds[i] for i in owned] if seeds is not None else None
    outs = demix_tracks(params, local_tracks, cfg, mesh=mesh, seeds=local_seeds)
    return MultihostFleetResult(
        local=dict(zip(owned, outs)), process_id=pid, process_count=num
    )


def allgather_metrics(values: dict[int, float]) -> dict[int, float]:
    """Combine per-track scalar metrics (e.g. SDR) across hosts into the
    full global dict on EVERY host — the one place DCN is used, and it
    moves a few floats per track.

    Single-process: identity.  Multi-process: jax.experimental
    multihost_utils.process_allgather over a dense (n, 2) table.
    """
    if jax.process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils

    table = np.asarray(
        [[float(k), float(v)] for k, v in sorted(values.items())], np.float64
    ).reshape(-1, 2)
    # ragged per-host counts: pad to the max count, mark pads with k=-1
    counts = multihost_utils.process_allgather(np.asarray([len(table)]))
    m = int(np.max(counts))
    padded = np.full((m, 2), -1.0, np.float64)
    padded[: len(table)] = table
    gathered = multihost_utils.process_allgather(padded)  # (P, m, 2)
    out: dict[int, float] = {}
    for row in gathered.reshape(-1, 2):
        if row[0] >= 0:
            out[int(row[0])] = float(row[1])
    return out
