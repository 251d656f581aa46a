"""Fleet runner: batched multi-track demixing, tracks sharded across
chips.

This is BASELINE.json config 5 ("batched full MUSDB18-HQ test set on
v5e-8, tracks sharded across chips") — pure data parallelism: each chip
runs the complete fused track program (engine/separator.demix_fused) on
its own tracks, no collectives in the hot path, so throughput scales
linearly over ICI-connected chips.

Tracks are bucketed by padded chunk count so each bucket is ONE fixed
shape → one XLA program, reused across buckets of the same size.
"""

from __future__ import annotations

import math
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from umx_tpu.config import EngineConfig
from umx_tpu.engine.memory import suggest_max_fleet_batch
from umx_tpu.engine.separator import (
    Separator,
    _demix_fused_impl,
    _demix_fused_parallel_impl,
    _device_cfg,
    _vmap_cfg,
)
from umx_tpu.models.umx import UMXParams, init_lstm_state

_batched_cache: dict = {}


def resolve_batched_width(
    cfg: EngineConfig, n_chunks: int, seg: int, stride: int, batch: int = 1
) -> int:
    """Chunk-group width the non-streaming batched program will run at.

    Must read ``cfg.segment.chunk_batch`` from the ORIGINAL config —
    :func:`_device_cfg` canonicalizes the field to 4 (it is carried as
    its own static argument, separator.py), so resolving after
    canonicalization would silently pin every batched program to width 4
    and never consult the planner's batch-aware cap
    (batch * width <= 16, the measured OOM bracket)."""
    cb = cfg.segment.chunk_batch
    if cb <= 0:  # auto: planner-picked width at this track batch
        from umx_tpu.engine.memory import suggest_chunk_batch

        sr = cfg.dsp.sample_rate
        track_secs = ((n_chunks - 1) * stride + seg) / sr
        cb = suggest_chunk_batch(cfg, track_secs, batch=max(1, batch))
    return min(cb, n_chunks)


def _batched_demix(
    cfg: EngineConfig, n_chunks: int, seg: int, stride: int, batch: int = 1
):
    """One jitted program demixing B stacked tracks: (params, (B,2,P)
    audio, B-stacked states) -> ((B,T#,2,P) stems, B-stacked states).

    Streaming configs vmap the fused scan (state carried chunk->chunk
    per track).  Non-streaming configs vmap the chunk-group PARALLEL
    program instead: with no cross-chunk carry, B tracks x width chunks
    fold into one batch-native BLSTM kernel call (B x width matmul
    rows), reaching the per-segment batch regime on honest whole tracks
    — the scan form would leave each track's chunks serial.  Width is
    the planner's batch-aware pick (engine/memory.suggest_chunk_batch),
    resolved from the pre-canonicalization config (see
    :func:`resolve_batched_width`); the LSTM state passes through
    untouched (nothing carries).
    """
    cb = 0
    if not cfg.segment.streaming:
        cb = resolve_batched_width(cfg, n_chunks, seg, stride, batch=batch)
    cfg = _device_cfg(cfg)  # host-only fields must not key compilations
    key = (cfg, n_chunks, seg, stride, max(1, batch), cb)
    if key not in _batched_cache:
        if cfg.segment.streaming:
            def one(params, audio_p, state):
                return _demix_fused_impl(
                    params, audio_p, state, cfg, n_chunks, seg, stride
                )
        else:
            def one(params, audio_p, state, cb=cb):
                out = _demix_fused_parallel_impl(
                    params, audio_p, cfg, n_chunks, seg, stride, cb
                )
                return out, state

        _batched_cache[key] = jax.jit(jax.vmap(one, in_axes=(None, 0, 0)))
    return _batched_cache[key]


def demix_tracks(
    params: UMXParams,
    tracks: list[np.ndarray],
    cfg: EngineConfig = EngineConfig(),
    mesh: Mesh | None = None,
    seeds: list[int] | None = None,
    stats: dict | None = None,
) -> list[np.ndarray]:
    """Demix many tracks, data-parallel over the mesh's dp axis.

    tracks: list of (2, n_i) float32 arrays (lengths may differ).
    Returns a list of (n_targets, 2, n_i) arrays in input order.

    stats: optional dict that accumulates per-dispatch phase walls —
    ``upload_s`` (host->device input transfer), ``compute_s`` (device
    program), ``download_s`` (device->host stems), ``dispatches``,
    ``rows`` (total track rows dispatched), ``windowed_tracks`` (tracks
    beyond the single-program window, demixed per-track through the
    windowed-fused path).  Each phase is closed with a
    scalar device fetch (`block_until_ready` is not a barrier on the
    axon backend), which adds one tiny round-trip per phase — leave
    stats=None on latency-critical paths.
    """
    sr = cfg.dsp.sample_rate
    seg = cfg.segment.segment_samples(sr)
    stride = cfg.segment.stride_samples(sr)
    max_shift = cfg.segment.max_shift_samples(sr)
    dp = 1
    if mesh is not None:
        dp = mesh.shape.get("dp", 1)

    if seeds is None:
        # match Separator.demix_track's default (seed=0 per track) so
        # fleet and per-track results are identical out of the box
        seeds = [0] * len(tracks)

    # per-track offset sequences drawn exactly like Separator.demix_track
    # (sequential draws from one per-track PRNG), so fleet results equal
    # per-track results for any shift count
    n_passes = max(1, cfg.shifts)
    track_offsets = []
    for seed in seeds:
        rng = np.random.default_rng(seed)
        if cfg.shifts > 0:
            track_offsets.append(
                [int(rng.integers(0, max_shift)) for _ in range(n_passes)]
            )
        else:
            track_offsets.append([0] * n_passes)

    # place params once, outside the pass/bucket loops (a full UMX-L
    # tree is ~450 MB; re-transferring per bucket costs real seconds)
    if mesh is not None:
        params_r = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), params
        )
    else:
        params_r = params

    results: list[np.ndarray | None] = [None] * len(tracks)

    # Tracks beyond the single-program window take the PER-TRACK path:
    # Separator.demix_track chains W-chunk windowed-fused programs
    # (separator._demix_windowed_impl), so a bucket never dispatches a
    # program the HBM planner says cannot run steady-state (the
    # 60-minute single program is a measured RESOURCE_EXHAUSTED,
    # PERF.md).  Same seed -> same shift offsets, so the result is
    # bit-identical to what the bucket path would have produced (the
    # fleet == per-track equality contract, tests/test_fleet.py), and
    # windowed == single-program is separately asserted
    # (tests/test_windowed.py).  Mirrors Separator.demix's windowing
    # condition: scan streaming or non-streaming only (the groups /
    # pipelined A/B arms keep their single-program shapes).
    long_set: set[int] = set()
    if cfg.stream_impl == "scan" or not cfg.segment.streaming:
        win_limit = cfg.segment.window_chunks
        if win_limit == 0:  # auto: the planner's single-program ceiling
            from umx_tpu.engine.memory import suggest_window_chunks

            win_limit = suggest_window_chunks(cfg, params=params)
        if win_limit > 0:
            shift_pad = max_shift if cfg.shifts > 0 else 0
            for i, t in enumerate(tracks):
                n_worst = max(
                    1, math.ceil((np.asarray(t).shape[1] + shift_pad) / stride)
                )
                if n_worst > win_limit:
                    long_set.add(i)
    if long_set:
        sep = Separator(params, cfg)
        for i in sorted(long_set):
            results[i] = np.asarray(
                sep.demix_track(np.asarray(tracks[i], np.float32), seed=seeds[i])
            )
            if stats is not None:
                stats["windowed_tracks"] = stats.get("windowed_tracks", 0) + 1

    for p in range(n_passes):
        # host-side shift padding (the Demucs shift trick, umx.cpp:99-150),
        # then bucket by chunk count so each bucket is one compiled shape
        prepared = []
        for i, track in enumerate(tracks):
            if i in long_set:
                continue  # already demixed through the windowed path
            track = np.asarray(track, np.float32)
            length = track.shape[1]
            offset = track_offsets[i][p]
            if cfg.shifts > 0:
                track = np.pad(track, ((0, 0), (offset, max_shift - offset)))
            shifted_len = track.shape[1]
            n_chunks = max(1, math.ceil(shifted_len / stride))
            padded_len = (n_chunks - 1) * stride + seg
            track = np.pad(track, ((0, 0), (0, padded_len - shifted_len)))
            prepared.append((i, offset, length, n_chunks, track))

        buckets: dict[int, list] = defaultdict(list)
        for item in prepared:
            buckets[item[3]].append(item)

        for n_chunks, items in sorted(buckets.items()):
            # split oversized buckets into planner-bounded sub-batches:
            # an unbounded bucket of same-length tracks would dispatch
            # batch x width segment rows in one program and
            # RESOURCE_EXHAUST (the measured bracket is 16 total rows /
            # B=6 whole 420 s tracks on a v5e)
            track_secs = ((n_chunks - 1) * stride + seg) / sr
            per_dev = suggest_max_fleet_batch(cfg, track_secs, params=params)
            cap = max(dp, per_dev * dp)
            for s0 in range(0, len(items), cap):
                sub = items[s0 : s0 + cap]
                # pad the batch to a multiple of dp with silent tracks
                batch = [it[4] for it in sub]
                while len(batch) % dp:
                    batch.append(np.zeros_like(batch[0]))
                # batched instances fold into kernel matmul rows
                # (lstm_pallas custom_vmap)
                fn = _batched_demix(
                    _vmap_cfg(cfg, len(batch)), n_chunks, seg, stride,
                    batch=len(batch),
                )
                t0 = time.perf_counter()
                audio_b = jnp.asarray(np.stack(batch))
                st = init_lstm_state(cfg.model)
                states = jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (len(batch), *x.shape)), st
                )
                if mesh is not None:
                    sh = NamedSharding(mesh, P("dp"))
                    audio_b = jax.device_put(audio_b, sh)
                    states = jax.tree.map(lambda x: jax.device_put(x, sh), states)
                if stats is not None:
                    _ = float(jnp.sum(audio_b[:, :, 0]))  # upload barrier
                    t1 = time.perf_counter()
                out_b, _ = fn(params_r, audio_b, states)
                if stats is not None:
                    _ = float(jnp.sum(out_b[..., 0]))  # compute barrier
                    t2 = time.perf_counter()
                out_b = np.asarray(out_b)
                if stats is not None:
                    t3 = time.perf_counter()
                    stats["upload_s"] = stats.get("upload_s", 0.0) + (t1 - t0)
                    stats["compute_s"] = stats.get("compute_s", 0.0) + (t2 - t1)
                    stats["download_s"] = stats.get("download_s", 0.0) + (t3 - t2)
                    stats["dispatches"] = stats.get("dispatches", 0) + 1
                    stats["rows"] = stats.get("rows", 0) + len(batch)
                for (idx, offset, length, _, _), out in zip(sub, out_b):
                    contrib = out[..., offset : offset + length] / n_passes
                    results[idx] = (
                        contrib if results[idx] is None else results[idx] + contrib
                    )
    return results  # type: ignore[return-value]
