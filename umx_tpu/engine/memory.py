"""HBM capacity planning for batched demixing programs.

The batched fused-track program (engine/fleet.py's bucket call) and the
batched per-segment program (serving batcher / segment pipelines) are
the single-chip throughput shapes, but their footprints grow with
batch x track-length and a v5e chip has ~15.75 GB of usable HBM:
B=8 x 420 s fused tracks and B=32 x 60 s segments were both measured to
RESOURCE_EXHAUST while B=4 / B=16 fit.  This module gives a
first-principles liveness estimate of peak HBM so callers (fleet
bucketing, serving admission, bench configs) can pick a feasible batch
instead of discovering OOM at compile time.

The fused-track estimate models the scan→overlap-add BOUNDARY, the
measured high-water point under the shipping unrolled OLA: the complete
stacked weighted chunk outputs (at their configured storage dtype —
``EngineConfig.stems_stack_dtype``), the f32 overlap-add accumulator
(== the stems), the padded audio, and one batch-row set of segment
transients (Wiener y planes, spectrogram planes, masks) are live
together.  Round-4 calibration facts on a v5e (420 s UMX-L tracks):
B=4 and B=6 fit in BOTH stack dtypes, B=8 RESOURCE_EXHAUSTs in both
(f32 allocator request measured 21.0 GB); the model must keep every
measured fit inside the physical budget and every measured OOM outside
it.

Parameter bytes are DERIVED from the model config (dtype- and
quantization-aware, validated against the measured 530 MB UMX-L
resident set) — or measured exactly from a params pytree when given.
Device capacity is read from ``memory_stats()`` when the backend
exposes it, falling back to the v5e constant.  Estimates are
deliberately coarse (~±25%, with a fitted slack factor on the transient
share); keep a safety margin.
"""

from __future__ import annotations

import math

from umx_tpu.config import EngineConfig

V5E_HBM_BYTES = int(15.75 * 2**30)  # usable HBM per chip (16G - reserved)
# Fitted slack on the per-segment transient share in the fused-track
# boundary model: the unique factor that brackets all six round-4
# measured points (B=4/6 fit, B=8 OOM, x f32/bf16 stacks) with margin.
_TRANSIENT_FACTOR = 1.35
# Engine-resident overhead over raw f32 leaf bytes (bf16 kernel weight
# copies, dequant scale tables, allocator rounding): 530 MB measured for
# UMX-L whose raw leaves sum to ~452 MB.
_PARAMS_OVERHEAD = 1.17


def device_hbm_bytes(default: int = V5E_HBM_BYTES) -> int:
    """Usable HBM of the local accelerator, queried from the runtime
    when the backend exposes ``memory_stats()['bytes_limit']`` (ADVICE
    r2: don't hardcode v5e capacity on other devices)."""
    try:
        import jax

        dev = jax.local_devices()[0]
        stats = dev.memory_stats() if hasattr(dev, "memory_stats") else None
        limit = (stats or {}).get("bytes_limit")
        if limit and limit > 2**30:  # ignore CPU/mock backends' tiny/absent limits
            return int(limit)
    except Exception:  # noqa: BLE001 — planning must never fail on a query
        pass
    return default


def params_hbm_bytes(
    cfg: EngineConfig, quantized: bool = False, params=None
) -> int:
    """HBM bytes of the resident weight tree.

    With ``params`` given: exact sum over the pytree's leaves.  Otherwise
    derived from the ModelConfig shape arithmetic (model.cpp:140-186
    layout): per target fc1 (nf,H), 3 bidir LSTM layers ih (H,4G) +
    hh (G,4G) + biases, fc2 (2H,H), fc3 (H,no), 4 batchnorm vectors per
    bn, input/output mean+scale.  ``quantized`` models the
    quantized-HBM mode (u8 weights, u16 for fc2/fc3 — ops/qmatmul.py).
    """
    if params is not None:
        import jax

        return int(
            sum(
                x.size * x.dtype.itemsize
                for x in jax.tree.leaves(params)
                if hasattr(x, "size")
            )
            * _PARAMS_OVERHEAD
        )
    m = cfg.model
    h, g, s = m.hidden_size, m.lstm_hidden, m.n_targets
    nf, no = m.n_features, m.n_outputs
    mat_u8 = nf * h + 6 * (h * 4 * g + g * 4 * g)  # fc1 + 3x2 LSTM ih/hh
    mat_u16 = 2 * h * h + h * no  # fc2 + fc3
    vec = (
        4 * h + 4 * h + 4 * no  # bn1, bn2, bn3 (w, b, mean, var)
        + 2 * nf + 2 * no       # input/output mean+scale
        + 6 * 2 * 4 * g         # LSTM b_ih + b_hh per direction-layer
    )
    if quantized:
        per_target = 1 * mat_u8 + 2 * mat_u16 + 4 * vec
    else:
        per_target = 4 * (mat_u8 + mat_u16 + vec)
    return int(s * per_target * _PARAMS_OVERHEAD)


def _stems_itemsize(cfg: EngineConfig) -> int:
    """Bytes/sample of the fused-track stacked chunk stems
    (``EngineConfig.stems_stack_dtype``; "auto" = bf16 on accelerators,
    mirroring ``separator._resolve_stems_stack_dtype`` without importing
    the engine)."""
    choice = getattr(cfg, "stems_stack_dtype", "auto")
    if choice == "auto":
        try:
            import jax

            return 2 if jax.default_backend() not in ("cpu",) else 4
        except Exception:  # noqa: BLE001 — planning must never fail
            return 4
    return 2 if choice == "bfloat16" else 4


def _segment_transient_bytes(cfg: EngineConfig) -> int:
    """Bytes of one segment's in-flight pipeline tensors (per batch row):
    Wiener y planes + masks + mix spectrogram planes + a partial-liveness
    share of the framed iDFT output (XLA reuses the rest).  Calibrated
    against the measured per-segment batch curve endpoint: B=32 x 60 s
    estimated 21.0 GB by the allocator (PERF.md) => ~0.65 GB/row."""
    s = cfg.model.n_targets
    t = cfg.dsp.n_frames(cfg.segment.segment_samples(cfg.dsp.sample_rate))
    f = cfg.dsp.n_bins
    f4 = 4
    y_planes = 2 * s * 2 * t * f * f4
    mix_planes = 2 * 2 * t * f * f4
    masks = s * t * 2 * f * f4
    frames_share = (s * 2 * t * cfg.dsp.n_fft * f4) // 4
    return y_planes + mix_planes + masks + frames_share


def fused_track_hbm_bytes(
    cfg: EngineConfig,
    batch: int,
    track_secs: float,
    quantized: bool = False,
    params=None,
) -> dict[str, int]:
    """Estimated peak HBM of the batched fused-track program.

    Returns the individual liveness terms (bytes) plus ``total``.
    """
    sr = cfg.dsp.sample_rate
    seg = cfg.segment.segment_samples(sr)
    stride = cfg.segment.stride_samples(sr)
    length = int(track_secs * sr)
    n_chunks = max(1, math.ceil(length / stride))
    padded = (n_chunks - 1) * stride + seg
    s = cfg.model.n_targets
    b = batch
    f4 = 4  # float32

    ys = b * s * 2 * n_chunks * seg * _stems_itemsize(cfg)  # stacked chunks
    ola = 2 * b * s * 2 * n_chunks * stride * f4  # pad+sum combine grids
    stems = b * s * 2 * padded * f4  # f32 OLA accumulator == output
    audio = b * 2 * padded * f4
    seg_transients = b * _segment_transient_bytes(cfg)
    params_b = params_hbm_bytes(cfg, quantized=quantized, params=params)

    # scan→OLA boundary liveness (the measured high-water point under
    # the shipping unrolled OLA — the pad+sum combine grids exist only
    # under ola_impl="xla")
    scan_phase = ys + audio + seg_transients
    boundary = ys + stems + audio + int(seg_transients * _TRANSIENT_FACTOR)
    ola_phase = ys + ola + stems
    peak = max(scan_phase, boundary)
    if getattr(cfg, "ola_impl", "auto") == "xla":
        peak = max(peak, ola_phase)
    total = int(peak) + params_b
    return {
        "ys": ys,
        "ola": ola,
        "stems": stems,
        "audio": audio,
        "seg_transients": seg_transients,
        "params": params_b,
        "scan_phase": scan_phase,
        "boundary": boundary,
        "ola_phase": ola_phase,
        "total": total,
    }


def segment_batch_hbm_bytes(
    cfg: EngineConfig, batch: int, quantized: bool = False, params=None
) -> dict[str, int]:
    """Estimated peak HBM of a B-wide vmapped per-segment program (the
    serving batcher / per-segment pipeline shape).

    Per-row liveness = Wiener y planes + masks + mix planes + audio/stem
    I/O, with NO tiling layout factor ((T, F) tensors tile cleanly and
    XLA reuses the framed-iDFT buffers) — calibrated against the
    allocator's measured 21.0 GiB request at B=32 x 60 s UMX-L
    (~0.64 GiB/row, PERF.md batch-curve endpoint)."""
    sr = cfg.dsp.sample_rate
    seg = cfg.segment.segment_samples(sr)
    s = cfg.model.n_targets
    t = cfg.dsp.n_frames(seg)
    f = cfg.dsp.n_bins
    f4 = 4
    y_planes = 2 * s * 2 * t * f * f4
    mix_planes = 2 * 2 * t * f * f4
    masks = s * t * 2 * f * f4
    transients = batch * (y_planes + mix_planes + masks)
    io = batch * (2 + s * 2) * seg * f4  # audio in + waves out
    params_b = params_hbm_bytes(cfg, quantized=quantized, params=params)
    total = transients + io + params_b
    return {
        "transients": transients,
        "io": io,
        "params": params_b,
        "total": total,
    }


def _suggest(estimate, budget: float, hard_cap: int = 1024) -> int:
    """Largest b in [1, hard_cap] with estimate(b) <= budget (estimate is
    monotonic in b; always >= 1).  Exponential probe + bisection — the
    window planner runs per demix() call with caps up to 4096, where a
    linear +1 walk (each step re-summing the params pytree) costs real
    host milliseconds."""
    if hard_cap <= 1 or estimate(2) > budget:
        return 1
    lo = 2  # known to fit
    hi = 4
    while hi <= hard_cap and estimate(hi) <= budget:
        lo, hi = hi, hi * 2
    hi = min(hi, hard_cap + 1)  # estimate(hi) > budget (or past the cap)
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if estimate(mid) <= budget:
            lo = mid
        else:
            hi = mid
    return lo


def suggest_max_batch(
    cfg: EngineConfig,
    track_secs: float,
    hbm_bytes: int | None = None,
    safety: float = 0.9,
    quantized: bool = False,
    params=None,
) -> int:
    """Largest batch of ``track_secs`` tracks whose estimated fused-track
    footprint fits in ``safety * hbm_bytes``.  Always >= 1 (a single
    track is the baseline configuration; if even that estimate exceeds
    the budget the caller should shorten segments instead)."""
    budget = (device_hbm_bytes() if hbm_bytes is None else hbm_bytes) * safety
    return _suggest(
        lambda b: fused_track_hbm_bytes(
            cfg, b, track_secs, quantized=quantized, params=params
        )["total"],
        budget,
    )


def parallel_track_hbm_bytes(
    cfg: EngineConfig,
    chunk_batch: int,
    track_secs: float,
    quantized: bool = False,
    params=None,
    batch: int = 1,
) -> dict[str, int]:
    """Estimated peak HBM of the NON-STREAMING fused-track program at a
    given segment-group width (``demix_fused_parallel``): the track-level
    buffers (stacked weighted chunks, overlap-add combine, stems, audio)
    plus ``chunk_batch`` segments' pipeline transients in flight.

    ``batch`` models the fleet/bench shape of B whole tracks vmapped
    through one program (``fleet._batched_demix`` non-streaming): every
    track-level buffer gains a leading B axis and each group has
    B x width segment rows in flight."""
    sr = cfg.dsp.sample_rate
    seg = cfg.segment.segment_samples(sr)
    stride = cfg.segment.stride_samples(sr)
    length = int(track_secs * sr)
    n_chunks = max(1, math.ceil(length / stride))
    padded = (n_chunks - 1) * stride + seg
    s = cfg.model.n_targets
    f4 = 4
    b = max(1, batch)

    ys = b * s * 2 * n_chunks * seg * _stems_itemsize(cfg)
    ola = b * 2 * s * 2 * n_chunks * stride * f4
    stems = b * s * 2 * padded * f4
    audio = b * 2 * padded * f4
    width = min(chunk_batch, n_chunks)
    seg_transients = b * width * _segment_transient_bytes(cfg)
    params_b = params_hbm_bytes(cfg, quantized=quantized, params=params)

    # group→OLA boundary liveness, mirroring fused_track_hbm_bytes (the
    # pad+sum combine grids exist only under ola_impl="xla")
    group_phase = ys + audio + seg_transients
    boundary = ys + stems + audio + int(seg_transients * _TRANSIENT_FACTOR)
    ola_phase = ys + ola + stems
    peak = max(group_phase, boundary)
    if getattr(cfg, "ola_impl", "auto") == "xla":
        peak = max(peak, ola_phase)
    total = int(peak) + params_b
    return {
        "ys": ys,
        "ola": ola,
        "stems": stems,
        "audio": audio,
        "seg_transients": seg_transients,
        "params": params_b,
        "group_phase": group_phase,
        "boundary": boundary,
        "ola_phase": ola_phase,
        "total": total,
    }


def suggest_chunk_batch(
    cfg: EngineConfig,
    track_secs: float,
    hbm_bytes: int | None = None,
    safety: float = 0.9,
    quantized: bool = False,
    params=None,
    batch: int = 1,
) -> int:
    """Largest non-streaming fused-group width whose estimated footprint
    fits (``SegmentConfig.chunk_batch == 0`` auto mode).  Wider groups
    are monotonically faster — the batch-native BLSTM kernel folds group
    rows, amortizing the recurrence's width-independent latency floor
    (420 s track: 4 = 1251x, 16 = 1574x, PERF.md) — so the only bound is
    memory.  Capped so TOTAL rows (batch x width) stay at 16, the
    measured-safe per-segment batch endpoint (the 60 s batch curve ends
    in (16 fits, 32 OOMs) and the fold's win saturates past 16)."""
    budget = (device_hbm_bytes() if hbm_bytes is None else hbm_bytes) * safety
    return _suggest(
        lambda w: parallel_track_hbm_bytes(
            cfg, w, track_secs, quantized=quantized, params=params, batch=batch
        )["total"],
        budget,
        hard_cap=max(1, 16 // max(1, batch)),
    )


def suggest_max_fleet_batch(
    cfg: EngineConfig,
    track_secs: float,
    hbm_bytes: int | None = None,
    safety: float = 0.9,
    quantized: bool = False,
    params=None,
) -> int:
    """Largest per-device batch of whole ``track_secs`` tracks for one
    fleet bucket call (``fleet.demix_tracks``).  Streaming buckets vmap
    the fused scan (bounded by :func:`suggest_max_batch`); non-streaming
    buckets vmap the chunk-group parallel program, whose width the
    builder re-resolves per batch — so the estimate evaluates each
    candidate batch at the width it would actually run
    (``resolve_batched_width`` semantics: explicit ``chunk_batch`` or
    the batch-aware auto pick)."""
    if cfg.segment.streaming:
        return suggest_max_batch(
            cfg, track_secs, hbm_bytes=hbm_bytes, safety=safety,
            quantized=quantized, params=params,
        )
    budget = (device_hbm_bytes() if hbm_bytes is None else hbm_bytes) * safety

    def est(b: int) -> int:
        w = cfg.segment.chunk_batch
        if w <= 0:
            w = suggest_chunk_batch(
                cfg, track_secs, hbm_bytes=hbm_bytes, safety=safety,
                quantized=quantized, params=params, batch=b,
            )
        return parallel_track_hbm_bytes(
            cfg, w, track_secs, quantized=quantized, params=params, batch=b
        )["total"]

    return _suggest(est, budget)


def suggest_window_chunks(
    cfg: EngineConfig,
    hbm_bytes: int | None = None,
    safety: float = 0.87,
    quantized: bool = False,
    params=None,
    resident_bytes: int = 0,
) -> int:
    """Largest W (chunks) for one window of the WINDOWED-FUSED mode
    (``SegmentConfig.window_chunks == 0`` auto): the biggest W whose
    single-window footprint — identical in shape to a W-chunk fused
    track — fits in ``safety * hbm_bytes`` after reserving
    ``resident_bytes`` for buffers the caller keeps live across windows
    (device-resident full-track audio + accumulated output stems when
    the input arrived as a device array).

    Calibration anchors (PERF.md, v5e, UMX-L 60 s segments): the
    30-minute single program (40 chunks) fits and ran at 1171x; the
    60-minute program (80 chunks) is a measured STEADY-STATE
    RESOURCE_EXHAUSTED — its one-shot estimate (13.6 GB) squeaks under
    the 0.9 budget, but back-to-back runs hold the previous call's
    output stems live against the next call's scan buffers and blow it.
    The window planner models exactly that steady state: each window's
    footprint plus the PREVIOUS window's normalized output region
    (s x 2 x w*stride f32, live until fetched/kept).

    The 0.87 default safety is a round-5 measured bracket on the
    60-minute device-resident shape (resident 7.2 GiB of audio+stems):
    W=30 (model total 13.67 GiB = 0.868 x HBM) runs the 3-pass bench
    steady-state, W=40 (15.79 GiB) RESOURCE_EXHAUSTs — and wider
    windows DO pay: the same track measured 894x at W=21 vs 967x at
    W=30 (per-window glue plus the last window's silent-chunk padding;
    the caller rounds auto W down to the even split for the latter).
    """
    budget = (device_hbm_bytes() if hbm_bytes is None else hbm_bytes) * safety
    budget -= resident_bytes
    sr = cfg.dsp.sample_rate
    stride = cfg.segment.stride_samples(sr)
    s = cfg.model.n_targets

    def est(w: int) -> int:
        # track_secs = w*stride/sr makes fused_track_hbm_bytes's
        # ceil(length/stride) yield exactly w chunks (a window of W
        # chunks has the same buffer shapes as a W-chunk track)
        secs = w * stride / sr
        prev_out = s * 2 * w * stride * 4
        if cfg.segment.streaming:
            one = fused_track_hbm_bytes(
                cfg, 1, secs, quantized=quantized, params=params
            )["total"]
        else:
            width = cfg.segment.chunk_batch
            if width <= 0:
                width = suggest_chunk_batch(
                    cfg, secs, hbm_bytes=hbm_bytes, safety=safety,
                    quantized=quantized, params=params,
                )
            one = parallel_track_hbm_bytes(
                cfg, width, secs, quantized=quantized, params=params
            )["total"]
        return one + prev_out

    return _suggest(est, budget, hard_cap=4096)


def suggest_max_segment_batch(
    cfg: EngineConfig,
    hbm_bytes: int | None = None,
    safety: float = 0.9,
    quantized: bool = False,
    params=None,
) -> int:
    """Largest per-segment batch (serving batcher width) whose estimated
    footprint fits — calibrated so UMX-L 60 s segments admit B=16 and
    reject B=32 on a v5e (the measured curve endpoints, PERF.md)."""
    budget = (device_hbm_bytes() if hbm_bytes is None else hbm_bytes) * safety
    return _suggest(
        lambda b: segment_batch_hbm_bytes(
            cfg, b, quantized=quantized, params=params
        )["total"],
        budget,
    )
