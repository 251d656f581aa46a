"""HBM capacity planning for batched whole-track fused demixing.

The batched fused-track program (engine/fleet.py's bucket call) is the
single-chip throughput shape, but its footprint grows with
batch x track-length and a v5e chip has 15.75 GB of usable HBM: B=8 x
420 s was measured to RESOURCE_EXHAUST while B=4 fits comfortably.
This module gives a first-principles liveness estimate of the program's
peak HBM so callers (fleet bucketing, serving admission, bench configs)
can pick a feasible batch instead of discovering OOM at compile time.

The estimate models the two high-water phases of the program:

* scan phase — the stacked weighted chunk outputs accumulate while a
  segment's transients (Wiener y planes, spectrogram planes, masks) are
  live;
* overlap-add phase — the stacked chunks, the head+shifted-tail sum,
  its time-interleaved reshape, and the final stems are simultaneously
  live.

and applies an empirical layout factor for TPU tiling padding
(measured 1.3x on the dominant (…, stride) tensors) — deliberately
coarse (+-25%); keep a safety margin.
"""

from __future__ import annotations

import math

from umx_tpu.config import EngineConfig

V5E_HBM_BYTES = int(15.75 * 2**30)  # usable HBM per chip (16G - reserved)
_LAYOUT_FACTOR = 1.25  # measured tiling-padding expansion on (…, stride)


def fused_track_hbm_bytes(
    cfg: EngineConfig, batch: int, track_secs: float
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
    S = cfg.model.n_targets
    T = cfg.dsp.n_frames(seg)
    F = cfg.dsp.n_bins
    B = batch
    f4 = 4  # float32

    ys = B * S * 2 * n_chunks * seg * f4  # scan-stacked weighted chunks
    ola = 2 * B * S * 2 * n_chunks * stride * f4  # combined + interleaved
    stems = B * S * 2 * padded * f4  # normalized output
    audio = B * 2 * padded * f4
    # per-segment transients live during one scan iteration
    seg_transients = B * (
        2 * S * 2 * T * F * f4  # Wiener y planes (re, im)
        + 2 * 2 * T * F * f4  # mix spectrogram planes
        + S * T * 2 * F * f4  # masks
        + 2 * T * 4096 * f4  # framed iDFT output
    )
    params = 530_000_000 if cfg.model.hidden_size >= 1024 else 140_000_000

    scan_phase = ys + audio + seg_transients
    ola_phase = ys + ola + stems
    peak = max(scan_phase, ola_phase)
    total = int(peak * _LAYOUT_FACTOR) + params
    return {
        "ys": ys,
        "ola": ola,
        "stems": stems,
        "audio": audio,
        "seg_transients": seg_transients,
        "params": params,
        "scan_phase": scan_phase,
        "ola_phase": ola_phase,
        "total": total,
    }


def suggest_max_batch(
    cfg: EngineConfig,
    track_secs: float,
    hbm_bytes: int = V5E_HBM_BYTES,
    safety: float = 0.9,
) -> int:
    """Largest batch of ``track_secs`` tracks whose estimated fused-track
    footprint fits in ``safety * hbm_bytes``.  Always >= 1 (a single
    track is the baseline configuration; if even that estimate exceeds
    the budget the caller should shorten segments instead)."""
    budget = hbm_bytes * safety
    b = 1
    while fused_track_hbm_bytes(cfg, b + 1, track_secs)["total"] <= budget:
        b += 1
    return b
