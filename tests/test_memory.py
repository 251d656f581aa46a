"""HBM capacity-planner tests (engine/memory.py), calibrated against the
measured v5e facts: B=4 x 420 s fused whole-track fits, B=8 x 420 s
RESOURCE_EXHAUSTs; B=16 x 60 s per-segment batch fits, B=32 OOMs with an
allocator request of 21.0 GiB (PERF.md batch-curve endpoints)."""

import jax.numpy as jnp

from umx_tpu.config import UMXHQ, EngineConfig, ModelConfig, SegmentConfig
from umx_tpu.engine.memory import (
    V5E_HBM_BYTES,
    device_hbm_bytes,
    fused_track_hbm_bytes,
    parallel_track_hbm_bytes,
    params_hbm_bytes,
    segment_batch_hbm_bytes,
    suggest_chunk_batch,
    suggest_max_batch,
    suggest_max_segment_batch,
)


def _cfg(seg_secs=60.0):
    return EngineConfig(segment=SegmentConfig(segment_secs=seg_secs))


def test_monotonic_in_batch_and_length():
    cfg = _cfg()
    t = [fused_track_hbm_bytes(cfg, b, 420.0)["total"] for b in (1, 2, 4, 8)]
    assert t == sorted(t) and t[0] < t[-1]
    u = [fused_track_hbm_bytes(cfg, 2, s)["total"] for s in (60, 240, 420, 900)]
    assert u == sorted(u) and u[0] < u[-1]


def test_calibration_matches_measured_v5e_facts():
    """Round-4 measured bracket (420 s UMX-L whole tracks on a v5e):
    B=4 and B=6 FIT in both stack dtypes, B=8 RESOURCE_EXHAUSTs in both
    (BENCH_MATRIX_r04 session) — the model must reproduce all six."""
    cfg = _cfg()  # auto stems stack -> f32 on the CPU test backend
    import dataclasses

    bf = dataclasses.replace(cfg, stems_stack_dtype="bfloat16")
    for c in (cfg, bf):
        assert fused_track_hbm_bytes(c, 4, 420.0)["total"] <= V5E_HBM_BYTES
        assert fused_track_hbm_bytes(c, 6, 420.0)["total"] <= V5E_HBM_BYTES
        assert fused_track_hbm_bytes(c, 8, 420.0)["total"] > V5E_HBM_BYTES
    # the bf16 stack estimate is strictly smaller
    assert (
        fused_track_hbm_bytes(bf, 6, 420.0)["total"]
        < fused_track_hbm_bytes(cfg, 6, 420.0)["total"]
    )


def test_segment_batch_calibration():
    """The per-segment batch curve's measured endpoints: 16 fits, 32 does
    not (allocator asked 21.0 GiB of 15.75)."""
    cfg = _cfg()
    assert segment_batch_hbm_bytes(cfg, 16)["total"] <= int(0.9 * V5E_HBM_BYTES)
    b32 = segment_batch_hbm_bytes(cfg, 32)["total"]
    assert b32 > V5E_HBM_BYTES
    # and the estimate should be near the allocator's actual 21.0 GiB ask
    assert abs(b32 / 2**30 - 21.0) < 3.0


def test_suggest_max_batch():
    cfg = _cfg()
    b = suggest_max_batch(cfg, 420.0, hbm_bytes=V5E_HBM_BYTES)
    # suggestion must sit inside the measured bracket (6 fits, 8 OOMs)
    # minus the 0.9 safety margin — conservative, never past a fit
    assert 4 <= b <= 6
    assert suggest_max_batch(cfg, 60.0, hbm_bytes=V5E_HBM_BYTES) > b
    # even an over-budget single track still returns 1
    assert suggest_max_batch(cfg, 10_000.0, hbm_bytes=V5E_HBM_BYTES) == 1


def test_suggest_max_segment_batch():
    b = suggest_max_segment_batch(_cfg(), hbm_bytes=V5E_HBM_BYTES)
    assert 16 <= b < 32  # inside the measured (fits, OOMs) bracket
    # quantized weights free ~360 MB — never a smaller suggestion
    q = suggest_max_segment_batch(_cfg(), hbm_bytes=V5E_HBM_BYTES, quantized=True)
    assert q >= b


def test_suggest_chunk_batch():
    """Auto non-streaming group width (SegmentConfig.chunk_batch=0): on a
    v5e a 420 s UMX-L track admits the full measured-safe width 16 (the
    1574x configuration, PERF.md); much longer tracks shrink the group
    because the track-level buffers eat the budget; the suggestion is
    never below 1 and never above the measured-safe 16 cap."""
    cfg = _cfg()
    w = suggest_chunk_batch(cfg, 420.0, hbm_bytes=V5E_HBM_BYTES)
    assert w == 16
    long_w = suggest_chunk_batch(cfg, 1800.0, hbm_bytes=V5E_HBM_BYTES)
    assert 1 <= long_w < w
    assert suggest_chunk_batch(cfg, 60.0, hbm_bytes=V5E_HBM_BYTES) <= 16
    # width is clamped by n_chunks at the call site; footprint must be
    # monotone in width for the bisection to be valid
    t = [parallel_track_hbm_bytes(cfg, b, 420.0)["total"] for b in (1, 4, 8, 16)]
    assert t == sorted(t) and t[0] < t[-1]


def test_params_bytes_derived_from_config():
    """Config-derived param bytes must track the measured UMX-L resident
    set (~530 MB) and scale down for UMX-HQ and quantized-HBM modes."""
    full = params_hbm_bytes(_cfg())
    assert abs(full - 530e6) < 30e6
    assert params_hbm_bytes(UMXHQ) < full / 2
    assert params_hbm_bytes(_cfg(), quantized=True) < full / 2
    # exact mode: measured from an actual pytree
    tree = {"w": jnp.zeros((1000, 1000), jnp.float32)}
    measured = params_hbm_bytes(_cfg(), params=tree)
    assert 4e6 <= measured <= 5e6


def test_params_bytes_scale_with_hidden_size():
    small = params_hbm_bytes(EngineConfig(model=ModelConfig(hidden_size=256)))
    big = params_hbm_bytes(EngineConfig(model=ModelConfig(hidden_size=2048)))
    assert small < big


def test_device_hbm_query_falls_back():
    # on CPU backends memory_stats is absent/tiny — must return the default
    assert device_hbm_bytes(default=123 * 2**30) in (123 * 2**30,) or (
        device_hbm_bytes() > 2**30
    )


def test_terms_present_and_positive():
    parts = fused_track_hbm_bytes(_cfg(), 2, 300.0)
    for k in ("ys", "ola", "stems", "audio", "seg_transients", "params", "total"):
        assert parts[k] > 0, k
    # the boundary (scan→OLA) is the modeled peak; the pad+sum ola_phase
    # applies only under ola_impl="xla"
    assert parts["total"] >= parts["scan_phase"]
    assert parts["total"] >= parts["boundary"]
    import dataclasses

    xla = dataclasses.replace(_cfg(), ola_impl="xla")
    parts_x = fused_track_hbm_bytes(xla, 2, 300.0)
    assert parts_x["total"] >= parts_x["ola_phase"]


def test_suggest_max_fleet_batch():
    """Fleet bucket bound: streaming delegates to the fused-scan
    estimator and stays inside the measured v5e bracket (B=6 x 420 s
    fits, B=8 OOMs); non-streaming evaluates each candidate batch at the
    width the builder would resolve, so explicit wide widths shrink the
    admissible batch."""
    import dataclasses

    from umx_tpu.engine.memory import V5E_HBM_BYTES, suggest_max_fleet_batch

    cfg = EngineConfig()
    b_stream = suggest_max_fleet_batch(cfg, 420.0, hbm_bytes=V5E_HBM_BYTES)
    assert 1 <= b_stream <= 6  # never admits the measured OOM point

    ns = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, streaming=False, chunk_batch=0)
    )
    b_auto = suggest_max_fleet_batch(ns, 420.0, hbm_bytes=V5E_HBM_BYTES)
    assert b_auto >= 1
    ns8 = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, streaming=False, chunk_batch=8)
    )
    b_wide = suggest_max_fleet_batch(ns8, 420.0, hbm_bytes=V5E_HBM_BYTES)
    assert b_wide <= b_auto  # a forced wide group leaves less room for tracks
