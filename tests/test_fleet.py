"""Fleet runner tests: batched multi-track demix, sharded over the
virtual 8-device dp mesh, must equal per-track single-device results."""

import numpy as np
import pytest

from umx_tpu.config import EngineConfig, ModelConfig, SegmentConfig
from umx_tpu.engine.fleet import demix_tracks
from umx_tpu.engine.separator import Separator
from umx_tpu.models.umx import synthetic_params
from umx_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def cfg():
    return EngineConfig(
        model=ModelConfig(hidden_size=64),
        segment=SegmentConfig(segment_secs=0.5),
        shifts=0,
    )


@pytest.fixture(scope="module")
def params(cfg):
    return synthetic_params(cfg.model, seed=0)


@pytest.fixture(scope="module")
def tracks():
    rng = np.random.default_rng(81)
    # different lengths -> multiple shape buckets
    return [
        rng.uniform(-0.5, 0.5, (2, n)).astype(np.float32)
        for n in (30_000, 30_000, 50_000, 30_000, 50_000)
    ]


@pytest.mark.slow
def test_fleet_matches_per_track(cfg, params, tracks):
    mesh = make_mesh(dp=8, tp=1)
    outs = demix_tracks(params, tracks, cfg, mesh=mesh)
    sep = Separator(params, cfg)
    for track, out in zip(tracks, outs):
        assert out.shape == (4, 2, track.shape[1])
        ref = np.asarray(sep.demix(track))
        np.testing.assert_allclose(out, ref, atol=2e-4)


def test_fleet_no_mesh(cfg, params, tracks):
    outs = demix_tracks(params, tracks[:2], cfg)
    assert len(outs) == 2
    for t, o in zip(tracks[:2], outs):
        assert o.shape == (4, 2, t.shape[1])


@pytest.mark.slow
def test_fleet_with_shifts(cfg, params, tracks):
    import dataclasses

    c = dataclasses.replace(cfg, shifts=1)
    mesh = make_mesh(dp=8, tp=1)
    outs = demix_tracks(params, tracks[:3], c, mesh=mesh, seeds=[1, 2, 3])
    sep = Separator(params, c)
    for seed, track, out in zip([1, 2, 3], tracks[:3], outs):
        ref = sep.demix_track(track, seed=seed)
        np.testing.assert_allclose(out, ref, atol=2e-4)


@pytest.mark.slow
def test_fleet_nonstreaming_matches_per_track(cfg, params, tracks):
    """Non-streaming batched tracks route through the vmapped chunk-group
    PARALLEL program (B x width kernel rows) — must equal the per-track
    Separator result, which runs the same parallel program unbatched."""
    import dataclasses

    c = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, streaming=False)
    )
    outs = demix_tracks(params, tracks[:3], c)
    sep = Separator(params, c)
    for track, out in zip(tracks[:3], outs):
        assert out.shape == (4, 2, track.shape[1])
        ref = np.asarray(sep.demix(track))
        np.testing.assert_allclose(out, ref, atol=2e-4)


@pytest.mark.slow
def test_fleet_nonstreaming_with_shifts_matches_per_track(cfg, params, tracks):
    """Shift padding composes with the non-streaming parallel route:
    fleet multi-shift averaging must equal Separator.demix_track, whose
    per-pass demix also runs the parallel program when streaming=False."""
    import dataclasses

    c = dataclasses.replace(
        cfg,
        shifts=2,
        segment=dataclasses.replace(cfg.segment, streaming=False),
    )
    outs = demix_tracks(params, tracks[:2], c, seeds=[5, 6])
    sep = Separator(params, c)
    for seed, track, out in zip([5, 6], tracks[:2], outs):
        ref = sep.demix_track(track, seed=seed)
        np.testing.assert_allclose(out, ref, atol=2e-4)


def test_batched_demix_nonstreaming_width_planned():
    """The non-streaming batched program picks a planner width that
    keeps total rows (batch x width) within the measured-safe 16."""
    from umx_tpu.engine.memory import suggest_chunk_batch

    cfg = EngineConfig(
        model=ModelConfig(hidden_size=64), segment=SegmentConfig(
            segment_secs=0.5, streaming=False
        )
    )
    for b in (1, 2, 4, 6, 16, 32):
        w = suggest_chunk_batch(cfg, 420.0, hbm_bytes=16 * 2**30, batch=b)
        assert 1 <= w * b <= 16 or w == 1


def test_batched_demix_resolves_width_from_original_cfg(monkeypatch):
    """_batched_demix must resolve the chunk-group width BEFORE
    _device_cfg canonicalizes chunk_batch to 4: explicit widths are
    honored and the auto (cb<=0) branch calls the planner with the
    actual track batch.  Regression test for the round-4 dead-planner
    bug (every batched program silently ran width 4)."""
    import dataclasses

    from umx_tpu.engine import fleet

    base = EngineConfig(
        model=ModelConfig(hidden_size=64),
        segment=SegmentConfig(segment_secs=0.5, streaming=False),
    )
    seg, stride = 22050, 16538

    # explicit width survives canonicalization (capped by n_chunks)
    c8 = dataclasses.replace(
        base, segment=dataclasses.replace(base.segment, chunk_batch=8)
    )
    assert fleet.resolve_batched_width(c8, 20, seg, stride, batch=3) == 8
    assert fleet.resolve_batched_width(c8, 5, seg, stride, batch=3) == 5

    # auto mode consults the planner with the real batch
    calls = []

    def fake_planner(cfg, track_secs, batch=1, **kw):
        calls.append(batch)
        return 2

    import umx_tpu.engine.memory as memory

    monkeypatch.setattr(memory, "suggest_chunk_batch", fake_planner)
    auto = dataclasses.replace(
        base, segment=dataclasses.replace(base.segment, chunk_batch=0)
    )
    assert fleet.resolve_batched_width(auto, 20, seg, stride, batch=6) == 2
    assert calls == [6]

    # and _batched_demix itself keys the cache on the resolved width
    fleet._batched_cache.clear()
    fleet._batched_demix(c8, 20, seg, stride, batch=3)
    (key,) = fleet._batched_cache.keys()
    assert key[-1] == 8
    fleet._batched_cache.clear()


def test_fleet_multi_shift_matches_per_track(cfg, params, tracks):
    import dataclasses

    c = dataclasses.replace(cfg, shifts=2)
    outs = demix_tracks(params, tracks[:2], c, seeds=[4, 5])
    sep = Separator(params, c)
    for seed, track, out in zip([4, 5], tracks[:2], outs):
        ref = sep.demix_track(track, seed=seed)
        np.testing.assert_allclose(out, ref, atol=2e-4)


@pytest.mark.slow
def test_fleet_certify_quick_smoke():
    """The fleet certification harness (scripts/fleet-certify.py) runs
    end-to-end at CI shape and emits one parseable JSON line."""
    import json
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "scripts/fleet-certify.py", "--quick"],
        capture_output=True, text=True, timeout=600,
        env={"UMX_TPU_PLATFORM": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["metric"].startswith("xRT_") and d["value"] > 0
    assert d["tracks"] == 6


def test_fleet_routes_beyond_window_tracks_through_windowed_path(cfg, params, tracks):
    """A track beyond the single-program window must NOT dispatch as one
    bucket program (the 60-min single program is a measured steady-state
    RESOURCE_EXHAUSTED on the chip) — demix_tracks routes it through the
    per-track windowed-fused path and the result still equals the
    unconstrained single-program reference."""
    import dataclasses

    # window_chunks=2: the 50k-sample tracks (4 chunks at 0.5 s segments)
    # exceed the window; the 30k tracks (2 chunks) stay bucket-batched
    c = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, window_chunks=2)
    )
    mixed = [tracks[0], tracks[2], tracks[1]]  # short, long, short
    stats: dict = {}
    outs = demix_tracks(params, mixed, c, stats=stats)
    assert stats["windowed_tracks"] == 1
    # the bucket path saw only the two short tracks
    assert stats["rows"] == 2
    sep = Separator(params, cfg)  # reference: unconstrained single program
    for track, out in zip(mixed, outs):
        assert out.shape == (4, 2, track.shape[1])
        ref = np.asarray(sep.demix(track))
        np.testing.assert_allclose(out, ref, atol=2e-4)
