"""Multi-host DCN input-distribution tests (parallel/multihost.py).

True multi-process runs need a pod; these tests exercise the complete
partition → local-fleet → reassemble logic by running each simulated
host's slice in-process with explicit (process_id, process_count) and
asserting the union equals the plain single-host fleet result.
"""

import numpy as np
import pytest

from umx_tpu.config import EngineConfig, ModelConfig, SegmentConfig
from umx_tpu.engine.fleet import demix_tracks
from umx_tpu.models.umx import synthetic_params
from umx_tpu.parallel.multihost import (
    allgather_metrics,
    demix_tracks_multihost,
    partition_tracks,
)


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
    rng = np.random.default_rng(7)
    return [
        rng.uniform(-0.5, 0.5, (2, n)).astype(np.float32)
        for n in (30_000, 50_000, 30_000)
    ]


def test_partition_disjoint_covering_balanced():
    for n_tracks, num in ((10, 3), (3, 4), (8, 1), (5, 5)):
        slices = [partition_tracks(n_tracks, p, num) for p in range(num)]
        flat = sorted(i for s in slices for i in s)
        assert flat == list(range(n_tracks))  # disjoint + covering
        sizes = [len(s) for s in slices]
        assert max(sizes) - min(sizes) <= 1  # balanced
    with pytest.raises(ValueError):
        partition_tracks(4, 3, 2)


def test_partition_defaults_to_jax_process(monkeypatch):
    assert partition_tracks(6) == list(range(6))  # 1 process owns all


@pytest.mark.slow
def test_two_simulated_hosts_union_equals_single_fleet(cfg, params, tracks):
    ref = demix_tracks(params, tracks, cfg)
    combined: dict[int, np.ndarray] = {}
    for pid in range(2):
        res = demix_tracks_multihost(
            params, tracks, cfg, process_id=pid, process_count=2
        )
        assert res.process_id == pid and res.process_count == 2
        assert res.owned_indices() == partition_tracks(len(tracks), pid, 2)
        assert not set(res.local) & set(combined)  # no overlap across hosts
        combined.update(res.local)
    assert sorted(combined) == list(range(len(tracks)))
    for i, want in enumerate(ref):
        np.testing.assert_allclose(combined[i], want, atol=2e-4)


@pytest.mark.slow
def test_lazy_track_loaders_only_called_for_owned(cfg, params, tracks):
    calls: list[int] = []

    def loader(i):
        def load():
            calls.append(i)
            return tracks[i]

        return load

    lazy = [loader(i) for i in range(len(tracks))]
    res = demix_tracks_multihost(
        params, lazy, cfg, process_id=1, process_count=2
    )
    assert sorted(calls) == res.owned_indices() == [1]


def test_allgather_metrics_single_process_identity():
    vals = {0: 1.5, 2: -3.25}
    assert allgather_metrics(vals) == vals
