"""Training data pipeline tests."""

import numpy as np
import pytest

from umx_tpu.config import TARGETS
from umx_tpu.data import AugmentConfig, StemDataset, train_loop


@pytest.fixture(scope="module")
def stem_root(tmp_path_factory):
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("stems")
    rng = np.random.default_rng(0)
    for name, n in (("track_a", 30_000), ("track_b", 25_000)):
        d = root / name
        d.mkdir()
        for t in TARGETS:
            wav = rng.uniform(-0.4, 0.4, (n, 2)).astype(np.float32)
            wavfile.write(str(d / f"{t}.wav"), 44100, wav)
    # a folder missing stems must be ignored
    (root / "not_a_track").mkdir()
    return str(root)


def test_dataset_discovers_tracks(stem_root):
    ds = StemDataset(stem_root, excerpt_samples=8000)
    assert ds.tracks == ["track_a", "track_b"]


def test_sample_shapes_and_mixture(stem_root):
    ds = StemDataset(stem_root, excerpt_samples=8000, seed=1)
    mix, targets = ds.sample(3)
    assert mix.shape == (3, 2, 8000)
    assert targets.shape == (3, 4, 2, 8000)
    np.testing.assert_allclose(mix, targets.sum(axis=1), atol=1e-6)


def test_sampling_deterministic_per_seed(stem_root):
    a = StemDataset(stem_root, excerpt_samples=4000, seed=7).sample(2)
    b = StemDataset(stem_root, excerpt_samples=4000, seed=7).sample(2)
    np.testing.assert_array_equal(a[0], b[0])


def test_excerpt_longer_than_track_zero_padded(stem_root):
    ds = StemDataset(stem_root, excerpt_samples=40_000, seed=2)
    mix, targets = ds.sample(1)
    assert mix.shape[-1] == 40_000
    assert np.abs(targets[..., 30_000:]).max() == 0.0  # padded tail


def test_no_augment_reproduces_raw_mix(stem_root):
    aug = AugmentConfig(gain_min=1.0, gain_max=1.0, channel_swap_prob=0.0, source_mixing=False)
    ds = StemDataset(stem_root, excerpt_samples=8000, augment=aug, seed=3)
    mix, targets = ds.sample(1)
    np.testing.assert_allclose(mix[0], targets[0].sum(axis=0), atol=1e-6)


def test_missing_root_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        StemDataset(str(tmp_path / "empty"), excerpt_samples=100)


@pytest.mark.slow
def test_train_loop_runs_and_improves(stem_root):
    from umx_tpu.config import ModelConfig
    from umx_tpu.train import TrainConfig

    mcfg = ModelConfig(hidden_size=32)
    tcfg = TrainConfig(seq_len=8, learning_rate=2e-3)
    ds = StemDataset(stem_root, excerpt_samples=1024 * 7, seed=4)
    _, losses = train_loop(ds, mcfg, tcfg, steps=8, batch_size=2, log_every=0)
    assert len(losses) == 8
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_train_valid_split_disjoint(stem_root):
    train = StemDataset(stem_root, excerpt_samples=4000, split="train", n_valid_tracks=1)
    valid = StemDataset(stem_root, excerpt_samples=4000, split="valid", n_valid_tracks=1)
    assert train.tracks == ["track_a"]
    assert valid.tracks == ["track_b"]
    with pytest.raises(ValueError):
        StemDataset(stem_root, excerpt_samples=4000, split="bogus")


def test_fixed_batches_deterministic_and_aligned(stem_root):
    ds = StemDataset(stem_root, excerpt_samples=8000, split="valid", seed=9)
    a = list(ds.fixed_batches(2, 2))
    b = list(ds.fixed_batches(2, 2))
    assert len(a) == 2
    for (ma, ta), (mb, tb) in zip(a, b):
        assert ma.shape == (2, 2, 8000) and ta.shape == (2, 4, 2, 8000)
        np.testing.assert_array_equal(ma, mb)
        np.testing.assert_allclose(ma, ta.sum(axis=1), atol=1e-6)


@pytest.mark.slow
def test_train_loop_validation_recipe(stem_root):
    """With lr=0 the loss is constant, so the first validation sets the
    best and every later one is non-improving: early stop must fire and
    the history must carry the recipe record."""
    from umx_tpu.config import ModelConfig
    from umx_tpu.train import TrainConfig

    mcfg = ModelConfig(hidden_size=32)
    tcfg = TrainConfig(seq_len=8, learning_rate=0.0, early_stop_patience=1,
                       lr_decay_patience=1000)
    train = StemDataset(stem_root, excerpt_samples=1024 * 7, split="train", seed=4)
    valid = StemDataset(stem_root, excerpt_samples=1024 * 7, split="valid", seed=4)
    _, hist = train_loop(
        train, mcfg, tcfg, steps=20, batch_size=2, log_every=0,
        valid_dataset=valid, valid_every=2, valid_batches=1,
    )
    assert hist.stopped_early
    assert len(hist) == 6  # stops at the 3rd validation (bad 2 > patience 1)
    assert len(hist.valid) == 3
    assert hist.best_step == 2
    assert np.isfinite(hist.best_valid)
    assert [lr for _, lr in hist.lrs] == [0.0, 0.0, 0.0]


def test_non_source_mixing_stems_are_time_aligned(stem_root):
    # ADVICE r1: without source_mixing the 4 stems must share ONE track,
    # start offset, gain, and channel swap (coherent MUSDB semantics)
    aug = AugmentConfig(gain_min=0.5, gain_max=0.5, channel_swap_prob=1.0, source_mixing=False)
    ds = StemDataset(stem_root, excerpt_samples=8000, augment=aug, seed=11)
    _, targets = ds.sample(2)
    L = 8000
    for b in range(2):
        found = False
        for track in ds.tracks:
            stems = ds._load_stems(track)  # (4, 2, n)
            n = stems.shape[-1]
            # bass (index 0) locates the shared start; channel-swapped, gain 0.5
            want = targets[b, 0]
            for start in range(0, n - L + 1):
                cand = 0.5 * stems[0, ::-1, start : start + L]
                if np.allclose(cand, want, atol=1e-6):
                    for j in range(1, 4):
                        np.testing.assert_allclose(
                            targets[b, j],
                            0.5 * stems[j, ::-1, start : start + L],
                            atol=1e-6,
                            err_msg=f"stem {j} misaligned",
                        )
                    found = True
                    break
            if found:
                break
        assert found, "sampled stems do not correspond to any aligned excerpt"
