"""Model registry + batch CLI tests."""

import os

import numpy as np
import pytest

from umx_tpu.models.registry import REGISTRY, family_for_hidden_size, get


def test_registry_families():
    assert get("umxl").hidden_size == 1024
    assert get("umxhq").hidden_size == 512
    assert family_for_hidden_size(1024).name == "umxl"
    assert family_for_hidden_size(512).name == "umxhq"
    assert family_for_hidden_size(64).hidden_size == 64  # custom passthrough
    with pytest.raises(KeyError):
        get("nope")
    for fam in REGISTRY.values():
        cfg = fam.engine_config()
        assert cfg.model.hidden_size == fam.hidden_size


@pytest.mark.slow
def test_batch_cli_end_to_end(tmp_path):
    from scipy.io import wavfile

    from umx_tpu import cli_batch
    from umx_tpu.config import ModelConfig
    from umx_tpu.io.ggml import write_ggml
    from umx_tpu.models.umx import synthetic_state_dicts

    model_path = str(tmp_path / "model.bin.gz")
    write_ggml(model_path, 64, synthetic_state_dicts(ModelConfig(hidden_size=64), 0))

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    for name, n in (("a.wav", 30_000), ("b.wav", 44_100)):
        wav = rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)
        wavfile.write(str(in_dir / name), 44100, wav)
    # MUSDB-style track dir
    track_dir = in_dir / "song c"
    track_dir.mkdir()
    wavfile.write(
        str(track_dir / "mixture.wav"),
        44100,
        rng.uniform(-0.5, 0.5, (30_000, 2)).astype(np.float32),
    )

    out_root = str(tmp_path / "out")
    rc = cli_batch.main(
        [model_path, str(in_dir), out_root, "--quiet", "--segment-secs", "0.5",
         "--shifts", "0"]
    )
    assert rc == 0
    for track, n in (("a", 30_000), ("b", 44_100), ("song c", 30_000)):
        for i in range(4):
            path = os.path.join(out_root, track, f"target_{i}.wav")
            assert os.path.exists(path), path
            rate, data = wavfile.read(path)
            assert rate == 44100 and data.shape == (n, 2)
