"""ggml weight-format tests: quantization math, write→read round-trip,
and parameter-pytree construction (reference format: model.cpp:96-560,
convert-umx-pth-to-ggml.py:96-160)."""

import numpy as np
import pytest

from umx_tpu.config import ModelConfig
from umx_tpu.io.ggml import (
    GGML_MAGIC,
    TENSOR_ORDER,
    GGMLModel,
    qtype_for,
    read_ggml,
    read_ggml_bytes,
    write_ggml,
    write_ggml_bytes,
)
from umx_tpu.models.umx import params_from_ggml, synthetic_state_dicts
from umx_tpu.ops.quant import dequantize, quantize


def test_quantize_round_trip_u8():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000).astype(np.float32)
    q, scale, offset = quantize(x, np.uint8)
    x2 = dequantize(q, scale, offset)
    # u8 affine quantization error bound: half a step
    assert np.max(np.abs(x - x2)) <= scale / 2 + 1e-6


def test_quantize_round_trip_u16():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(1000).astype(np.float32)
    q, scale, offset = quantize(x, np.uint16)
    x2 = dequantize(q, scale, offset)
    assert np.max(np.abs(x - x2)) <= scale / 2 + 1e-6


def test_quantize_constant_tensor():
    x = np.full(10, 3.25, np.float32)
    q, scale, offset = quantize(x)
    assert np.allclose(dequantize(q, scale, offset), x)


def test_qtype_dispatch():
    # u16 for bn2/bn3/fc2/fc3 tensors, u8 otherwise
    # (convert-umx-pth-to-ggml.py:146-150)
    assert qtype_for("fc2.weight") == np.uint16
    assert qtype_for("bn3.running_var") == np.uint16
    assert qtype_for("fc1.weight") == np.uint8
    assert qtype_for("lstm.weight_ih_l0") == np.uint8
    assert qtype_for("input_mean") == np.uint8


def test_tensor_order_has_43_and_ends_with_bn3_rv():
    # 43 tensors/target, 172 total (README.md:191, model.cpp:568-570);
    # bn3.running_var last so the reference loader's target counter
    # advances correctly (model.cpp:530-539).
    assert len(TENSOR_ORDER) == 43
    assert TENSOR_ORDER[-1] == "bn3.running_var"


def test_write_read_round_trip(tmp_path):
    cfg = ModelConfig(hidden_size=32)
    targets = synthetic_state_dicts(cfg, seed=3)
    data = write_ggml_bytes(cfg.hidden_size, targets)
    assert int.from_bytes(data[:4], "little") == GGML_MAGIC

    model = read_ggml_bytes(data)
    assert model.hidden_size == 32
    assert list(model.targets) == ["bass", "drums", "other", "vocals"]
    for tname, tensors in model.targets.items():
        assert set(tensors) == set(TENSOR_ORDER)
        for name in TENSOR_ORDER:
            orig = targets[tname][name]
            got = tensors[name]
            assert got.shape == orig.shape, (tname, name)
            # quantization error bounded by half a step
            step = (orig.max() - orig.min()) / (
                np.iinfo(qtype_for(name)).max - 1
            )
            assert np.max(np.abs(got - orig)) <= step / 2 + 1e-6, (tname, name)


def test_gzip_round_trip(tmp_path):
    cfg = ModelConfig(hidden_size=32)
    targets = synthetic_state_dicts(cfg, seed=4)
    path = str(tmp_path / "model.bin.gz")
    write_ggml(path, cfg.hidden_size, targets)
    model = read_ggml(path)
    assert model.hidden_size == 32
    np.testing.assert_allclose(
        model.targets["vocals"]["bn1.weight"].shape, targets["vocals"]["bn1.weight"].shape
    )


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        read_ggml_bytes(b"\x00\x00\x00\x00\x00\x00\x00\x00")


def test_too_short_for_header_rejected():
    # a <8-byte file must get the clean ValueError, not a struct.error
    with pytest.raises(ValueError, match="too short"):
        read_ggml_bytes(b"x")


def test_truncated_dims_rejected():
    # valid magic + hidden_size, then a tensor header whose dims are cut
    import struct

    blob = struct.pack("<ii", 0x756D7867, 32)
    blob += struct.pack("<ffii", 1.0, 0.0, 2, 4) + b"\x01\x00"
    with pytest.raises(ValueError, match="truncated.*dims"):
        read_ggml_bytes(blob)


def test_bad_dims_rejected():
    # negative / absurd dims must fail as a header error BEFORE the
    # payload read (a negative product would otherwise swallow the rest
    # of the file and misreport as "truncated payload"); a short name
    # read is its own header error
    import struct

    head = struct.pack("<ii", 0x756D7867, 32)
    neg = head + struct.pack("<ffii", 1.0, 0.0, 2, 4) + struct.pack("<ii", -3, 8) + b"abcd"
    with pytest.raises(ValueError, match="dims"):
        read_ggml_bytes(neg)
    huge = head + struct.pack("<ffii", 1.0, 0.0, 2, 4) + struct.pack("<ii", 1 << 30, 8) + b"abcd"
    with pytest.raises(ValueError, match="dims"):
        read_ggml_bytes(huge)
    short_name = head + struct.pack("<ffii", 1.0, 0.0, 1, 16) + struct.pack("<i", 8) + b"ab"
    with pytest.raises(ValueError, match="name"):
        read_ggml_bytes(short_name)


def test_truncated_payload_rejected():
    cfg = ModelConfig(hidden_size=32)
    data = write_ggml_bytes(cfg.hidden_size, synthetic_state_dicts(cfg, seed=9))
    with pytest.raises(ValueError, match="truncated|targets"):
        read_ggml_bytes(data[: len(data) // 3])


def test_random_garbage_rejected_not_crash():
    rng = np.random.default_rng(10)
    for n in (8, 64, 1024):
        blob = bytes([0x67, 0x78, 0x6D, 0x75]) + rng.bytes(n)  # valid magic + noise
        with pytest.raises((ValueError, Exception)):
            read_ggml_bytes(blob)


def test_single_byte_mutation_fuzz():
    """Flip single bytes across a valid file: the parser must either
    still produce a structurally complete model or raise a clean
    ValueError — never crash, hang, or return a silently short model."""
    cfg = ModelConfig(hidden_size=32)
    data = bytearray(write_ggml_bytes(cfg.hidden_size, synthetic_state_dicts(cfg, seed=12)))
    rng = np.random.default_rng(13)
    for _ in range(40):
        pos = int(rng.integers(0, len(data)))
        mutated = bytearray(data)
        mutated[pos] ^= int(rng.integers(1, 256))
        try:
            model = read_ggml_bytes(bytes(mutated))
        except ValueError:
            continue  # clean structured rejection
        # parsed despite the flip (payload-byte mutation): must still be
        # a complete 4-target, 43-tensor model
        assert len(model.targets) == 4
        assert all(len(t) == 43 for t in model.targets.values())


def test_load_progress_callback():
    cfg = ModelConfig(hidden_size=32)
    data = write_ggml_bytes(cfg.hidden_size, synthetic_state_dicts(cfg, seed=11))
    seen = []
    read_ggml_bytes(data, progress=seen.append)
    assert len(seen) == 4 * 43
    assert seen == sorted(seen)
    assert seen[-1] == pytest.approx(1.0)


def test_params_from_ggml_shapes():
    cfg = ModelConfig(hidden_size=64)
    model = GGMLModel(hidden_size=64, targets=synthetic_state_dicts(cfg, seed=5))
    p = params_from_ggml(model, cfg)
    H, F, O, G = 64, cfg.n_features, cfg.n_outputs, 32
    assert p.input_mean.shape == (4, F)
    assert p.fc1_w.shape == (4, F, H)
    assert p.lstm_ih_w.shape == (4, 3, 2, H, 4 * G)
    assert p.lstm_hh_w.shape == (4, 3, 2, G, 4 * G)
    assert p.lstm_ih_b.shape == (4, 3, 2, 4 * G)
    assert p.fc2_w.shape == (4, 2 * H, H)
    assert p.fc3_w.shape == (4, H, O)
    assert p.output_mean.shape == (4, O)
    # duplication of the per-bin stats into stacked-stereo layout
    # (model.cpp:240-290)
    np.testing.assert_array_equal(p.input_mean[:, : F // 2], p.input_mean[:, F // 2 :])
    np.testing.assert_array_equal(p.output_scale[:, : O // 2], p.output_scale[:, O // 2 :])
