"""End-to-end engine tests: segmentation, overlap-add, streaming state,
shift trick, and the CLI contract — on synthetic weights with short
segments so CPU runs stay fast (real-weight SDR parity is the e2e
script's job, mirroring test/e2e_test.sh)."""

import dataclasses
import os

import numpy as np
import pytest

from umx_tpu.config import EngineConfig, ModelConfig, SegmentConfig
from umx_tpu.engine.separator import Separator, _transition_weight
from umx_tpu.models.umx import synthetic_params


@pytest.fixture(scope="module")
def cfg():
    return EngineConfig(
        model=ModelConfig(hidden_size=64),
        segment=SegmentConfig(segment_secs=1.0),
        shifts=0,
    )


@pytest.fixture(scope="module")
def sep(cfg):
    return Separator(synthetic_params(cfg.model, seed=0), cfg)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(31)
    sr = 44100
    t = np.arange(int(2.5 * sr)) / sr
    left = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(t.shape)
    right = 0.4 * np.sin(2 * np.pi * 330 * t) + 0.05 * rng.standard_normal(t.shape)
    return np.stack([left, right]).astype(np.float32)


def test_transition_weight_matches_reference_formula():
    # w(i) = min(i+1, seg-i), normalized to max 1 (umx.cpp:196-206)
    seg = 1000
    w = np.asarray(_transition_weight(seg, 1.0))
    expected = np.minimum(np.arange(1, seg + 1), seg - np.arange(seg)).astype(np.float32)
    expected /= expected.max()
    np.testing.assert_allclose(w, expected, atol=1e-6)


def test_demix_shapes_and_finite(sep, audio):
    out = np.asarray(sep.demix(audio))
    assert out.shape == (4, 2, audio.shape[1])
    assert np.isfinite(out).all()


def test_demix_deterministic(sep, audio):
    a = np.asarray(sep.demix(audio))
    b = np.asarray(sep.demix(audio))
    np.testing.assert_array_equal(a, b)


def test_short_track_single_segment(sep):
    # shorter than one segment: must still work (zero-padded internally)
    rng = np.random.default_rng(32)
    short = rng.uniform(-0.5, 0.5, (2, 10_000)).astype(np.float32)
    out = np.asarray(sep.demix(short))
    assert out.shape == (4, 2, 10_000)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_streaming_vs_reset_differ(cfg, audio):
    params = synthetic_params(cfg.model, seed=0)
    s_stream = Separator(params, cfg)
    s_reset = Separator(
        params, dataclasses.replace(cfg, segment=dataclasses.replace(cfg.segment, streaming=False))
    )
    a = np.asarray(s_stream.demix(audio))
    b = np.asarray(s_reset.demix(audio))
    # with streaming, segment 2+ sees carried LSTM state -> different output
    assert not np.allclose(a, b)
    # but the first segment's start is identical (state starts at zero)
    np.testing.assert_allclose(a[..., :1000], b[..., :1000], atol=1e-5)


def test_no_wiener_path(cfg, audio):
    params = synthetic_params(cfg.model, seed=0)
    s = Separator(params, dataclasses.replace(cfg, use_wiener=False))
    out = np.asarray(s.demix(audio[:, :44100]))
    assert out.shape == (4, 2, 44100)
    assert np.isfinite(out).all()


def test_shift_trick_preserves_length_and_content(cfg, audio):
    params = synthetic_params(cfg.model, seed=0)
    s = Separator(params, dataclasses.replace(cfg, shifts=1))
    out = s.demix_track(audio, seed=7)
    assert out.shape == (4, 2, audio.shape[1])
    assert np.isfinite(out).all()
    # same seed -> identical result (seedable PRNG vs reference's
    # unseeded rand(), umx.cpp:115)
    out2 = s.demix_track(audio, seed=7)
    np.testing.assert_array_equal(out, out2)


def test_overlap_add_unity_for_constant_network(cfg):
    """Feed a 'network' whose output the engine overlap-adds: with
    identical chunk outputs, the triangular weights must cancel exactly
    (sum w * y / sum w == y).  We approximate by demixing a constant-zero
    track: every stage is linear-ish at 0 and outputs must be tiny."""
    params = synthetic_params(cfg.model, seed=0)
    s = Separator(params, cfg)
    silent = np.zeros((2, 60_000), np.float32)
    out = np.asarray(s.demix(silent))
    # masks * |stft(0)| = 0 magnitudes -> zero reconstruction
    assert np.abs(out).max() < 1e-4


def test_fused_matches_host_loop(sep, audio):
    # the single-dispatch lax.scan track program must equal the
    # per-segment host loop bit-for-bit (same XLA ops, same order)
    fused = np.asarray(sep.demix(audio, fused=True))
    looped = np.asarray(sep.demix(audio, fused=False))
    np.testing.assert_allclose(fused, looped, atol=1e-5)


@pytest.mark.slow
def test_non_streaming_short_track_single_chunk(cfg):
    # parallel-segments path with fewer chunks than the chunk batch
    params = synthetic_params(cfg.model, seed=0)
    c = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, streaming=False)
    )
    s = Separator(params, c)
    short = np.random.default_rng(44).uniform(-0.5, 0.5, (2, 10_000)).astype(np.float32)
    fused = np.asarray(s.demix(short, fused=True))
    looped = np.asarray(s.demix(short, fused=False))
    np.testing.assert_allclose(fused, looped, atol=1e-5)


def test_fused_matches_host_loop_no_streaming(cfg, audio):
    params = synthetic_params(cfg.model, seed=0)
    c = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, streaming=False)
    )
    s = Separator(params, c)
    fused = np.asarray(s.demix(audio, fused=True))
    looped = np.asarray(s.demix(audio, fused=False))
    np.testing.assert_allclose(fused, looped, atol=1e-5)


@pytest.mark.slow
def test_bf16_fast_path_knobs_match_f32(cfg, audio):
    """The round-3 TPU fast-path knobs (bf16 Wiener y emission + the
    inverse-transform precision knob) run end-to-end and stay within
    bf16 rounding of the fp32 engine output.  On CPU the idft precision
    is a no-op (fp32 matmuls), so the delta isolates the bf16 y-plane
    store rounding."""
    params = synthetic_params(cfg.model, seed=0)
    ref = Separator(params, cfg).demix_track(audio[:, :44100], seed=3)
    c = dataclasses.replace(
        cfg,
        dsp=dataclasses.replace(cfg.dsp, idft_precision="default"),
        wiener=dataclasses.replace(
            cfg.wiener, impl="pallas_interpret", out_dtype="bfloat16"
        ),
    )
    out = Separator(params, c).demix_track(audio[:, :44100], seed=3)
    assert out.dtype == np.float32  # waves stay f32 regardless
    peak = float(np.abs(ref).max())
    np.testing.assert_allclose(out, ref, atol=2e-2 * peak)

    # round-3 storage knobs: bf16 mask emission (halves the Wiener
    # passes' mask reads) + bf16 post-iDFT frame storage (halves the
    # OLA's streamed traffic) — same rounding class end to end
    c2 = dataclasses.replace(
        c,
        mask_dtype="bfloat16",
        # matmul-DFT path so the bf16 frame storage is actually exercised
        # on CPU (the XLA-FFT branch ignores iframes_dtype)
        dsp=dataclasses.replace(
            c.dsp, iframes_dtype="bfloat16", fft_impl="matmul"
        ),
    )
    out2 = Separator(params, c2).demix_track(audio[:, :44100], seed=3)
    assert out2.dtype == np.float32
    np.testing.assert_allclose(out2, ref, atol=2e-2 * peak)


@pytest.mark.slow
def test_bf16_stems_stack_matches_f32(cfg, audio):
    """The round-4 stems-stack seam: storing the scan's weighted chunk
    stems bf16 (halving the track program's largest allocation) stays
    within bf16 store rounding of the f32 stack — at 25% overlap each
    output sample sums at most two chunk contributions, both in f32,
    so the only error is the per-chunk store quantization.  Output
    waves stay f32."""
    params = synthetic_params(cfg.model, seed=0)
    ref = Separator(params, cfg).demix_track(audio, seed=3)
    c = dataclasses.replace(cfg, stems_stack_dtype="bfloat16")
    out = Separator(params, c).demix_track(audio, seed=3)
    assert out.dtype == np.float32
    peak = float(np.abs(ref).max())
    np.testing.assert_allclose(out, ref, atol=1.5e-2 * peak)
    # and the seam composes with the non-streaming parallel program
    c_ns = dataclasses.replace(
        c, segment=dataclasses.replace(c.segment, streaming=False)
    )
    ref_ns = Separator(
        params, dataclasses.replace(cfg, segment=c_ns.segment)
    ).demix_track(audio, seed=3)
    out_ns = Separator(params, c_ns).demix_track(audio, seed=3)
    np.testing.assert_allclose(out_ns, ref_ns, atol=1.5e-2 * peak)


@pytest.mark.slow
def test_multi_shift_averaging(cfg, audio):
    params = synthetic_params(cfg.model, seed=0)
    s2 = Separator(params, dataclasses.replace(cfg, shifts=2))
    out2 = s2.demix_track(audio[:, :44100], seed=5)
    assert out2.shape == (4, 2, 44100)
    assert np.isfinite(out2).all()
    # averaging N shifted passes must differ from a single pass
    s1 = Separator(params, dataclasses.replace(cfg, shifts=1))
    out1 = s1.demix_track(audio[:, :44100], seed=5)
    assert not np.allclose(out1, out2)


def test_parallel_chunks_variant_matches_host_loop(cfg, audio):
    """demix_fused_parallel IS the non-streaming default (group width
    planner-picked since round 3 — chunk_batch=0 auto, 1549× vs the
    fixed-4 1251×, PERF.md; batched chunks fold into the batch-native
    BLSTM kernel's matmul rows); keep it equal to the host loop."""
    import math

    import jax.numpy as jnp

    from umx_tpu.engine.separator import demix_fused_parallel

    params = synthetic_params(cfg.model, seed=0)
    c = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, streaming=False)
    )
    s = Separator(params, c)
    looped = np.asarray(s.demix(audio, fused=False))
    seg = c.segment.segment_samples(44100)
    stride = c.segment.stride_samples(44100)
    length = audio.shape[1]
    n = max(1, math.ceil(length / stride))
    padded = (n - 1) * stride + seg
    audio_p = jnp.pad(jnp.asarray(audio, jnp.float32), ((0, 0), (0, padded - length)))
    out = np.asarray(demix_fused_parallel(params, audio_p, c, n, seg, stride))
    np.testing.assert_allclose(out[..., :length], looped, atol=1e-5)


@pytest.mark.slow
def test_chunk_batch_config_width_equal(cfg, audio):
    """SegmentConfig.chunk_batch (round 3) picks the non-streaming fused
    group width; any width must produce the same stems as the host loop
    (widths only regroup independent segments).  0 = auto: the HBM
    planner picks the width (suggest_chunk_batch)."""
    params = synthetic_params(cfg.model, seed=0)
    base = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, streaming=False)
    )
    looped = np.asarray(Separator(params, base).demix(audio, fused=False))
    for cb in (0, 1, 3):
        c = dataclasses.replace(
            base, segment=dataclasses.replace(base.segment, chunk_batch=cb)
        )
        out = np.asarray(Separator(params, c).demix(audio, fused=True))
        np.testing.assert_allclose(out, looped, atol=1e-5)


@pytest.mark.slow
def test_stream_groups_matches_scan_program(cfg, audio):
    """The split-phase streaming program (pre/post batched per group,
    ONLY the recurrence chained — kept as an A/B arm via
    ``stream_impl="groups"``; a measured perf negative result on v5e,
    PERF.md round-3 decomposition) must reproduce the sequential
    lax.scan program exactly: stems AND final streaming state, at every
    group width including remainder groups and widths wider than the
    track."""
    import math

    import jax
    import jax.numpy as jnp

    from umx_tpu.engine.separator import (
        demix_fused,
        demix_fused_stream_groups,
    )
    from umx_tpu.models.umx import init_lstm_state

    params = synthetic_params(cfg.model, seed=0)
    seg = cfg.segment.segment_samples(44100)
    stride = cfg.segment.stride_samples(44100)
    length = audio.shape[1]
    n = max(1, math.ceil(length / stride))  # 4 chunks for the 2.5 s fixture
    padded = (n - 1) * stride + seg
    audio_p = jnp.pad(jnp.asarray(audio, jnp.float32), ((0, 0), (0, padded - length)))

    # donate_argnums on the state: give each call its own fresh state
    ref, ref_st = demix_fused(
        params, audio_p, init_lstm_state(cfg.model), cfg, n, seg, stride
    )
    ref, ref_st = np.asarray(ref), jax.tree.map(np.asarray, ref_st)
    for cb in (1, 2, 3, 4, 7):  # 3 = remainder group, 7 > n_chunks
        out, st = demix_fused_stream_groups(
            params, audio_p, init_lstm_state(cfg.model), cfg, n, seg, stride,
            chunk_batch=cb,
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(st.h), ref_st.h, atol=1e-5)
        np.testing.assert_allclose(np.asarray(st.c), ref_st.c, atol=1e-5)

    # the config knob routes the full demix through the groups program
    params2 = synthetic_params(cfg.model, seed=0)
    a = np.asarray(Separator(params2, cfg).demix(audio, fused=True))
    b = np.asarray(
        Separator(params2, cfg.replace(stream_impl="groups")).demix(audio, fused=True)
    )
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_batched_shifts_equal_sequential(cfg, audio):
    """shifts=N auto-batches the N shifted copies through one fused
    program; the result must equal the sequential per-pass host loop."""
    params = synthetic_params(cfg.model, seed=0)
    s = Separator(params, dataclasses.replace(cfg, shifts=3))
    a = audio[:, :44100]
    batched = s.demix_track(a, seed=9)  # auto path (batched when HBM fits)
    sequential = s.demix_track(a, seed=9, fused=False)  # forces host loop
    np.testing.assert_allclose(batched, sequential, atol=2e-4)
    # group splitting must not change the math either
    grouped = s._demix_shifts_batched(
        a,
        [int(o) for o in np.random.default_rng(9).integers(
            0, cfg.segment.max_shift_samples(cfg.dsp.sample_rate), 3
        )],
        cfg.segment.max_shift_samples(cfg.dsp.sample_rate),
        max_batch=2,
    )
    assert grouped.shape == batched.shape
    assert np.isfinite(grouped).all()


def test_resample_option(tmp_path):
    from scipy.io import wavfile

    from umx_tpu.io.audio import UnsupportedAudio, load_audio

    rng = np.random.default_rng(43)
    n48 = 48000
    wav = rng.uniform(-0.5, 0.5, (n48, 2)).astype(np.float32)
    path = str(tmp_path / "x48.wav")
    wavfile.write(path, 48000, wav)
    with pytest.raises(UnsupportedAudio):
        load_audio(path)
    audio = load_audio(path, resample=True)
    assert audio.shape == (2, 44100)  # 1 s at 48k -> 1 s at 44.1k
    assert np.isfinite(audio).all()


def test_mono_input_duplicated(tmp_path):
    from scipy.io import wavfile

    from umx_tpu.io.audio import load_audio

    rng = np.random.default_rng(41)
    mono = rng.uniform(-0.5, 0.5, 5000).astype(np.float32)
    path = str(tmp_path / "mono.wav")
    wavfile.write(path, 44100, mono)
    audio = load_audio(path)
    assert audio.shape == (2, 5000)
    np.testing.assert_array_equal(audio[0], audio[1])


def test_two_wiener_iterations_through_engine(cfg):
    params = synthetic_params(cfg.model, seed=0)
    c = dataclasses.replace(cfg, wiener=dataclasses.replace(cfg.wiener, iterations=2))
    out = np.asarray(Separator(params, c).demix(np.zeros((2, 44100), np.float32) + 0.1))
    assert np.isfinite(out).all()


def test_umxhq_hidden_size_dispatch(tmp_path):
    # a hidden=512-family file must reconfigure the engine automatically
    from umx_tpu.io.ggml import write_ggml
    from umx_tpu.models.umx import synthetic_state_dicts

    from umx_tpu.config import ModelConfig

    mcfg = ModelConfig(hidden_size=96)
    path = str(tmp_path / "hq.bin")
    write_ggml(path, 96, synthetic_state_dicts(mcfg, seed=1))
    sep = Separator.from_ggml(path)
    assert sep.cfg.model.hidden_size == 96
    assert sep.params.hidden_size == 96
    assert sep.params.lstm_hidden == 48


def test_cli_end_to_end(tmp_path, cfg, audio):
    from scipy.io import wavfile

    from umx_tpu import cli
    from umx_tpu.io.ggml import write_ggml
    from umx_tpu.models.umx import synthetic_state_dicts

    model_path = str(tmp_path / "model.bin.gz")
    write_ggml(model_path, cfg.model.hidden_size, synthetic_state_dicts(cfg.model, seed=0))

    wav_path = str(tmp_path / "mix.wav")
    wavfile.write(wav_path, 44100, np.ascontiguousarray(audio[:, :44100].T))

    out_dir = str(tmp_path / "out")
    rc = cli.main(
        [model_path, wav_path, out_dir, "--quiet", "--segment-secs", "1.0", "--shifts", "0"]
    )
    assert rc == 0
    for i in range(4):
        path = os.path.join(out_dir, f"target_{i}.wav")
        assert os.path.exists(path)
        rate, data = wavfile.read(path)
        assert rate == 44100
        assert data.shape == (44100, 2)
        assert np.isfinite(data).all()


def test_cli_ab_knob_flags(tmp_path, cfg, audio):
    """Round-3 A/B knob exposure: every recorded-negative-result arm and
    impl choice is drivable from the CLI (ROADMAP "CLI exposure for
    istft/wiener A/B knobs"), and the one semantically impossible combo
    (umxcpp PSD quirk on the Pallas kernels) is an explicit usage error
    instead of a silent einsum fallback."""
    from scipy.io import wavfile

    from umx_tpu import cli
    from umx_tpu.io.ggml import write_ggml
    from umx_tpu.models.umx import synthetic_state_dicts

    # conflict guard fires before any file IO
    rc = cli.main(
        ["m.bin", "x.wav", "o", "--wiener-psd", "umxcpp", "--wiener-impl", "pallas"]
    )
    assert rc == 2

    model_path = str(tmp_path / "model.bin.gz")
    write_ggml(model_path, cfg.model.hidden_size, synthetic_state_dicts(cfg.model, seed=0))
    wav_path = str(tmp_path / "mix.wav")
    wavfile.write(wav_path, 44100, np.ascontiguousarray(audio[:, :44100].T))

    out_dir = str(tmp_path / "out")
    rc = cli.main(
        [model_path, wav_path, out_dir, "--quiet", "--segment-secs", "1.0",
         "--shifts", "0", "--wiener-impl", "einsum", "--lstm-impl", "scan",
         "--stream-impl", "groups", "--wiener-out-dtype", "float32",
         "--chunk-batch", "2"]
    )
    assert rc == 0
    for i in range(4):
        path = os.path.join(out_dir, f"target_{i}.wav")
        assert os.path.exists(path)
        _, data = wavfile.read(path)
        assert np.isfinite(data).all()


def test_host_only_cfg_fields_do_not_recompile():
    # ADVICE r1 (medium): shifts / max_shift_secs are host-only; changing
    # them must not retrigger a device compile of the segment program.
    import jax.numpy as jnp

    from umx_tpu.engine import separator as sep
    from umx_tpu.models.umx import init_lstm_state

    cfg1 = EngineConfig(model=ModelConfig(hidden_size=32), shifts=1)
    cfg2 = cfg1.replace(shifts=5)
    cfg3 = cfg1.replace(
        segment=dataclasses.replace(cfg1.segment, max_shift_secs=0.25)
    )
    assert sep._device_cfg(cfg1) == sep._device_cfg(cfg2) == sep._device_cfg(cfg3)

    params = synthetic_params(cfg1.model, seed=0)
    st = init_lstm_state(cfg1.model)
    n = 4096 * 2
    audio = jnp.zeros((2, n), jnp.float32)
    before = sep._segment_forward_jit._cache_size()
    out1, _ = sep.segment_forward(params, audio, st, cfg1, n)
    mid = sep._segment_forward_jit._cache_size()
    out2, _ = sep.segment_forward(params, audio, st, cfg2, n)
    sep.segment_forward(params, audio, st, cfg3, n)
    after = sep._segment_forward_jit._cache_size()
    assert mid == before + 1
    assert after == mid  # no recompiles for host-only field changes
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


@pytest.mark.slow
def test_stream_pipelined_matches_scan_program(cfg, audio):
    """The cross-chunk layer-pipelined streaming program (iteration i
    runs L1(chunk i) | L2(chunk i-1) | L3(chunk i-2) as one merged
    kernel call — ``stream_impl="pipelined"``) must reproduce the
    sequential scan program: stems AND final streaming state.  Both
    sides run the merged kernel (interpret mode on CPU) so the
    comparison isolates the SCHEDULE, not the kernel's bf16 hh cast."""
    import math

    import jax
    import jax.numpy as jnp

    from umx_tpu.engine.separator import (
        demix_fused,
        demix_fused_stream_pipelined,
    )
    from umx_tpu.models.umx import init_lstm_state

    c = cfg.replace(model=dataclasses.replace(cfg.model, lstm_impl="pallas_interpret"))
    params = synthetic_params(c.model, seed=0)
    seg = c.segment.segment_samples(44100)
    stride = c.segment.stride_samples(44100)
    length = audio.shape[1]
    n = max(1, math.ceil(length / stride))  # 4 chunks for the 2.5 s fixture
    padded = (n - 1) * stride + seg
    audio_p = jnp.pad(jnp.asarray(audio, jnp.float32), ((0, 0), (0, padded - length)))

    ref, ref_st = demix_fused(
        params, audio_p, init_lstm_state(c.model), c, n, seg, stride
    )
    ref, ref_st = np.asarray(ref), jax.tree.map(np.asarray, ref_st)
    out, st = demix_fused_stream_pipelined(
        params, audio_p, init_lstm_state(c.model), c, n, seg, stride
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.h), ref_st.h, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.c), ref_st.c, atol=1e-5)

    # a NONZERO incoming state must thread into the right layer-stages
    # at pipeline fill (chunk 0's layer l starts from state[:, l])
    rng = np.random.default_rng(7)
    sh = init_lstm_state(c.model).h.shape
    h_np = rng.standard_normal(sh).astype(np.float32) * 0.1
    c_np = rng.standard_normal(sh).astype(np.float32) * 0.1
    # demix_fused DONATES its state arg — each call gets its own copy
    mk_st = lambda: dataclasses.replace(
        init_lstm_state(c.model), h=jnp.asarray(h_np), c=jnp.asarray(c_np)
    )
    ref2, ref2_st = demix_fused(params, audio_p, mk_st(), c, n, seg, stride)
    out2, st2 = demix_fused_stream_pipelined(params, audio_p, mk_st(), c, n, seg, stride)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.h), np.asarray(ref2_st.h), atol=1e-5)

    # the config knob routes the full demix through the pipelined program
    params2 = synthetic_params(c.model, seed=0)
    o_scan = Separator(params2, c).demix(audio, fused=True)
    o_pipe = Separator(params2, c.replace(stream_impl="pipelined")).demix(
        audio, fused=True
    )
    np.testing.assert_allclose(o_pipe, o_scan, atol=1e-5)
