"""The demixing engine: jitted per-segment pipeline + track orchestration.

Equivalent of the reference's inference.cpp (per-segment forward) and
umx.cpp's split/shift orchestrators, re-designed TPU-first:

* One jitted function runs STFT → mask network (targets vmapped) →
  optional Wiener-EM → iSTFT for a fixed-size segment, so the whole hot
  path compiles once and a track's tensors stay in HBM end to end.
* Segments are always full-length: the final partial chunk is
  zero-padded instead of reusing stale full-segment buffers (the
  reference's benign-by-luck resize, SURVEY §2f) — fixed shapes keep XLA
  happy and the triangular overlap-add weights are unchanged over the
  valid region.
* Streaming LSTM state is an explicit carry threaded between segment
  calls (reference: persistent lstm_data arenas, umx.cpp:167-171).
* The Demucs shift trick uses a seedable jax PRNG instead of unseeded
  libc rand() (umx.cpp:112-122).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from umx_tpu.config import EngineConfig
from umx_tpu.models.umx import (
    LSTMState,
    UMXParams,
    init_lstm_state,
    resolve_lstm_impl,
    umx_forward,
    umx_post,
    umx_pre,
    umx_recurrence,
    umx_recurrence_pipelined_step,
)
from umx_tpu.ops import stft as stft_ops
from umx_tpu.ops.qmatmul import QTensor
from umx_tpu.ops.wiener import wiener_filter_masks

Array = jax.Array


def crop_stack(mag: Array, nb_bins_cropped: int) -> Array:
    """(2, T, F) magnitudes → (T, 2*crop) stacked-stereo network input
    (inference.cpp:41-68: left bins then right bins)."""
    cropped = mag[:, :, :nb_bins_cropped]  # (2, T, crop)
    return jnp.concatenate([cropped[0], cropped[1]], axis=-1)


def masks_to_planes(masks: Array, n_bins: int) -> Array:
    """Network-layout masks (T#, T, 2*n_bins) → channel planes
    (T#, 2, T, n_bins) — THE canonical reshape between the stacked-stereo
    mask output and spectrogram-shaped tensors."""
    m = masks.reshape(masks.shape[0], masks.shape[1], 2, n_bins)  # (T#, T, 2, F)
    return jnp.transpose(m, (0, 2, 1, 3))  # (T#, 2, T, F)


def apply_masks(masks: Array, mag: Array, n_bins: int) -> Array:
    """masks (T#, T, 2*n_bins) ⊙ mix magnitude (2, T, n_bins) →
    per-target magnitudes (T#, 2, T, n_bins) (inference.cpp:168-185)."""
    return masks_to_planes(masks, n_bins) * mag[None]


def _resolve_mask_dtype(cfg: EngineConfig):
    choice = getattr(cfg, "mask_dtype", "auto")
    if choice == "auto":
        return (
            jnp.bfloat16
            if jax.default_backend() not in ("cpu",)
            else jnp.float32
        )
    return jnp.dtype(choice)


def _resolve_stems_stack_dtype(cfg: EngineConfig):
    """Storage dtype for the fused-track stacked weighted chunk stems
    (the scan output feeding overlap-add) — see
    ``EngineConfig.stems_stack_dtype``."""
    choice = getattr(cfg, "stems_stack_dtype", "auto")
    if choice == "auto":
        return (
            jnp.bfloat16
            if jax.default_backend() not in ("cpu",)
            else jnp.float32
        )
    return jnp.dtype(choice)


def _segment_pre_impl(
    params: UMXParams, audio: Array, cfg: EngineConfig
) -> tuple[Array, Array, Array]:
    """State-FREE front half of the segment pipeline: STFT → magnitude →
    crop/stack → network phase 1 (input norm + fc1 + bn1 + tanh).

    audio: (2, n) → (re, im (2, T, F) spectrogram planes, x1 (T#, T, H)
    recurrence input).  Because nothing here touches LSTM state, the
    split-phase streaming orchestrator runs this batched across chunk
    groups (only :func:`umx_recurrence` is chained)."""
    mcfg, dcfg = cfg.model, cfg.dsp
    # The pipeline runs on (re, im) float32 planes end to end — XLA
    # materializes complex64 as strided pairs, so staying real avoids
    # interleave/deinterleave passes between STFT, Wiener, and iSTFT.
    re, im = stft_ops.stft_planes(audio, dcfg)  # (2, T, F)
    mag = jnp.sqrt(re * re + im * im)
    x = crop_stack(mag, mcfg.nb_bins_cropped)
    x1 = umx_pre(params, x, mcfg, cfg.matmul_precision)
    return re, im, x1


def _segment_post_impl(
    params: UMXParams,
    re: Array,
    im: Array,
    x1: Array,
    lstm_out: Array,
    cfg: EngineConfig,
    n_samples: int,
) -> Array:
    """State-free back half: network phase 3 (masks) → Wiener (or naive
    mix-phase) → iSTFT.  Returns waveforms (T#, 2, n_samples)."""
    mcfg = cfg.model
    masks = umx_post(params, x1, lstm_out, mcfg, cfg.matmul_precision)
    # inference-seam mask storage dtype (bf16 on TPU halves the Wiener
    # passes' mask reads; the downcast fuses into the bn3/relu epilogue)
    masks = masks.astype(_resolve_mask_dtype(cfg))

    if cfg.use_wiener:
        # masks go straight into the filter in network layout — the
        # (T#, 2, T, F) magnitude tensor never materializes on the
        # Pallas path (y_init = mask * x algebraically)
        tre, tim = wiener_filter_masks(re, im, masks, mcfg.n_bins, cfg.wiener)
    else:
        # naive mix-phase reconstruction (the reference's original
        # no-wiener release, README.md:38-44); same identity applies:
        # mag * unit(x) = mask * x
        m = masks_to_planes(masks, mcfg.n_bins)
        tre = m * re[None]
        tim = m * im[None]

    return stft_ops.istft_planes(tre, tim, n_samples, cfg.dsp)  # (T#, 2, n)


def _segment_forward_impl(
    params: UMXParams,
    audio: Array,
    state: LSTMState,
    cfg: EngineConfig,
    n_samples: int,
) -> tuple[Array, LSTMState]:
    """Demix one fixed-size segment (traceable; see jitted wrapper
    :func:`segment_forward`).

    audio: (2, n_samples) → (waveforms (T#, 2, n_samples), new LSTM state).
    The full reference per-segment pipeline (inference.cpp:12-207) in one
    XLA program, composed from the state-free pre/post phases around the
    state-carrying recurrence.
    """
    re, im, x1 = _segment_pre_impl(params, audio, cfg)
    lstm_out, new_state = umx_recurrence(
        params, x1, state, cfg.model, cfg.matmul_precision
    )
    waves = _segment_post_impl(params, re, im, x1, lstm_out, cfg, n_samples)
    return waves, new_state


def _vmap_cfg(cfg: EngineConfig, batch_size: int) -> EngineConfig:
    """Config for BATCHED (vmapped) segment/track instances.

    Historically this downgraded ``lstm_impl="auto"`` to the scan BLSTM
    because vmap-over-Pallas serializes the kernel grid.  The merged
    kernel is now batch-native — its custom_vmap rule folds mapped axes
    into extra MXU matmul rows through the shared per-chain weights
    (ops/lstm_pallas.py), which keeps kernel-grade recurrence latency at
    any batch size — so batched instances use the same ``auto``
    resolution as single ones.  Kept as the single seam where a batched
    config could diverge again."""
    del batch_size
    return cfg


@functools.lru_cache(maxsize=256)
def _device_cfg(cfg: EngineConfig) -> EngineConfig:
    """Canonicalize the jit static key: zero out host-only fields so
    byte-identical device programs share one compilation.

    ``shifts`` and ``segment.max_shift_secs`` are consumed exclusively by
    the host-side :meth:`Separator.demix_track` loop; without this, a
    request changing shifts (e.g. serve.py per-request overrides) would
    recompile the entire fused-track program — minutes on a remote-compile
    backend — for an identical computation.
    """
    # chunk_batch and window_chunks are canonicalized too: the parallel
    # and windowed paths receive them as their own static arguments, so
    # leaving them in the key would recompile streaming/segment programs
    # that never read them.
    return dataclasses.replace(
        cfg,
        shifts=0,
        segment=dataclasses.replace(
            cfg.segment, max_shift_secs=0.0, chunk_batch=4, window_chunks=0
        ),
    )


_segment_forward_jit = jax.jit(
    _segment_forward_impl, static_argnames=("cfg", "n_samples")
)


def segment_forward(params, audio, state, cfg: EngineConfig, n_samples: int):
    """Jitted single-segment demix (see :func:`_segment_forward_impl`)."""
    return _segment_forward_jit(params, audio, state, _device_cfg(cfg), n_samples)


def _demix_fused_impl(
    params: UMXParams,
    audio_p: Array,
    state: LSTMState,
    cfg: EngineConfig,
    n_chunks: int,
    seg: int,
    stride: int,
) -> tuple[Array, LSTMState]:
    """Whole-track demix as ONE XLA program: lax.scan over segments with
    the streaming LSTM carry, triangular overlap-add accumulated on
    device inside the scan.  This is the BASELINE.json north-star shape
    — a track enters HBM once and leaves as 4 stems — and it collapses
    the per-segment host dispatches (expensive over a remote TPU tunnel)
    into a single call.

    audio_p: (2, padded_len) where padded_len = (n_chunks-1)*stride + seg.
    Returns ((T#, 2, padded_len) normalized stems, final LSTM state).
    """
    padded_len = audio_p.shape[-1]
    weight = _transition_weight(seg, cfg.segment.transition_power)
    zero_state = jax.tree.map(jnp.zeros_like, state)

    sdt = _resolve_stems_stack_dtype(cfg)

    def body(st, i):
        chunk = jax.lax.dynamic_slice(audio_p, (0, i * stride), (2, seg))
        chunk_out, new_st = _segment_forward_impl(params, chunk, st, cfg, seg)
        return (new_st if cfg.segment.streaming else zero_state), (
            weight * chunk_out
        ).astype(sdt)

    # The scan emits stacked weighted chunk outputs; carrying the big
    # overlap-add buffers through the scan instead costs a full-buffer
    # copy per iteration (~0.5 GB/segment at 60 s — measured 7x slowdown).
    final_state, ys = jax.lax.scan(body, state, jnp.arange(n_chunks))
    # ys: (n_chunks, T#, 2, seg)

    return _normalized_overlap_add(ys, weight, stride, padded_len, cfg), final_state


def _normalized_overlap_add(
    ys: Array, weight: Array, stride: int, padded_len: int, cfg: EngineConfig
) -> Array:
    """Weighted-chunk overlap-add + weight-sum normalization.

    On accelerator backends this runs as ONE Pallas streaming pass
    (ops/ola_pallas.py) — the XLA expression of the same math costs a
    combine pass, a chunk-major→time-major transpose copy with bad TPU
    tiling, and a divide pass (~7× off the HBM roofline, PERF.md).
    """
    n_chunks, *mid, seg = ys.shape
    sw = _overlap_add_chunks(
        jnp.broadcast_to(weight, (n_chunks, seg)), stride, padded_len
    )
    choice = "unroll" if cfg.ola_impl == "auto" else cfg.ola_impl
    if choice in ("pallas", "pallas_interpret", "xla_dus"):
        # kept as measured A/B variants (PERF.md: pallas DMA 52 ms,
        # xla_dus 69 ms at 420 s scale — the 44.1 kHz row misalignment
        # taxes every layout-changing approach); the kernels are
        # f32-only, so a bf16 stems stack upcasts at the seam
        from umx_tpu.ops.ola_pallas import overlap_add_normalized

        out = overlap_add_normalized(
            ys.astype(jnp.float32), 1.0 / sw, stride, padded_len,
            impl="xla_dus" if choice == "xla_dus" else "pallas",
            interpret=choice == "pallas_interpret",
        )
        if out is not None:
            return out
        choice = "unroll"
    if choice == "unroll":
        # statically unrolled slice-adds: no transpose, no scatter, and —
        # unlike hop-strided .at[].add patterns — no XLA conv-rewrite.
        # Fastest measured (24 ms vs 42 pad+sum at 420 s, PERF.md) and
        # valid for ANY overlap geometry.  The accumulator is always f32
        # (a bf16 stems stack upcasts in the adds; the stems written out
        # stay f32).
        out = jnp.zeros((*mid, padded_len), jnp.float32)
        for k in range(n_chunks):
            out = out.at[..., k * stride : k * stride + seg].add(
                ys[k].astype(jnp.float32)
            )
        return out / sw
    return _overlap_add_chunks(ys.astype(jnp.float32), stride, padded_len) / sw


def _overlap_add_chunks(ys: Array, stride: int, padded_len: int) -> Array:
    """Overlap-add chunks ``(n_chunks, ..., seg)`` at offsets ``k*stride``
    without scatter ops.

    For overlap ≤ 50% (seg - stride ≤ stride, true for the 25% default)
    each chunk splits at the stride boundary: the head pieces tile the
    output directly, and the tails (zero-padded to one stride) land one
    stride later — two vectorized adds total.  Falls back to a fori_loop
    of dynamic updates for exotic overlaps.
    """
    n_chunks, *mid, seg = ys.shape
    tail_len = seg - stride
    if tail_len > stride:
        def add(k, acc):
            upd = jax.lax.dynamic_slice(
                acc, (0,) * (acc.ndim - 1) + (k * stride,), (*mid, seg)
            )
            return jax.lax.dynamic_update_slice(
                acc, upd + ys[k], (0,) * (acc.ndim - 1) + (k * stride,)
            )

        init = jnp.zeros((*mid, padded_len), ys.dtype)
        return jax.lax.fori_loop(0, n_chunks, add, init)

    # Chunk k's head occupies [k*stride, (k+1)*stride) and its tail
    # [(k+1)*stride, ...), i.e. head_k overlaps exactly tail_{k-1}.
    # Summing heads with the chunk-shifted tails FIRST — while still in
    # the scan's chunk-major layout — leaves ONE transposed reshape to
    # interleave to the time axis.  (The previous two-transpose form
    # materialized two (n_chunks, ..., stride) layout copies; at batched
    # whole-track scale those were the largest allocations in the
    # program, one with 1.6x tiling-padding expansion.)  No strided
    # .at[].add anywhere — XLA:TPU rewrites that pattern into a slow
    # convolution fusion.
    tails = jnp.pad(
        ys[..., stride:], [(0, 0)] * (ys.ndim - 1) + [(0, stride - tail_len)]
    )  # (n_chunks, ..., stride)
    combined = ys[..., :stride] + jnp.concatenate(
        [jnp.zeros_like(tails[:1]), tails[:-1]], axis=0
    )
    flat = jnp.moveaxis(combined, 0, -2).reshape(*mid, n_chunks * stride)
    # the last chunk's tail extends past n_chunks*stride
    out = jnp.concatenate([flat, tails[-1]], axis=-1)
    return out[..., :padded_len]


_demix_fused_jit = jax.jit(
    _demix_fused_impl,
    static_argnames=("cfg", "n_chunks", "seg", "stride"),
    donate_argnums=(2,),
)


def demix_fused(params, audio_p, state, cfg: EngineConfig, n_chunks: int, seg: int, stride: int):
    """Jitted whole-track fused demix (see :func:`_demix_fused_impl`)."""
    return _demix_fused_jit(params, audio_p, state, _device_cfg(cfg), n_chunks, seg, stride)


def _demix_windowed_impl(
    params: UMXParams,
    audio_w: Array,
    state: LSTMState,
    tail: Array,
    tail_w: Array,
    cfg: EngineConfig,
    W: int,
    seg: int,
    stride: int,
    chunk_batch: int = 1,
) -> tuple[Array, Array, Array, LSTMState]:
    """One W-chunk WINDOW of the windowed-fused track mode: the unit
    program that makes arbitrary track length run at fused-program
    throughput (the 60-minute single fused program RESOURCE_EXHAUSTs;
    the host chunk loop pays per-dispatch overhead on a remote tunnel).

    Two carries chain windows into an exact fused track:

    * the streaming LSTM state (exactly as chunks chain inside
      :func:`_demix_fused_impl`'s scan), and
    * the overlap-add BOUNDARY: the window's last chunk extends
      ``seg - stride`` samples past its output region, so those samples'
      UNNORMALIZED stem accumulation + weight sum (``tail``, ``tail_w``)
      pass to the next window, which adds them at its start before
      normalizing.  At <=50% overlap every output sample sums the same
      addends as the single-program overlap-add, so windowed == fused to
      float-add reassociation (bit-equal for the 25% default, where each
      sample has exactly the same two contributions).

    audio_w: (2, (W-1)*stride + seg).  Returns (normalized stems for the
    window's first W*stride samples, next tail, next tail_w, next
    state).  Non-streaming configs run the window interior as vmapped
    ``chunk_batch``-wide segment groups (the parallel program's shape,
    :func:`_demix_fused_parallel_impl`); the state passes through.
    """
    padded_w = (W - 1) * stride + seg
    weight = _transition_weight(seg, cfg.segment.transition_power)
    sdt = _resolve_stems_stack_dtype(cfg)

    if cfg.segment.streaming:
        def body(st, i):
            chunk = jax.lax.dynamic_slice(audio_w, (0, i * stride), (2, seg))
            chunk_out, new_st = _segment_forward_impl(params, chunk, st, cfg, seg)
            return new_st, (weight * chunk_out).astype(sdt)

        final_state, ys = jax.lax.scan(body, state, jnp.arange(W))
    else:
        cb = max(1, min(chunk_batch, W))
        vcfg = _vmap_cfg(cfg, cb)
        seg_state = init_lstm_state(cfg.model)
        groups = []
        for g in range(-(-W // cb)):
            k0 = g * cb
            width = min(cb, W - k0)
            chunks = jnp.stack(
                [
                    jax.lax.dynamic_slice(audio_w, (0, k * stride), (2, seg))
                    for k in range(k0, k0 + width)
                ]
            )
            outs, _ = jax.vmap(
                lambda a: _segment_forward_impl(params, a, seg_state, vcfg, seg)
            )(chunks)
            groups.append(outs)
        ys = (jnp.concatenate(groups, axis=0) * weight).astype(sdt)
        final_state = state

    # unnormalized overlap-add (the shipping unrolled form — no strided
    # scatter, no transpose; see _normalized_overlap_add) + weight sum,
    # then inject the carried boundary before normalizing
    acc = jnp.zeros((*ys.shape[1:-1], padded_w), jnp.float32)
    for k in range(W):
        acc = acc.at[..., k * stride : k * stride + seg].add(
            ys[k].astype(jnp.float32)
        )
    wsum = _overlap_add_chunks(
        jnp.broadcast_to(weight, (W, seg)), stride, padded_w
    )
    tail_len = padded_w - W * stride  # == seg - stride
    if tail_len:
        acc = acc.at[..., :tail_len].add(tail)
        wsum = wsum.at[:tail_len].add(tail_w)
    out = acc[..., : W * stride] / wsum[: W * stride]
    return out, acc[..., W * stride :], wsum[W * stride :], final_state


_demix_windowed_jit = jax.jit(
    _demix_windowed_impl,
    static_argnames=("cfg", "W", "seg", "stride", "chunk_batch"),
    donate_argnums=(2, 3, 4),
)


def demix_windowed_window(
    params, audio_w, state, tail, tail_w,
    cfg: EngineConfig, W: int, seg: int, stride: int, chunk_batch: int = 1,
):
    """Jitted one-window step (see :func:`_demix_windowed_impl`)."""
    return _demix_windowed_jit(
        params, audio_w, state, tail, tail_w,
        _device_cfg(cfg), W, seg, stride, chunk_batch,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_chunks", "seg", "stride", "chunk_batch"),
    donate_argnums=(2,),
)
def _demix_fused_stream_groups_jit(
    params: UMXParams,
    audio_p: Array,
    state: LSTMState,
    cfg: EngineConfig,
    n_chunks: int,
    seg: int,
    stride: int,
    chunk_batch: int = 4,
) -> tuple[Array, LSTMState]:
    """STREAMING whole-track demix with the state chain narrowed to the
    recurrence only (split-phase execution) — a measured NEGATIVE result
    on v5e, kept as an A/B arm (``EngineConfig.stream_impl="groups"``).

    Chunks run in groups of ``chunk_batch``: the state-free pre half
    (STFT+fc1) and post half (masks+Wiener+iSTFT) are vmapped across the
    group; only per-chunk :func:`umx_recurrence` calls ride the
    streaming state chain.  Semantics are EXACTLY the reference's
    streaming LSTM (state flows chunk k → k+1 in order, umx.cpp:167-171);
    only the schedule changes — asserted equal to the scan program
    (stems AND final state) in tests/test_engine.py.

    Why it does NOT beat the scan (PERF.md round-3 decomposition): the
    chain itself costs ~0 (recB chained == unchained, 26.6 ms/chunk),
    the scan program already runs at the sum of its phase costs, and on
    a serially-executing TPU core batching helps only ops that
    underutilize their unit per call — i.e. the issue-bound B=1 LSTM
    kernel, the one phase streaming forbids folding.  The group-concat
    overlap-add form adds ~1.3 ms/chunk on top: 45.2 vs 41.6 ms/chunk.
    """
    assert cfg.segment.streaming, "split-phase groups are the streaming path"
    padded_len = audio_p.shape[-1]
    weight = _transition_weight(seg, cfg.segment.transition_power)
    mcfg = cfg.model

    st = state
    ys = []
    n_groups = -(-n_chunks // chunk_batch)
    for g in range(n_groups):
        k0 = g * chunk_batch
        # the remainder group runs at its natural width (no duplicated
        # segment compute; all groups unroll into this one program)
        width = min(chunk_batch, n_chunks - k0)
        chunks = jnp.stack(
            [
                jax.lax.dynamic_slice(audio_p, (0, k * stride), (2, seg))
                for k in range(k0, k0 + width)
            ]
        )
        res, ims, x1s = jax.vmap(lambda a: _segment_pre_impl(params, a, cfg))(chunks)
        lstm_outs = []
        for k in range(width):
            lstm_out, st = umx_recurrence(
                params, x1s[k], st, mcfg, cfg.matmul_precision
            )
            lstm_outs.append(lstm_out)
        lstm_outs = jnp.stack(lstm_outs)
        waves = jax.vmap(
            lambda r, i, x1, lo: _segment_post_impl(params, r, i, x1, lo, cfg, seg)
        )(res, ims, x1s, lstm_outs)
        ys.append(waves)

    ys = (jnp.concatenate(ys, axis=0) * weight).astype(
        _resolve_stems_stack_dtype(cfg)
    )  # (n_chunks, T#, 2, seg)
    return _normalized_overlap_add(ys, weight, stride, padded_len, cfg), st


def demix_fused_stream_groups(
    params, audio_p, state, cfg: EngineConfig, n_chunks: int, seg: int, stride: int,
    chunk_batch: int = 4,
):
    """Jitted split-phase streaming whole-track demix (see impl above)."""
    return _demix_fused_stream_groups_jit(
        params, audio_p, state, _device_cfg(cfg), n_chunks, seg, stride, chunk_batch
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_chunks", "seg", "stride")
)
def _demix_fused_stream_pipelined_jit(
    params: UMXParams,
    audio_p: Array,
    state: LSTMState,
    cfg: EngineConfig,
    n_chunks: int,
    seg: int,
    stride: int,
) -> tuple[Array, LSTMState]:
    """STREAMING whole-track demix with the recurrence LAYER-PIPELINED
    across the chunk sequence (``EngineConfig.stream_impl="pipelined"``).

    Iteration i runs L1(chunk i) | L2(chunk i-1) | L3(chunk i-2) as ONE
    merged-kernel call (chains stacked into the kernel's weight-distinct
    chain axis, R = stages*targets*2 — models/umx.py::
    umx_recurrence_pipelined_step).  Semantics are EXACTLY the
    reference's streaming LSTM (state flows chunk k → k+1 per layer, in
    order, umx.cpp:167-171); only the schedule changes — asserted equal
    to the scan program (stems AND final state) in tests/test_engine.py.

    Pipeline fill/drain adds L-1 = 2 partial iterations; edge iterations
    stack only their ACTIVE stages (R = 8/16/24), so no wasted chain
    compute — at most 3 kernel shapes compile.  Whether the fused R=24
    step beats 3 serial R=8 steps is the latency-hiding question
    scripts/lstm_pipeline_probe.py measures standalone.
    """
    assert cfg.segment.streaming, "the pipelined schedule is the streaming path"
    padded_len = audio_p.shape[-1]
    weight = _transition_weight(seg, cfg.segment.transition_power)
    mcfg = cfg.model
    L = mcfg.n_lstm_layers
    # the pipelined stage call IS the merged kernel (stacked chains);
    # off-TPU it runs in interpret mode (slow, correct — tests/CPU A/B)
    impl = resolve_lstm_impl(mcfg.lstm_impl)
    interpret = impl != "pallas_merged"

    pre_buf = {}  # chunk k -> (re, im, x1), alive until its post runs
    stage_in = {}  # (layer l, chunk k) -> layer input, alive one iteration
    stage_st = {
        l: (state.h[:, l], state.c[:, l]) for l in range(L)
    }  # per-layer streaming chain, flows iteration -> iteration
    ys: list = [None] * n_chunks
    for i in range(n_chunks + L - 1):
        if i < n_chunks:
            chunk = jax.lax.dynamic_slice(audio_p, (0, i * stride), (2, seg))
            re_, im_, x1_ = _segment_pre_impl(params, chunk, cfg)
            pre_buf[i] = (re_, im_, x1_)
            stage_in[(0, i)] = x1_
        layers, inputs, states = [], [], []
        for l in range(L):
            k = i - l
            if 0 <= k < n_chunks:
                layers.append(l)
                inputs.append(stage_in.pop((l, k)))
                states.append(stage_st[l])
        outs, new_states = umx_recurrence_pipelined_step(
            params, inputs, states, layers, mcfg, cfg.matmul_precision, interpret
        )
        for s, l in enumerate(layers):
            k = i - l
            stage_st[l] = new_states[s]
            if l + 1 < L:
                stage_in[(l + 1, k)] = outs[s]
            else:
                re_, im_, x1_ = pre_buf.pop(k)
                ys[k] = _segment_post_impl(
                    params, re_, im_, x1_, outs[s], cfg, seg
                )

    ys_arr = (jnp.stack(ys) * weight).astype(
        _resolve_stems_stack_dtype(cfg)
    )  # (n_chunks, T#, 2, seg)
    final = LSTMState(
        h=jnp.stack([stage_st[l][0] for l in range(L)], axis=1),
        c=jnp.stack([stage_st[l][1] for l in range(L)], axis=1),
    )
    return _normalized_overlap_add(ys_arr, weight, stride, padded_len, cfg), final


def demix_fused_stream_pipelined(
    params, audio_p, state, cfg: EngineConfig, n_chunks: int, seg: int, stride: int
):
    """Jitted layer-pipelined streaming whole-track demix (impl above)."""
    return _demix_fused_stream_pipelined_jit(
        params, audio_p, state, _device_cfg(cfg), n_chunks, seg, stride
    )


def _demix_fused_parallel_impl(
    params: UMXParams,
    audio_p: Array,
    cfg: EngineConfig,
    n_chunks: int,
    seg: int,
    stride: int,
    chunk_batch: int = 4,
) -> Array:
    """Whole-track demix with segments processed in PARALLEL batches.

    Only valid for non-streaming configs (LSTM state resets per segment,
    the reference's original-release behavior, README.md:38-44): without
    the cross-segment carry every segment is independent, and batching
    them amortizes the BLSTM's dependent-matmul latency floor — which is
    independent of batch width (PERF.md microbenchmark) — across the
    whole track.  Segments run in groups of ``chunk_batch`` to bound the
    Wiener stage's memory.
    """
    assert not cfg.segment.streaming, "parallel segments require streaming=False"
    cfg = _vmap_cfg(cfg, chunk_batch)  # batch-native BLSTM kernel folds chunk rows
    padded_len = audio_p.shape[-1]
    weight = _transition_weight(seg, cfg.segment.transition_power)
    state = init_lstm_state(cfg.model)

    n_groups = -(-n_chunks // chunk_batch)
    ys = []
    for g in range(n_groups):
        k0 = g * chunk_batch
        # the remainder group runs at its NATURAL width — all groups
        # unroll into this one jitted program, so a narrower final vmap
        # costs no extra compile and no duplicated segment compute (the
        # old form re-ran the final chunk up to chunk_batch-1 extra times)
        width = min(chunk_batch, n_chunks - k0)
        chunks = jnp.stack(
            [
                jax.lax.dynamic_slice(audio_p, (0, k * stride), (2, seg))
                for k in range(k0, k0 + width)
            ]
        )
        outs, _ = jax.vmap(
            lambda a: _segment_forward_impl(params, a, state, cfg, seg)
        )(chunks)
        ys.append(outs)
    ys = (jnp.concatenate(ys, axis=0) * weight).astype(
        _resolve_stems_stack_dtype(cfg)
    )  # (n_chunks, T#, 2, seg)

    return _normalized_overlap_add(ys, weight, stride, padded_len, cfg)


_demix_fused_parallel_jit = functools.partial(jax.jit, static_argnames=(
    "cfg", "n_chunks", "seg", "stride", "chunk_batch"
))(_demix_fused_parallel_impl)


def demix_fused_parallel(
    params, audio_p, cfg: EngineConfig, n_chunks: int, seg: int, stride: int, chunk_batch: int = 4
):
    """Jitted whole-track parallel-segments demix (non-streaming configs)."""
    return _demix_fused_parallel_jit(
        params, audio_p, _device_cfg(cfg), n_chunks, seg, stride, chunk_batch
    )


@functools.partial(jax.jit, static_argnames=("segment_samples", "power"))
def _transition_weight(segment_samples: int, power: float) -> Array:
    """Demucs triangular cross-fade weight (umx.cpp:196-206)."""
    half = segment_samples // 2
    up = jnp.arange(1, half + 1, dtype=jnp.float32)
    w = jnp.concatenate([up, up[::-1]])
    if segment_samples % 2:  # odd length: plateau at the max (matches ref for even)
        w = jnp.concatenate([up, up[-1:], up[::-1]])
    w = w / w.max()
    return w**power


@jax.jit
def _finalize(out, sum_weight):
    return out / sum_weight


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_window(res, piece, offset):
    """Write one window's stems into the donated full-track result
    buffer (windowed-fused device mode: one resident output, no
    concat double-buffer)."""
    return jax.lax.dynamic_update_slice(res, piece, (0, 0, offset))


@functools.partial(jax.jit, static_argnames=("seg",))
def _chunk_at(audio_p, offset, seg: int):
    return jax.lax.dynamic_slice(audio_p, (0, offset), (2, seg))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _accumulate(out, sum_weight, chunk_out, weight, offset):
    """Weighted overlap-add of one full chunk at a dynamic offset
    (umx.cpp:234-259).  The output buffers are sized for the zero-padded
    track, so every chunk is full-length; samples past the real track end
    are trimmed by the caller."""
    seg = chunk_out.shape[-1]
    upd = jax.lax.dynamic_slice(out, (0, 0, offset), (*out.shape[:2], seg))
    out = jax.lax.dynamic_update_slice(out, upd + weight * chunk_out, (0, 0, offset))
    sw = jax.lax.dynamic_slice(sum_weight, (offset,), (seg,)) + weight
    sum_weight = jax.lax.dynamic_update_slice(sum_weight, sw, (offset,))
    return out, sum_weight


class Separator:
    """High-level demixer: load params once, demix tracks of any length."""

    def __init__(self, params: UMXParams, cfg: EngineConfig = EngineConfig()):
        self.params = params
        self.cfg = cfg
        self._window_plans: dict[int, int] = {}

    def _window_plan(self, resident_bytes: int) -> int:
        """Memoized auto window width (the planner walks the params
        pytree; per-demix recomputation would cost host milliseconds).
        ``resident_bytes`` is rounded UP to 256 MB buckets so tracks of
        similar length share an entry without loosening the budget."""
        key = -(-resident_bytes // 2**28) * 2**28
        if key not in self._window_plans:
            from umx_tpu.engine.memory import suggest_window_chunks

            self._window_plans[key] = suggest_window_chunks(
                self.cfg, params=self.params, resident_bytes=key
            )
        return self._window_plans[key]

    @classmethod
    def from_ggml(
        cls, path: str, cfg: EngineConfig | None = None, quantized_hbm: bool = False
    ) -> "Separator":
        """Load weights.  With ``quantized_hbm`` the u8/u16 matmul weights
        stay quantized on device and dequant is fused into the gemms
        (ops/qmatmul.py) — ~40% less weight HBM/bandwidth."""
        from umx_tpu.io.ggml import read_ggml
        from umx_tpu.models.umx import params_from_ggml, quantized_params_from_ggml

        model = read_ggml(path, keep_quantized=quantized_hbm)
        if cfg is None:
            cfg = EngineConfig()
        if cfg.model.hidden_size != model.hidden_size:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, hidden_size=model.hidden_size)
            )
        build = quantized_params_from_ggml if quantized_hbm else params_from_ggml
        return cls(build(model, cfg.model), cfg)

    # -- split_inference (umx.cpp:152-295) --------------------------------

    def demix(self, audio, progress=None, fused: bool | None = None, segment_fn=None) -> Array:
        """Demucs-style overlapping-segment demix of a full track.

        audio: (2, length) → (n_targets, 2, length), all accumulation
        on-device.  Two execution modes:

        * fused (default): the whole track runs as ONE XLA program
          (lax.scan over segments) — minimal host involvement, the
          track stays in HBM end to end.
        * host-loop: one dispatch per segment; supports per-segment
          ``progress`` callbacks (auto-selected when one is given) and a
          custom ``segment_fn`` (same signature as
          :func:`segment_forward` — e.g. a serving
          :class:`~umx_tpu.engine.batcher.SegmentBatcher` that coalesces
          concurrent requests' segments into one device batch).
        """
        cfg = self.cfg
        sr = cfg.dsp.sample_rate
        seg = cfg.segment.segment_samples(sr)
        stride = cfg.segment.stride_samples(sr)
        length = audio.shape[1]
        if fused is None:
            fused = progress is None and segment_fn is None
        if segment_fn is None:
            segment_fn = segment_forward

        state = init_lstm_state(cfg.model)

        n_chunks = max(1, math.ceil(length / stride))
        padded_len = (n_chunks - 1) * stride + seg

        cb = cfg.segment.chunk_batch
        if fused and cb <= 0:  # auto: planner-picked group width (config.py)
            from umx_tpu.engine.memory import suggest_chunk_batch

            cb = suggest_chunk_batch(cfg, length / sr, params=self.params)

        # windowed-fused: chain W-chunk fused windows when the whole
        # track exceeds what one program can hold (config.py
        # window_chunks; the 60-min single program OOMs, PERF.md).
        # Decided BEFORE the whole track is placed on device — host
        # callers stream window slices in and stems out, so HBM stays
        # bounded for ANY track length.  The A/B stream_impl arms keep
        # their single-program shapes.
        if fused and (cfg.stream_impl == "scan" or not cfg.segment.streaming):
            Wc = cfg.segment.window_chunks
            if Wc == 0:
                resident = 0
                if isinstance(audio, jax.Array):
                    # device-resident caller: full-track audio + the
                    # accumulated output stems stay in HBM across
                    # windows (host callers fetch each window out)
                    s = cfg.model.n_targets
                    resident = (2 + s * 2) * padded_len * 4
                Wc = self._window_plan(resident)
                if n_chunks <= Wc:
                    Wc = -1  # whole track fits: single fused program
                else:
                    # even split: ceil(n/ceil(n/W)) computes the same
                    # number of windows with the smallest W — a W that
                    # doesn't divide n_chunks pads the last window with
                    # silent chunks (measured: 80 chunks at W=30 runs
                    # 90 chunks' compute; W=27 runs 81 at the same
                    # window count), and a smaller W only shrinks the
                    # footprint, so the planner's fit still holds
                    Wc = -(-n_chunks // -(-n_chunks // Wc))
            if Wc > 0 and n_chunks > Wc:
                out = self._demix_windowed(
                    audio, n_chunks, seg, stride, Wc, cb, progress
                )
                return out[..., :length]

        # pad so every chunk is one full segment (fixed shapes -> one XLA
        # program for all chunks of all tracks).  Device-resident audio
        # stays on device (no host round trip).
        if isinstance(audio, jax.Array):
            audio_p = jnp.pad(audio.astype(jnp.float32), ((0, 0), (0, padded_len - length)))
        else:
            audio_p = jax.device_put(
                np.pad(np.asarray(audio, np.float32), ((0, 0), (0, padded_len - length)))
            )

        if fused:
            if not cfg.segment.streaming:
                # Non-streaming: segments are independent, so the
                # chunk-batched program wins — batched chunks fold into
                # the batch-native BLSTM kernel's matmul rows, and wider
                # groups are monotonically faster until HBM runs out
                # (420 s track: width 4 = 1251×, 16 = 1574×, PERF.md).
                out = demix_fused_parallel(
                    self.params, audio_p, cfg, n_chunks, seg, stride,
                    chunk_batch=min(cb, n_chunks),
                )
            elif cfg.stream_impl == "groups" and n_chunks > 1:
                # A/B arm: split-phase groups (measured negative result
                # on v5e — batching the state-free phases buys nothing
                # on a serially-executing core; see config.stream_impl).
                out, _ = demix_fused_stream_groups(
                    self.params, audio_p, state, cfg, n_chunks, seg, stride,
                    chunk_batch=min(cb, n_chunks),
                )
            elif (
                cfg.stream_impl == "pipelined"
                and n_chunks > 1
                and not isinstance(self.params.lstm_hh_w, QTensor)
            ):
                # A/B arm: cross-chunk layer pipelining — same streaming
                # math, the recurrence runs 3 layer-stages of different
                # chunks per merged-kernel call (see config.stream_impl).
                # Quantized-HBM weights keep the scan (stage stacking
                # needs dense hh planes); off-TPU the kernel interprets.
                out, _ = demix_fused_stream_pipelined(
                    self.params, audio_p, state, cfg, n_chunks, seg, stride
                )
            else:
                out, _ = demix_fused(
                    self.params, audio_p, state, cfg, n_chunks, seg, stride
                )
            if progress is not None:
                progress(1.0)
            return out[..., :length]

        weight = _transition_weight(seg, cfg.segment.transition_power)
        out = jnp.zeros((cfg.model.n_targets, 2, padded_len), jnp.float32)
        sum_weight = jnp.zeros((padded_len,), jnp.float32)

        for i in range(n_chunks):
            offset = jnp.int32(i * stride)
            chunk = _chunk_at(audio_p, offset, seg)
            chunk_out, new_state = segment_fn(self.params, chunk, state, cfg, seg)
            if cfg.segment.streaming:
                state = new_state
            out, sum_weight = _accumulate(out, sum_weight, chunk_out, weight, offset)
            if progress is not None:
                progress((i + 1) / n_chunks)

        return _finalize(out, sum_weight)[..., :length]

    def _demix_windowed(
        self,
        audio_p,
        n_chunks: int,
        seg: int,
        stride: int,
        W: int,
        chunk_batch: int,
        progress=None,
    ):
        """Windowed-fused track demix: ceil(n_chunks/W) W-chunk fused
        windows chained by LSTM state + the unnormalized overlap-add
        boundary (see :func:`_demix_windowed_impl`).  One compiled
        program serves every window of every track (fixed shapes).

        audio_p: (2, (n_chunks-1)*stride + seg), host numpy or device.
        Host input => each window's stems are fetched to host as they
        finish (bounded HBM for ANY length) and a host array returns;
        device input (the bench convention: audio pre-placed, stems
        drained by a scalar fetch) => stems stay device-resident and a
        device array returns.
        """
        cfg = self.cfg
        n_windows = -(-n_chunks // W)
        total_chunks = n_windows * W
        full_len = (total_chunks - 1) * stride + seg
        grow = full_len - audio_p.shape[-1]
        on_device = isinstance(audio_p, jax.Array)
        if on_device:
            if grow:
                audio_p = jnp.pad(audio_p, ((0, 0), (0, grow)))
        else:
            audio_p = np.pad(np.asarray(audio_p, np.float32), ((0, 0), (0, grow)))

        tail_len = seg - stride
        state = init_lstm_state(cfg.model)
        tail = jnp.zeros((cfg.model.n_targets, 2, tail_len), jnp.float32)
        tail_w = jnp.zeros((tail_len,), jnp.float32)
        padded_w = (W - 1) * stride + seg

        if on_device:
            # in-place donated accumulator: a jnp.concatenate at the end
            # would double-buffer the full-track stems (2 x 5 GB at 60
            # minutes) — the donated dynamic_update_slice writes each
            # window into ONE resident result buffer instead
            res = jnp.zeros(
                (cfg.model.n_targets, 2, full_len), jnp.float32
            )
        else:
            res = np.empty(
                (cfg.model.n_targets, 2, full_len), np.float32
            )

        for j in range(n_windows):
            s0 = j * W * stride
            a = audio_p[:, s0 : s0 + padded_w]
            if not on_device:
                a = jax.device_put(a)
            out_j, tail, tail_w, state = demix_windowed_window(
                self.params, a, state, tail, tail_w,
                cfg, W, seg, stride, chunk_batch,
            )
            if on_device:
                res = _write_window(res, out_j, jnp.int32(s0))
            else:
                res[..., s0 : s0 + W * stride] = np.asarray(out_j)
            if progress is not None:
                progress((j + 1) / n_windows)
        # the last window's tail is the end of the (padded) track:
        # normalize and append so output covers the full padded length
        last = _finalize(tail, tail_w)
        if on_device:
            return _write_window(res, last, jnp.int32(full_len - tail_len))
        res[..., full_len - tail_len :] = np.asarray(last)
        return res

    # -- shift_inference (umx.cpp:99-150) ----------------------------------

    def demix_track(self, audio, seed: int = 0, progress=None, fused: bool | None = None, segment_fn=None) -> np.ndarray:
        """Full track demix with the Demucs random-shift trick.

        The input is front-padded by a random offset in [0, 0.5 s) and
        the output trimmed back (umx.cpp:99-150), making the
        segmentation grid time-equivariant.  The reference supports
        exactly shifts=1 with an unseeded rand(); here shifts=N averages
        N independently-shifted passes (the full Demucs semantics, which
        buys up to ~0.2 dB SDR) with a seedable PRNG.
        """
        cfg = self.cfg
        audio = np.asarray(audio, np.float32)
        length = audio.shape[1]
        if cfg.shifts <= 0:
            return np.asarray(
                self.demix(audio, progress=progress, fused=fused, segment_fn=segment_fn)
            )

        max_shift = cfg.segment.max_shift_samples(cfg.dsp.sample_rate)
        rng = np.random.default_rng(seed)
        offsets = [int(rng.integers(0, max_shift)) for _ in range(cfg.shifts)]

        if cfg.shifts > 1 and fused is not False and segment_fn is None and progress is None:
            # The N shifted copies are independent equal-length tracks:
            # batch them through ONE fused program (batch rows amortize
            # the BLSTM latency floor — PERF.md), bounded by the HBM
            # capacity planner, instead of N sequential full passes.
            from umx_tpu.engine.memory import suggest_max_batch

            fit = suggest_max_batch(cfg, (length + max_shift) / cfg.dsp.sample_rate)
            if fit >= 2:
                return self._demix_shifts_batched(audio, offsets, max_shift, fit)

        acc = None
        for offset in offsets:
            shifted = np.pad(audio, ((0, 0), (offset, max_shift - offset)))
            out = np.asarray(
                self.demix(shifted, progress=progress, fused=fused, segment_fn=segment_fn)
            )
            out = out[..., offset : offset + length]
            acc = out if acc is None else acc + out
        return acc / cfg.shifts

    def _demix_shifts_batched(
        self, audio: np.ndarray, offsets: list[int], max_shift: int, max_batch: int
    ) -> np.ndarray:
        """All shift passes as batch rows of the fused-track program."""
        from umx_tpu.engine.fleet import _batched_demix

        cfg = self.cfg
        sr = cfg.dsp.sample_rate
        seg = cfg.segment.segment_samples(sr)
        stride = cfg.segment.stride_samples(sr)
        length = audio.shape[1]
        shifted_len = length + max_shift
        n_chunks = max(1, math.ceil(shifted_len / stride))
        padded_len = (n_chunks - 1) * stride + seg

        acc = None
        for g in range(0, len(offsets), max_batch):
            group = offsets[g : g + max_batch]
            batch = np.zeros((len(group), 2, padded_len), np.float32)
            for b, off in enumerate(group):
                batch[b, :, off : off + length] = audio
            st = init_lstm_state(cfg.model)
            states = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (len(group), *x.shape)), st
            )
            fn = _batched_demix(
                _vmap_cfg(cfg, len(group)), n_chunks, seg, stride, batch=len(group)
            )
            out_b, _ = fn(self.params, jnp.asarray(batch), states)
            out_b = np.asarray(out_b)
            for b, off in enumerate(group):
                contrib = out_b[b, ..., off : off + length]
                acc = contrib.copy() if acc is None else acc + contrib
        return acc / len(offsets)
