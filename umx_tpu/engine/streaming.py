"""Real-time streaming demixer.

The reference's "streaming" is a memory-bounding device for offline
tracks (state carried across 60 s chunks, umx.cpp:152-295).  This module
turns the same machinery into an actual streaming API: push arbitrary-
size audio chunks, receive finalized demixed stems as soon as every
overlapping segment covering them has run.

Semantics are EXACTLY offline ``Separator.demix`` (same segment grid,
triangular weights, streaming LSTM carry, zero-padded final segments):
``push()`` + ``flush()`` over any chunking reproduces the offline output
bit-for-bit, so quality is identical and latency is one segment
(configurable via ``SegmentConfig.segment_secs``).

Memory is O(segment) regardless of stream length: one input window and
one weighted-accumulation window, both rolling by the stride.
"""

from __future__ import annotations

import numpy as np

from umx_tpu.config import EngineConfig
from umx_tpu.engine.separator import _transition_weight, segment_forward
from umx_tpu.models.umx import UMXParams, init_lstm_state


class StreamingDemixer:
    def __init__(self, params: UMXParams, cfg: EngineConfig = EngineConfig()):
        self.params = params
        self.cfg = cfg
        sr = cfg.dsp.sample_rate
        self.seg = cfg.segment.segment_samples(sr)
        self.stride = cfg.segment.stride_samples(sr)
        self.n_targets = cfg.model.n_targets
        self._weight = np.asarray(_transition_weight(self.seg, cfg.segment.transition_power))
        self.reset()

    def reset(self):
        self._state = init_lstm_state(self.cfg.model)
        self._in = np.zeros((2, 0), np.float32)  # samples not yet emitted
        self._acc = np.zeros((self.n_targets, 2, self.seg), np.float32)
        self._wacc = np.zeros((self.seg,), np.float32)
        self._pushed = 0  # total samples received
        self._emitted = 0  # total samples emitted

    @property
    def latency_samples(self) -> int:
        """Worst-case samples between pushing a sample and receiving its
        demixed value (one segment)."""
        return self.seg

    def _run_segment(self, chunk: np.ndarray) -> None:
        out, new_state = segment_forward(
            self.params, chunk, self._state, self.cfg, self.seg
        )
        if self.cfg.segment.streaming:
            self._state = new_state
        self._acc += self._weight * np.asarray(out)
        self._wacc += self._weight

    def _emit_block(self) -> np.ndarray:
        """Finalize and return the first ``stride`` samples of the
        accumulation window, then roll everything forward."""
        R = self.stride
        block = self._acc[..., :R] / np.maximum(self._wacc[:R], 1e-12)
        self._acc = np.concatenate(
            [self._acc[..., R:], np.zeros((self.n_targets, 2, R), np.float32)], axis=-1
        )
        self._wacc = np.concatenate([self._wacc[R:], np.zeros((R,), np.float32)])
        self._in = self._in[:, R:]
        self._emitted += R
        return block

    def push(self, chunk: np.ndarray) -> np.ndarray:
        """Feed (2, n) samples; returns (n_targets, 2, m) finalized stems
        (m may be 0)."""
        chunk = np.asarray(chunk, np.float32)
        if chunk.ndim != 2 or chunk.shape[0] != 2:
            raise ValueError(f"expected (2, n) audio chunk, got {chunk.shape}")
        self._in = np.concatenate([self._in, chunk], axis=1)
        self._pushed += chunk.shape[1]

        blocks = []
        while self._in.shape[1] >= self.seg:
            self._run_segment(self._in[:, : self.seg])
            blocks.append(self._emit_block())
        if blocks:
            return np.concatenate(blocks, axis=-1)
        return np.zeros((self.n_targets, 2, 0), np.float32)

    def flush(self) -> np.ndarray:
        """End of stream: process the remaining partial segments (zero-
        padded, exactly like offline demix's padded tail) and return the
        remaining stems, trimmed to the exact pushed length."""
        total = self._pushed
        blocks = []
        while self._emitted < total:
            pending = self._in.shape[1]  # == total - self._emitted < seg
            padded = np.pad(self._in, ((0, 0), (0, self.seg - pending)))
            self._run_segment(padded)
            blocks.append(self._emit_block())
        if not blocks:
            return np.zeros((self.n_targets, 2, 0), np.float32)
        out = np.concatenate(blocks, axis=-1)
        excess = self._emitted - total
        return out[..., : out.shape[-1] - excess] if excess > 0 else out
