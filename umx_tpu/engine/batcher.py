"""Cross-request segment batching for serving.

The reference binary serves one file per process run; round 1's HTTP
service serialized whole tracks behind one lock.  This batcher removes
the lock from the hot path: every in-flight request decomposes into
per-segment jobs (audio chunk + its own LSTM carry), a single worker
thread coalesces jobs from DIFFERENT requests into one vmapped device
call, and each request's streaming-state chain stays intact because a
request only ever has one job in flight at a time.

Why this batches well on TPU: the BLSTM recurrence cost is a latency
floor independent of batch width (PERF.md microbenchmark — extra rows
through the same weights are free), so N concurrent tracks' segments
cost nearly the same wall time as one.

Batch sizes are padded to {1, max_batch} so exactly two programs
compile per (cfg, segment-length) key — compiles are minutes on remote
backends, so per-size recompiles are not acceptable.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from umx_tpu.config import EngineConfig
from umx_tpu.engine.separator import _device_cfg, _segment_forward_impl, _vmap_cfg


@dataclass
class BatcherStats:
    jobs: int = 0
    device_calls: int = 0
    max_batch_observed: int = 0
    # cumulative wall seconds the worker spent inside device calls — the
    # device-utilization numerator for autoscaling decisions
    busy_s: float = 0.0


class SegmentBatcher:
    """Coalesces segment_forward jobs from concurrent requests into
    batched device calls.

    Usage: ``out, new_state = batcher.run(params, audio, state, cfg, n)``
    — a drop-in for ``segment_forward`` that may share its device call
    with other threads' jobs of the same (cfg, n) shape.
    """

    def __init__(self, max_batch: int = 4, max_wait_ms: float = 5.0):
        import time

        self.max_batch = max(1, int(max_batch))
        self.max_wait_s = max_wait_ms / 1000.0
        self._q: queue.Queue = queue.Queue()
        # worker-local FIFO of jobs skipped by the coalescing pass; an
        # instance attribute (not a _loop local) so queue_depth() can
        # count waiting work that already left the queue
        self._pending: list = []
        self._fns: dict[Any, Any] = {}
        self.stats = BatcherStats()
        self._stats_lock = threading.Lock()
        self._stats_gen = 0
        self._started = time.monotonic()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._stop = False
        self._worker.start()

    def close(self):
        self._stop = True
        self._q.put(None)
        self._worker.join(timeout=5)
        # fail any jobs still queued (or enqueued after close) instead of
        # leaving their callers blocked in fut.result() forever
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[-1].set_exception(RuntimeError("SegmentBatcher closed"))

    # -- request side -------------------------------------------------------

    def run(self, params, audio, state, cfg: EngineConfig, n_samples: int):
        if self._stop:
            raise RuntimeError("SegmentBatcher closed")
        fut: Future = Future()
        # params IDENTITY is part of the coalescing key: jobs carrying
        # different weight trees (e.g. a server hosting two models) must
        # never share a vmapped call (the batch executes with one tree)
        key = (_device_cfg(cfg), n_samples, id(params))
        self._q.put((key, params, audio, state, fut))
        return fut.result()

    # -- worker side --------------------------------------------------------

    def _batched_fn(self, key, batch_size: int):
        # compiled programs depend on (cfg, n) only — not params identity
        cache_key = (key[0], key[1], batch_size)
        if cache_key not in self._fns:
            # batched jobs fold into kernel matmul rows (lstm_pallas custom_vmap)
            cfg, n = _vmap_cfg(key[0], batch_size), key[1]

            def one(p, a, s):
                return _segment_forward_impl(p, a, s, cfg, n)

            self._fns[cache_key] = jax.jit(jax.vmap(one, in_axes=(None, 0, 0)))
        return self._fns[cache_key]

    def _loop(self):
        """Worker loop with a FAIRNESS BOUND: jobs the coalescing pass
        skips (different shape key) move to a worker-local FIFO, and the
        next group is always seeded from the OLDEST waiting job.  A
        minority-shape job therefore waits at most one group execution
        plus max_wait before running — even at batch 1 — instead of
        being re-enqueued behind a sustained majority-shape stream
        (round-2 VERDICT: the old park-and-requeue loop could starve
        mixed-shape traffic indefinitely)."""
        import time

        pending = self._pending  # instance list: queue_depth() counts it
        while not self._stop:
            if not pending:
                item = self._q.get()
                if item is None:
                    continue
                pending.append(item)
            # drain everything already queued so age ordering is global
            while True:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is not None:
                    pending.append(nxt)
            seed = pending.pop(0)  # oldest job seeds the group
            key = seed[0]
            group = [seed]
            rest = []
            for it in pending:
                if it[0] == key and len(group) < self.max_batch:
                    group.append(it)
                else:
                    rest.append(it)
            pending[:] = rest
            if len(group) < self.max_batch and self.max_batch > 1 and not pending:
                # brief coalescing wait for same-key arrivals — skipped
                # whenever older different-key jobs are already waiting,
                # so the wait never adds latency to the minority shape
                deadline = time.monotonic() + self.max_wait_s
                while len(group) < self.max_batch:
                    timeout = deadline - time.monotonic()
                    if timeout <= 0:
                        break
                    try:
                        nxt = self._q.get(timeout=timeout)
                    except queue.Empty:
                        break
                    if nxt is None:
                        continue
                    if nxt[0] == key:
                        group.append(nxt)
                    else:
                        pending.append(nxt)
            try:
                self._execute(key, group)
            except Exception as e:  # noqa: BLE001 — propagate to callers
                for _, _, _, _, fut in group:
                    if not fut.done():
                        fut.set_exception(e)
        for it in pending:
            it[-1].set_exception(RuntimeError("SegmentBatcher closed"))

    def reset_stats(self) -> None:
        """Zero the counters and the utilization clock — call after
        warmup so busy_fraction reflects steady state, not compiles.
        The generation bump makes in-flight _execute calls (whose t0
        predates the reset) discard their sample instead of booking
        pre-reset wall time against the fresh clock."""
        import time

        with self._stats_lock:
            self.stats = BatcherStats()
            self._stats_gen += 1
            self._started = time.monotonic()

    def utilization(self) -> float:
        """Fraction of wall time the device worker has been busy since
        construction — the primary autoscaling signal."""
        import time

        with self._stats_lock:
            up = time.monotonic() - self._started
            frac = self.stats.busy_s / up if up > 0 else 0.0
        return min(frac, 1.0)

    def queue_depth(self) -> int:
        """Waiting jobs: still-queued PLUS those the fairness pass moved
        to the worker-local pending FIFO (round-3 advisor: counting only
        qsize() under-reports exactly under sustained mixed-shape
        traffic, starving the autoscaling signal)."""
        return self._q.qsize() + len(self._pending)

    def _execute(self, key, group):
        import time

        with self._stats_lock:
            gen0 = self._stats_gen
        t0 = time.monotonic()
        B = len(group)
        params = group[0][1]
        # pad to a compiled size: 1 stays 1, anything larger pads to
        # max_batch (exactly two programs per key)
        size = 1 if B == 1 else self.max_batch
        audios = [g[2] for g in group] + [group[0][2]] * (size - B)
        states = [g[3] for g in group] + [group[0][3]] * (size - B)
        audio_b = jnp.stack([jnp.asarray(a, jnp.float32) for a in audios])
        state_b = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        out_b, new_state_b = self._batched_fn(key, size)(params, audio_b, state_b)
        # one 4-byte scalar fetch = completion barrier (block_until_ready
        # is not a barrier on the tunneled backend) so busy_s measures
        # real device time, not dispatch time; callers block on the
        # results right after anyway
        import numpy as _np

        _np.asarray(out_b[0, 0, 0, 0])
        dt = time.monotonic() - t0
        with self._stats_lock:
            if self._stats_gen == gen0:  # discard samples spanning a reset
                self.stats.jobs += B
                self.stats.device_calls += 1
                self.stats.max_batch_observed = max(self.stats.max_batch_observed, B)
                self.stats.busy_s += dt
        for i, (_, _, _, _, fut) in enumerate(group):
            st_i = jax.tree.map(lambda x, i=i: x[i], new_state_b)
            fut.set_result((out_b[i], st_i))
