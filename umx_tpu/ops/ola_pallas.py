"""Pallas TPU kernel for the fused-track overlap-add's layout transpose.

The whole-track scan emits weighted chunk outputs chunk-major
``(n_chunks, ..., seg)``; the track wants time-major ``(..., padded_len)``
with chunk k's head added to chunk k-1's tail (overlap <= 50%) and every
sample divided by the triangular weight sum (umx.cpp:214-273 semantics).

STATUS: measured A/B variant, NOT the shipping default.  At 420 s track
scale the isolated OLA costs (scripts/profile-ola.py): statically
unrolled slice-adds 24 ms < XLA pad+sum 42 ms < this Pallas DMA
transpose 52 ms < fori-loop dynamic-update-slice 69 ms.  44.1 kHz rows
(stride*4 B is not a 512 B DMA-granule multiple) tax every
layout-changing approach — even pure DMA runs ~29 GB/s effective — so
the engine default ("auto" -> "unroll" in separator.py) avoids the
transpose entirely.  Kept because the approach is instructive and the
geometry may win on other shapes.

The combine (heads + shifted tails) and the normalization are cheap
chunk-major elementwise passes that XLA handles at bandwidth; the
chunk-major -> time-major step is a (n_chunks, M, stride) ->
(M, n_chunks, stride) transpose.  This module routes just that
transpose through a Pallas DMA kernel: time is viewed as ``(S1, t2)``
with ``t2`` a divisor of the stride used as a full-extent last block
dimension (full-dim equality satisfies Mosaic's last-two-dims rule
where 128-divisibility cannot hold), and the sequential grid copies
(1, M, b1, t2) input blocks to (1, 1, b1, t2) output blocks — pure DMA,
no vector ops.

Batched (vmapped) callers fold their batch axes into the row dimension M
via the custom_vmap rule — same pattern as the batch-native BLSTM kernel
(lstm_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# per-block VMEM budget (the input block carries all M rows)
_BLOCK_BYTES = 4 * 1024 * 1024


def _pick_t2(stride: int) -> int | None:
    """Largest divisor of ``stride`` in [128, 4096] — the lane-dim extent
    of the transpose view.  None when stride has no such divisor."""
    best = None
    for d in range(1, int(stride**0.5) + 1):
        if stride % d == 0:
            for c in (d, stride // d):
                if 128 <= c <= 4096 and (best is None or c > best):
                    best = c
    return best


def _transpose_kernel(in_ref, out_ref):
    """Grid (n_chunks, S_blocks, M): copy chunk k's rows to row-major
    (m, k) positions.  in: (1, M, b1, t2) fetched once per (k, s) and
    reused across the innermost m steps; out: (1, 1, b1, t2)."""
    m = pl.program_id(2)
    out_ref[0, 0] = in_ref[0, m]


def _transpose_chunks_pallas(combined: Array, t2: int, interpret: bool) -> Array:
    """(n_chunks, M, stride) -> (M, n_chunks, stride) via Pallas DMA.

    The sub-block row count b1 is derived here from the ACTUAL M (which
    grows when vmapped callers fold batch axes into rows) so the input
    block always fits the VMEM budget."""
    n_chunks, M, stride = combined.shape
    S1 = stride // t2
    b1 = max(1, _BLOCK_BYTES // (4 * M * t2))
    if b1 >= S1:
        b1 = S1  # full-dim equality — no 8-divisibility needed
    else:
        b1 = max(8, b1 // 8 * 8)
    nb_s = -(-S1 // b1)
    view = combined.reshape(n_chunks, M, S1, t2)

    out = pl.pallas_call(
        _transpose_kernel,
        grid=(n_chunks, nb_s, M),
        in_specs=[
            pl.BlockSpec(
                (1, M, b1, t2),
                lambda k, s, m: (k, 0, s, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, b1, t2), lambda k, s, m: (m, k, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, n_chunks, S1, t2), combined.dtype),
        interpret=interpret,
    )(view)
    return out.reshape(M, n_chunks, stride)


def _ola_impl(
    ys: Array, inv_sw: Array, stride: int, t2: int, impl: str, interpret: bool
) -> Array:
    """ys: (n_chunks, M, seg) weighted chunk outputs; inv_sw:
    (padded_len,).  Returns (M, padded_len) normalized overlap-add."""
    n_chunks, M, seg = ys.shape
    tail_len = seg - stride
    body_len = n_chunks * stride

    # combine chunk-major: chunk k's head + chunk k-1's tail (cheap
    # elementwise, no layout change)
    heads = ys[..., :stride]
    if tail_len:
        tails = jnp.pad(ys[:-1, ..., stride:], ((1, 0), (0, 0), (0, stride - tail_len)))
        combined = heads + tails
    else:
        combined = heads

    if impl == "pallas":
        tm = _transpose_chunks_pallas(combined, t2, interpret)
    else:  # "xla_dus": per-chunk dynamic-update-slice copies
        def body(k, acc):
            return jax.lax.dynamic_update_slice(
                acc, combined[k][:, None], (0, k, 0)
            )

        tm = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((M, n_chunks, stride), ys.dtype)
        )

    out = tm.reshape(M, body_len)
    if tail_len:
        final_tail = ys[-1, ..., stride:].reshape(M, tail_len)
        out = jnp.concatenate([out, final_tail], axis=-1)
    return out * inv_sw


@functools.lru_cache(maxsize=None)
def _ola_custom(stride: int, t2: int, impl: str, interpret: bool):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def call(ys, inv_sw):
        return _ola_impl(ys, inv_sw, stride, t2, impl, interpret)

    @call.def_vmap
    def rule(axis_size, in_batched, ys, inv_sw):
        ys_b, sw_b = in_batched
        if not ys_b:
            ys = jnp.broadcast_to(ys[None], (axis_size, *ys.shape))
        if sw_b:
            # per-instance weight sums can't fold into rows; run instances
            # sequentially (rare: weight is config-derived, not per-track)
            outs = jax.lax.map(lambda args: call(*args), (ys, inv_sw))
            return outs, True
        B, n_chunks, M, seg = ys.shape
        folded = jnp.moveaxis(ys, 0, 1).reshape(n_chunks, B * M, seg)
        out = call(folded, inv_sw)  # (B*M, padded_len)
        return out.reshape(B, M, -1), True

    return call


def overlap_add_normalized(
    ys: Array,
    inv_sw: Array,
    stride: int,
    padded_len: int,
    impl: str = "pallas",
    interpret: bool = False,
) -> Array | None:
    """Normalized triangular overlap-add of weighted chunks.

    ys: (n_chunks, *mid, seg) weighted chunk outputs (chunk-major, the
    scan's natural layout).  inv_sw: (padded_len,) reciprocal weight sum.
    impl: "pallas" (DMA transpose kernel) or "xla_dus" (per-chunk
    dynamic-update-slice copies).  Returns (*mid, padded_len), or None
    when the geometry doesn't apply (overlap > 50%, or no usable lane-dim
    divisor of stride): caller falls back to the XLA pad+sum path.
    """
    n_chunks, *mid, seg = ys.shape
    tail_len = seg - stride
    if tail_len > stride or tail_len < 0:
        return None
    t2 = _pick_t2(stride)
    if t2 is None:
        return None
    import numpy as np

    M = int(np.prod(mid)) if mid else 1

    out = _ola_custom(stride, t2, impl, interpret)(
        ys.reshape(n_chunks, M, seg), inv_sw
    )
    return out[..., :padded_len].reshape(*mid, padded_len)
