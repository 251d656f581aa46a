"""Quantized weights resident in HBM with dequantization fused into the
matmul (BASELINE.json config 3: "uint8/uint16 ggml weights with dequant
fused into LSTM/fc gemms").

The fusion is algebraic, not kernel-level, and is EXACT:

    W = scale * q + offset          (per-tensor affine, model.cpp:610-617)
    x @ W = scale * (x @ q) + offset * rowsum(x)

``q`` is stored as bfloat16 *integers*: every uint8 value (0..255) is
exactly representable in bfloat16, so ``x @ q`` on the MXU with float32
accumulation is exact integer arithmetic against x's bf16 mantissa —
bit-identical to dequantize-then-bf16-matmul, at half the HBM traffic
of float32 weights.  uint16 payloads are split into hi/lo byte planes
(q = 256*hi + lo), each exact in bf16:

    x @ q = 256 * (x @ hi) + (x @ lo)

so fc2/fc3/bn2/bn3's 16-bit precision is preserved exactly through two
MXU passes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass
class QTensor:
    """Quantized weight: byte planes (bf16-encoded exact integers) with
    per-tensor affine scale/offset.  ``planes`` is (q,) for u8 sources
    and (hi, lo) for u16; leading axes (targets, layers, ...) stack."""

    planes: tuple[Array, ...]
    scale: Array  # per-tensor scale, leading stack axes
    offset: Array  # per-tensor offset, leading stack axes

    @property
    def shape(self):
        return self.planes[0].shape

    @property
    def ndim(self):
        return self.planes[0].ndim

    def __getitem__(self, idx) -> "QTensor":
        """Index the stacked leading axes (scale/offset share them)."""
        return QTensor(
            planes=tuple(p[idx] for p in self.planes),
            scale=self.scale[idx],
            offset=self.offset[idx],
        )

    def astype(self, dtype) -> "QTensor":
        """No-op for float casts (planes must stay exact bf16 integers);
        keeps jax.tree-free call sites like UMXParams.astype working."""
        return self


_PLANE_W = (256.0, 1.0)


def qtensor_from_raw(q: np.ndarray, scale: float, offset: float) -> QTensor:
    """Build a QTensor from a raw quantized payload (original dtype)."""
    if q.dtype == np.uint8:
        planes = (jnp.asarray(q.astype(np.float32), jnp.bfloat16),)
    elif q.dtype == np.uint16:
        hi = (q >> 8).astype(np.float32)
        lo = (q & 0xFF).astype(np.float32)
        planes = (jnp.asarray(hi, jnp.bfloat16), jnp.asarray(lo, jnp.bfloat16))
    else:
        raise ValueError(f"unsupported quantized dtype {q.dtype}")
    return QTensor(
        planes=planes,
        scale=jnp.float32(scale),
        offset=jnp.float32(offset),
    )


def stack_qtensors(qts: list[QTensor]) -> QTensor:
    """Stack QTensors (same plane count) along a new leading axis."""
    n_planes = len(qts[0].planes)
    return QTensor(
        planes=tuple(
            jnp.stack([qt.planes[p] for qt in qts]) for p in range(n_planes)
        ),
        scale=jnp.stack([qt.scale for qt in qts]),
        offset=jnp.stack([qt.offset for qt in qts]),
    )


def _int_contract(x: Array, qt: QTensor, einsum_spec: str, dtype) -> Array:
    """Σ_p w_p * einsum(x, plane_p) with f32 accumulation (exact)."""
    xb = x.astype(dtype)
    acc = None
    weights = _PLANE_W[-len(qt.planes):]
    for w, plane in zip(weights, qt.planes):
        term = jnp.einsum(einsum_spec, xb, plane, preferred_element_type=jnp.float32)
        term = term * w if w != 1.0 else term
        acc = term if acc is None else acc + term
    return acc


def q_mm(x: Array, qt: QTensor, dtype=jnp.bfloat16) -> Array:
    """x (..., K) @ QTensor (K, N) → (..., N) float32.
    scale/offset are scalars at this call site (stack axes consumed by
    vmap)."""
    acc = _int_contract(x, qt, "...k,kn->...n", dtype)
    rowsum = jnp.sum(x, axis=-1, keepdims=True)
    return qt.scale * acc + qt.offset * rowsum


def q_einsum_ih(xs: Array, qt: QTensor, dtype=jnp.bfloat16) -> Array:
    """'dti,dig->tdg' against a (D, in, 4G) QTensor with per-direction
    scale/offset of shape (D,)."""
    acc = _int_contract(xs, qt, "dti,dig->tdg", dtype)
    rowsum = jnp.sum(xs, axis=-1)  # (D, T)
    return qt.scale[None, :, None] * acc + qt.offset[None, :, None] * rowsum.T[..., None]


def q_einsum_hh(h: Array, qt: QTensor, dtype=jnp.bfloat16) -> Array:
    """'dg,dgf->df' against a (D, G, 4G) QTensor, scale/offset (D,)."""
    acc = _int_contract(h, qt, "dg,dgf->df", dtype)
    rowsum = jnp.sum(h, axis=-1, keepdims=True)  # (D, 1)
    return qt.scale[:, None] * acc + qt.offset[:, None] * rowsum
