"""Pallas TPU kernel for the bidirectional LSTM recurrence.

The BLSTM is the one op whose structure fights XLA: a length-T scan of
tiny (D*G x 4G) matmuls with a sequential carry.  XLA's `lax.scan`
compiles to an on-device loop, but every step still pays loop/dispatch
overhead and bounces h/c through HBM.  This kernel runs ONE LSTM layer
(both directions, all 4 targets) as a single `pallas_call`:

* grid = (T,) — TPU grid iterations execute sequentially, so the
  recurrence is the grid;
* the hidden/cell state lives in a VMEM scratch buffer for the whole
  call (initialized from h0/c0 at step 0, written out at step T-1);
* the hidden-hidden weights (T#, D, G, 4G) sit in VMEM across all
  steps (their block index never changes);
* per step it loads one x_proj row (T#, D, 4G), does the batched
  (T#*D, G) @ (G, 4G) gate matmul on the MXU with f32 accumulation,
  applies the gate math on the VPU in f32, and writes h to the output
  row.

Input projections (x @ W_ih + biases) are computed OUTSIDE as one big
gemm, exactly like the lax.scan path (models/umx.py::_bilstm_layer).

VMEM budget (UMX-L, bf16 weights): W_hh 4*2*512*2048*2B = 16.8 MB —
over the ~16 MB/core budget, so weights are kept in bf16 and the
kernel is gridded (target,) x (T,) with per-target weight residency
(4.2 MB) instead when needed.  The default layout splits targets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _lstm_layer_kernel(x_proj_ref, hh_w_ref, h0_ref, c0_ref, out_ref, hT_ref, cT_ref, h_s, c_s):
    """One grid step = one timestep for one target.

    Shapes (per block):
      x_proj_ref: (1, 1, D, 4G)   hh_w_ref: (1, D, G, 4G)
      h0/c0:      (1, D, G)       out_ref: (1, 1, D, G)
      hT/cT:      (1, D, G)       scratch h_s/c_s: (D, G) f32
    """
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[0]
        c_s[:] = c0_ref[0]

    h = h_s[:]  # (D, G) f32
    c = c_s[:]

    # gates = x_proj + h @ W_hh  (batched over D on the MXU, f32 accum)
    rec = jax.lax.dot_general(
        h.astype(hh_w_ref.dtype),
        hh_w_ref[0],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (D, 4G)
    gates = x_proj_ref[0, 0].astype(jnp.float32) + rec

    G = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :G])
    f = jax.nn.sigmoid(gates[:, G : 2 * G])
    g = jnp.tanh(gates[:, 2 * G : 3 * G])
    o = jax.nn.sigmoid(gates[:, 3 * G :])
    c = f * c + i * g
    h = o * jnp.tanh(c)

    h_s[:] = h
    c_s[:] = c
    out_ref[0, 0] = h

    @pl.when(t == n_t - 1)
    def _():
        hT_ref[0] = h
        cT_ref[0] = c


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_layer_pallas(x_proj: Array, hh_w: Array, h0: Array, c0: Array, interpret: bool = False):
    """Run one LSTM layer's recurrence for all targets/directions.

    x_proj: (T#, T, D, 4G) float32 — precomputed input projections
            (backward direction rows already time-reversed).
    hh_w:   (T#, D, G, 4G) — hidden-hidden weights (contracted over G).
    h0/c0:  (T#, D, G) float32.
    Returns (hs (T#, T, D, G) f32, hT (T#, D, G), cT (T#, D, G)).
    """
    n_targets, T, D, G4 = x_proj.shape
    G = G4 // 4
    hh_w = hh_w.astype(jnp.bfloat16)

    grid = (n_targets, T)
    kernel = pl.pallas_call(
        _lstm_layer_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, D, G4), lambda j, t: (j, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, G, G4), lambda j, t: (j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, G), lambda j, t: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, G), lambda j, t: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, D, G), lambda j, t: (j, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, G), lambda j, t: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, G), lambda j, t: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_targets, T, D, G), jnp.float32),
            jax.ShapeDtypeStruct((n_targets, D, G), jnp.float32),
            jax.ShapeDtypeStruct((n_targets, D, G), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, G), jnp.float32),
            pltpu.VMEM((D, G), jnp.float32),
        ],
        interpret=interpret,
    )
    hs, hT, cT = kernel(x_proj, hh_w, h0.astype(jnp.float32), c0.astype(jnp.float32))
    return hs, hT, cT
