"""Pallas TPU kernel for the bidirectional LSTM recurrence.

The BLSTM is the one op whose structure fights XLA: a length-T scan of
tiny (D*G x 4G) matmuls with a sequential carry.  XLA's `lax.scan`
compiles to an on-device loop, but every step pays loop + buffer-cycle
overhead.  This kernel runs ONE LSTM layer (both directions, all 4
targets) as a single `pallas_call`:

* grid = (targets, time-blocks) — TPU grid iterations execute
  sequentially, so the recurrence rides the grid;
* each grid step loads a block of ``time_block`` x_proj rows with ONE
  pipelined DMA and runs the recurrence over them from VMEM (an inner
  ``fori_loop``), amortizing per-step DMA/loop overhead;
* the hidden/cell state lives in VMEM scratch for the whole call
  (initialized from h0/c0 at block 0, exported at the last block);
* the hidden-hidden weights for the current target sit in VMEM across
  all time blocks (their block index never changes);
* gate matmuls run on the MXU in bf16 with f32 accumulation; gate math
  and state stay f32 on the VPU.

Input projections (x @ W_ih + biases) are computed OUTSIDE as one big
gemm, exactly like the lax.scan path (models/umx.py::_bilstm_layer).
Mosaic cannot lower batched dot_general, so the direction batch (D=2)
is unrolled into plain matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _make_kernel(K: int, last_k: int):
    def kernel(xp_ref, hh_w_ref, h0_ref, c0_ref, out_ref, hT_ref, cT_ref, h_s, c_s):
        """One grid step = ``K`` timesteps for one target.

        Block shapes:
          xp_ref: (1, K, D, 4G)   hh_w_ref: (1, D, G, 4G)
          h0/c0:  (1, D, G)       out_ref: (1, K, D, G)
          hT/cT:  (1, D, G)       scratch h_s/c_s: (D, G) f32
        """
        b = pl.program_id(1)
        n_b = pl.num_programs(1)

        @pl.when(b == 0)
        def _():
            h_s[:] = h0_ref[0]
            c_s[:] = c0_ref[0]

        hh_w = hh_w_ref[0]  # (D, G, 4G), resident across the target's blocks
        D = h_s.shape[0]
        G = h_s.shape[1]
        # the final block may be partial (T not a multiple of K)
        steps = jnp.where(b == n_b - 1, last_k, K)

        def body(k, _):
            h = h_s[:]
            c = c_s[:]
            hb = h.astype(hh_w.dtype)
            rec = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        hb[d : d + 1],
                        hh_w[d],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for d in range(D)
                ],
                axis=0,
            )  # (D, 4G)
            gates = xp_ref[0, pl.ds(k, 1)][0].astype(jnp.float32) + rec
            i = jax.nn.sigmoid(gates[:, :G])
            f = jax.nn.sigmoid(gates[:, G : 2 * G])
            g = jnp.tanh(gates[:, 2 * G : 3 * G])
            o = jax.nn.sigmoid(gates[:, 3 * G :])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            h_s[:] = h
            c_s[:] = c
            out_ref[0, pl.ds(k, 1)] = h[None]
            return 0

        jax.lax.fori_loop(0, steps, body, 0)

        @pl.when(b == n_b - 1)
        def _():
            hT_ref[0] = h_s[:]
            cT_ref[0] = c_s[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("time_block", "interpret"))
def lstm_layer_pallas(
    x_proj: Array,
    hh_w: Array,
    h0: Array,
    c0: Array,
    time_block: int = 8,
    interpret: bool = False,
):
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

    K = min(time_block, T)
    n_blocks = -(-T // K)
    T_pad = n_blocks * K
    last_k = T - (n_blocks - 1) * K
    if T_pad != T:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, T_pad - T), (0, 0), (0, 0)))

    grid = (n_targets, n_blocks)
    kernel = pl.pallas_call(
        _make_kernel(K, last_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K, D, G4), lambda j, b: (j, b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, G, G4), lambda j, b: (j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, G), lambda j, b: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, G), lambda j, b: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, D, G), lambda j, b: (j, b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, G), lambda j, b: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, G), lambda j, b: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_targets, T_pad, D, G), jnp.float32),
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
    return hs[:, :T], hT, cT


def _make_merged_kernel(K: int, last_k: int, R: int, B: int):
    def kernel(xp_ref, hh_w_ref, h0_ref, c0_ref, out_ref, hT_ref, cT_ref, h_s, c_s):
        """One grid step = ``K`` timesteps for ALL (target, direction)
        rows at once.  The R row chains are independent, so their MXU
        matmuls can pipeline back-to-back instead of serializing on the
        recurrence latency.  Each chain carries ``B`` batch rows (tracks /
        segments / requests) through its matmul: extra rows through SHARED
        weights ride the same MXU pass nearly free (PERF.md control
        measurement), which is what makes this kernel batch-native instead
        of serializing under vmap.

        Block shapes (RB = R*B, rows grouped chain-major):
          xp_ref: (K, RB, 4G)  hh_w_ref: (R, G, 4G)
          h0/c0:  (RB, G)      out_ref: (K, RB, G)
          hT/cT:  (RB, G)      scratch h_s/c_s: (RB, G) f32
        """
        b = pl.program_id(0)
        n_b = pl.num_programs(0)

        @pl.when(b == 0)
        def _():
            h_s[:] = h0_ref[:]
            c_s[:] = c0_ref[:]

        G = h_s.shape[1]

        def body(k, _):
            h = h_s[:]
            c = c_s[:]
            hb = h.astype(hh_w_ref.dtype)
            rec = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        hb[r * B : (r + 1) * B],
                        hh_w_ref[r],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for r in range(R)
                ],
                axis=0,
            )  # (RB, 4G)
            gates = xp_ref[pl.ds(k, 1)][0].astype(jnp.float32) + rec
            i = jax.nn.sigmoid(gates[:, :G])
            f = jax.nn.sigmoid(gates[:, G : 2 * G])
            g = jnp.tanh(gates[:, 2 * G : 3 * G])
            o = jax.nn.sigmoid(gates[:, 3 * G :])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            h_s[:] = h
            c_s[:] = c
            out_ref[pl.ds(k, 1)] = h[None]
            return 0

        # Full blocks run STATICALLY UNROLLED: static slice indices and no
        # loop-carried overhead buy ~8% step time (scripts/lstm_kernel_probe
        # unrollK variant).  Only the possibly-partial last block pays the
        # dynamic fori_loop; when T divides evenly everything unrolls.
        if last_k == K:
            for k in range(K):
                body(k, 0)
        else:

            @pl.when(b < n_b - 1)
            def _():
                for k in range(K):
                    body(k, 0)

            @pl.when(b == n_b - 1)
            def _():
                jax.lax.fori_loop(0, last_k, body, 0)

        @pl.when(b == n_b - 1)
        def _():
            hT_ref[:] = h_s[:]
            cT_ref[:] = c_s[:]

    return kernel


def _merged_rows(
    xp_rows: Array,
    hh_flat: Array,
    h0_rows: Array,
    c0_rows: Array,
    B: int,
    time_block: int,
    interpret: bool,
):
    """Raw merged-kernel invocation on chain-major row layout.

    xp_rows: (T, RB, 4G) f32, rows grouped so chain r owns rows
    [r*B, (r+1)*B).  hh_flat: (R, G, 4G).  h0/c0_rows: (RB, G) f32.
    Returns (hs (T, RB, G), hT (RB, G), cT (RB, G)).
    """
    T, RB, G4 = xp_rows.shape
    R = RB // B
    G = G4 // 4

    # Bound the xp block's VMEM footprint (double-buffered): large row
    # counts shrink the time block instead of blowing scoped VMEM.
    # (_pick_K is shared with the VJP kernels — fwd/bwd must agree.)
    K = _pick_K(T, RB, G4, time_block)
    n_blocks = -(-T // K)
    T_pad = n_blocks * K
    last_k = T - (n_blocks - 1) * K
    if T_pad != T:
        xp_rows = jnp.pad(xp_rows, ((0, T_pad - T), (0, 0), (0, 0)))

    kernel = pl.pallas_call(
        _make_merged_kernel(K, last_k, R, B),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((K, RB, G4), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, G, G4), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, RB, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, RB, G), jnp.float32),
            jax.ShapeDtypeStruct((RB, G), jnp.float32),
            jax.ShapeDtypeStruct((RB, G), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RB, G), jnp.float32),
            pltpu.VMEM((RB, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    hs, hT, cT = kernel(xp_rows, hh_flat, h0_rows, c0_rows)
    return hs[:T], hT, cT


# ---------------------------------------------------------------------------
# Training path: custom VJP for the merged kernel
# ---------------------------------------------------------------------------
#
# The inference kernel keeps nothing but the final state, so autodiff
# can't see through it and training historically fell back to the
# lax.scan BLSTM (46.2 ms vs 33.0 ms recurrence at UMX-L segment shape —
# PERF.md).  The VJP pair below keeps kernel-grade latency in training:
#
# * forward (residual mode): the same time-blocked recurrence, but each
#   step also streams the ACTIVATED gates (i, f, g, o) and cell state to
#   HBM, plus each block's incoming h/c (h_{bK-1}, c_{bK-1}) so the
#   backward kernel never needs a value that lives in a neighboring
#   block.  This is the standard cuDNN-style trade: one extra
#   (T, RB, 5G) f32 write buys a backward pass with no recomputation.
# * backward: one Pallas kernel over the same time blocks in REVERSE
#   grid order (index maps b -> n_blocks-1-b), carrying (dh, dc) in VMEM
#   scratch.  Per step it forms the gate cotangents and the dh chain
#   matmul (dgates @ Whh^T); the weight gradient accumulates ONCE PER
#   BLOCK as a (G, K*B) x (K*B, 4G) MXU matmul per chain (the per-step
#   outer-product form would move the resident (R, G, 4G) f32 dW through
#   the VPU every timestep).


def _make_merged_train_kernel(K: int, last_k: int, R: int, B: int):
    def kernel(
        xp_ref, hh_w_ref, h0_ref, c0_ref,
        out_ref, hT_ref, cT_ref, gates_ref, cs_ref, hin_ref, cin_ref,
        h_s, c_s,
    ):
        """Forward with residuals.  Extra block shapes:
        gates_ref: (K, RB, 4G) activated (i|f|g|o); cs_ref: (K, RB, G);
        hin/cin_ref: (1, RB, G) — the h/c entering this block."""
        b = pl.program_id(0)
        n_b = pl.num_programs(0)

        @pl.when(b == 0)
        def _():
            h_s[:] = h0_ref[:]
            c_s[:] = c0_ref[:]

        hin_ref[0] = h_s[:]
        cin_ref[0] = c_s[:]

        G = h_s.shape[1]

        def body(k, _):
            h = h_s[:]
            c = c_s[:]
            hb = h.astype(hh_w_ref.dtype)
            rec = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        hb[r * B : (r + 1) * B],
                        hh_w_ref[r],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for r in range(R)
                ],
                axis=0,
            )
            gates = xp_ref[pl.ds(k, 1)][0].astype(jnp.float32) + rec
            i = jax.nn.sigmoid(gates[:, :G])
            f = jax.nn.sigmoid(gates[:, G : 2 * G])
            g = jnp.tanh(gates[:, 2 * G : 3 * G])
            o = jax.nn.sigmoid(gates[:, 3 * G :])
            gates_ref[pl.ds(k, 1)] = jnp.concatenate([i, f, g, o], axis=1)[None]
            c = f * c + i * g
            h = o * jnp.tanh(c)
            cs_ref[pl.ds(k, 1)] = c[None]
            h_s[:] = h
            c_s[:] = c
            out_ref[pl.ds(k, 1)] = h[None]
            return 0

        if last_k == K:
            for k in range(K):
                body(k, 0)
        else:

            @pl.when(b < n_b - 1)
            def _():
                for k in range(K):
                    body(k, 0)

            @pl.when(b == n_b - 1)
            def _():
                jax.lax.fori_loop(0, last_k, body, 0)

        @pl.when(b == n_b - 1)
        def _():
            hT_ref[:] = h_s[:]
            cT_ref[:] = c_s[:]

    return kernel


def _make_merged_bwd_kernel(K: int, last_k: int, R: int, B: int):
    def kernel(
        gates_ref, cs_ref, hs_ref, hin_ref, cin_ref, hh_w_ref,
        dhs_ref, dhT_ref, dcT_ref,
        dxp_ref, dw_ref, dh0_ref, dc0_ref,
        dh_s, dc_s,
    ):
        """Reverse-time block step.  Grid step b processes time block
        n_blocks-1-b (the index maps reverse); (dh, dc) carry in scratch.
        dw_ref (R, G, 4G) f32 has a constant index map — it stays VMEM-
        resident across the whole grid and accumulates per block."""
        b = pl.program_id(0)
        n_b = pl.num_programs(0)
        G = dh_s.shape[1]

        @pl.when(b == 0)
        def _():
            dh_s[:] = dhT_ref[:]
            dc_s[:] = dcT_ref[:]
            dw_ref[:] = jnp.zeros_like(dw_ref)

        def step(k):
            g4 = gates_ref[pl.ds(k, 1)][0]  # activated (RB, 4G)
            i = g4[:, :G]
            f = g4[:, G : 2 * G]
            g = g4[:, 2 * G : 3 * G]
            o = g4[:, 3 * G :]
            ct = cs_ref[pl.ds(k, 1)][0]
            cprev = (
                cs_ref[pl.ds(k - 1, 1)][0] if k > 0 else cin_ref[0]
            )
            tc = jnp.tanh(ct)
            dh = dh_s[:] + dhs_ref[pl.ds(k, 1)][0]
            do_ = dh * tc
            dct = dc_s[:] + dh * o * (1.0 - tc * tc)
            dgi = dct * g * i * (1.0 - i)
            dgf = dct * cprev * f * (1.0 - f)
            dgg = dct * i * (1.0 - g * g)
            dgo = do_ * o * (1.0 - o)
            dg4 = jnp.concatenate([dgi, dgf, dgg, dgo], axis=1)  # (RB, 4G)
            dxp_ref[pl.ds(k, 1)] = dg4[None]
            dgb = dg4.astype(hh_w_ref.dtype)
            dh_new = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        dgb[r * B : (r + 1) * B],
                        hh_w_ref[r],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for r in range(R)
                ],
                axis=0,
            )  # (RB, G) = dgates @ Whh^T
            dh_s[:] = dh_new
            dc_s[:] = dct * f

        def flush(steps):
            # block-level weight gradient: one (G, steps*B)x(steps*B, 4G)
            # MXU matmul per chain instead of steps outer products
            dg_all = dxp_ref[pl.ds(0, steps)]  # (steps, RB, 4G)
            hprev = jnp.concatenate(
                [hin_ref[pl.ds(0, 1)], hs_ref[pl.ds(0, steps - 1)]]
                if steps > 1
                else [hin_ref[pl.ds(0, 1)]],
                axis=0,
            )  # (steps, RB, G)
            for r in range(R):
                hp = hprev[:, r * B : (r + 1) * B].reshape(steps * B, G)
                dg = dg_all[:, r * B : (r + 1) * B].reshape(steps * B, 4 * G)
                dw_ref[r] += jax.lax.dot_general(
                    hp.astype(hh_w_ref.dtype),
                    dg.astype(hh_w_ref.dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        if last_k == K:
            for k in range(K - 1, -1, -1):
                step(k)
            flush(K)
        else:

            @pl.when(b == 0)
            def _():
                for k in range(last_k - 1, -1, -1):
                    step(k)
                flush(last_k)

            @pl.when(b > 0)
            def _():
                for k in range(K - 1, -1, -1):
                    step(k)
                flush(K)

        @pl.when(b == n_b - 1)
        def _():
            dh0_ref[:] = dh_s[:]
            dc0_ref[:] = dc_s[:]

    return kernel


def _pick_K(T: int, RB: int, G4: int, time_block: int) -> int:
    """Inference-kernel time-block size: bound the double-buffered xp
    block to 24 MB."""
    row_bytes = RB * G4 * 4
    return max(1, min(time_block, T, (24 * 1024 * 1024) // max(1, row_bytes)))


def _pick_K_train(T: int, RB: int, R: int, G4: int, time_block: int) -> int:
    """Time-block size SHARED by the residual forward and backward
    kernels (the residual layout — gates/cs blocks plus per-block
    hin/cin — bakes in the blocking, so fwd and bwd must agree).

    Sized against the BACKWARD kernel's scoped-VMEM budget, its worst
    case: resident bf16 weights (2 B/elt) + the f32 dW accumulator
    (4 B/elt) + double-buffered gates/dxp (4G wide) and cs/hs/dhs blocks.
    At UMX-L batch 32 the inference _pick_K choice (K=8) measured a
    124 MB scoped allocation against the 100 MB limit — this bound keeps
    large-batch training compiling instead of VMEM-OOMing, shrinking K
    only when RB grows past what the budget affords."""
    G = G4 // 4
    fixed = R * G * G4 * 6 + 8 * RB * G * 4  # hh(bf16)+dW(f32), hin/cin/carries
    per_k = RB * G4 * 4 * 4 + RB * G * 4 * 6  # gates,dxp x dbuf; cs/hs/dhs x dbuf
    budget = 92 * 1024 * 1024 - fixed
    return max(1, min(time_block, T, budget // max(1, per_k)))


def _merged_rows_train_fwd(xp_rows, hh_flat, h0_rows, c0_rows, B, time_block, interpret):
    """Residual-mode forward: merged recurrence + saved activations."""
    T, RB, G4 = xp_rows.shape
    R = RB // B
    G = G4 // 4
    hh_b = hh_flat.astype(jnp.bfloat16)
    K = _pick_K_train(T, RB, R, G4, time_block)
    n_blocks = -(-T // K)
    T_pad = n_blocks * K
    last_k = T - (n_blocks - 1) * K
    if T_pad != T:
        xp_rows = jnp.pad(xp_rows, ((0, T_pad - T), (0, 0), (0, 0)))

    kernel = pl.pallas_call(
        _make_merged_train_kernel(K, last_k, R, B),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((K, RB, G4), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, G, G4), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, RB, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, RB, G4), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, RB, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, RB, G), jnp.float32),
            jax.ShapeDtypeStruct((RB, G), jnp.float32),
            jax.ShapeDtypeStruct((RB, G), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, RB, G4), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, RB, G), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, RB, G), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, RB, G), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RB, G), jnp.float32),
            pltpu.VMEM((RB, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    hs, hT, cT, gates, cs, hin, cin = kernel(
        xp_rows, hh_b, h0_rows, c0_rows
    )
    return (hs[:T], hT, cT), (gates, cs, hs, hin, cin, hh_b)


def _merged_rows_train_bwd(B, time_block, interpret, res, cts):
    gates, cs, hs_pad, hin, cin, hh_b = res
    dhs, dhT, dcT = cts
    T_pad, RB, G4 = gates.shape
    R = RB // B
    G = G4 // 4
    T = dhs.shape[0]
    K = _pick_K_train(T, RB, R, G4, time_block)
    n_blocks = T_pad // K
    last_k = T - (n_blocks - 1) * K
    if T_pad != T:
        dhs = jnp.pad(dhs, ((0, T_pad - T), (0, 0), (0, 0)))
    rev = n_blocks - 1

    kernel = pl.pallas_call(
        _make_merged_bwd_kernel(K, last_k, R, B),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((K, RB, G4), lambda b: (rev - b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, RB, G), lambda b: (rev - b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, RB, G), lambda b: (rev - b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, G), lambda b: (rev - b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, G), lambda b: (rev - b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, G, G4), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, RB, G), lambda b: (rev - b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, RB, G4), lambda b: (rev - b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, G, G4), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, RB, G4), jnp.float32),
            jax.ShapeDtypeStruct((R, G, G4), jnp.float32),
            jax.ShapeDtypeStruct((RB, G), jnp.float32),
            jax.ShapeDtypeStruct((RB, G), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RB, G), jnp.float32),
            pltpu.VMEM((RB, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    dxp, dw, dh0, dc0 = kernel(
        gates, cs, hs_pad, hin, cin, hh_b,
        dhs, dhT.astype(jnp.float32), dcT.astype(jnp.float32),
    )
    return dxp[:T], dw, dh0, dc0


@functools.lru_cache(maxsize=None)
def _merged_batched_vjp(time_block: int, interpret: bool):
    """custom_vjp at the explicitly-BATCHED level (the training entry):
    primal-only evaluation runs the inference kernel untouched; under AD
    the residual forward + reverse-grid backward kernels run instead.

    Defined at the batched level rather than inside the custom_vmap
    wrappers because custom_vmap's call primitive defines no AD rules —
    wrapping a custom_vjp inside it still fails to linearize.  The
    trainer therefore passes its batch axis EXPLICITLY (no vmap), which
    also folds batch rows into the kernel's matmuls by construction.
    ``hh_w`` enters f32 so the accumulated weight cotangent leaves f32
    (the bf16 MXU cast happens inside; a bf16 boundary would round the
    summed dWhh once more on the way out)."""

    @jax.custom_vjp
    def call(x_proj, hh_w, h0, c0):
        return _merged_batched_impl(x_proj, hh_w, h0, c0, time_block, interpret)

    def fwd(x_proj, hh_w, h0, c0):
        Bsz, n_targets, T, D, G4 = x_proj.shape
        G = G4 // 4
        R = n_targets * D
        hh_flat = hh_w.astype(jnp.float32).reshape(R, G, G4)
        xp_rows = jnp.transpose(x_proj, (2, 1, 3, 0, 4)).reshape(T, R * Bsz, G4)
        h0_rows = jnp.transpose(h0.astype(jnp.float32), (1, 2, 0, 3)).reshape(R * Bsz, G)
        c0_rows = jnp.transpose(c0.astype(jnp.float32), (1, 2, 0, 3)).reshape(R * Bsz, G)
        (hs, hT, cT), res = _merged_rows_train_fwd(
            xp_rows, hh_flat, h0_rows, c0_rows, Bsz, time_block, interpret
        )
        hs_b = jnp.transpose(hs.reshape(T, n_targets, D, Bsz, G), (3, 1, 0, 2, 4))
        hT_b = jnp.transpose(hT.reshape(n_targets, D, Bsz, G), (2, 0, 1, 3))
        cT_b = jnp.transpose(cT.reshape(n_targets, D, Bsz, G), (2, 0, 1, 3))
        return (hs_b, hT_b, cT_b), res

    def bwd(res, cts):
        dhs_b, dhT_b, dcT_b = cts
        Bsz, n_targets, T, D, G = dhs_b.shape
        R = n_targets * D
        dhs = jnp.transpose(
            dhs_b.astype(jnp.float32), (2, 1, 3, 0, 4)
        ).reshape(T, R * Bsz, G)
        dhT = jnp.transpose(
            dhT_b.astype(jnp.float32), (1, 2, 0, 3)
        ).reshape(R * Bsz, G)
        dcT = jnp.transpose(
            dcT_b.astype(jnp.float32), (1, 2, 0, 3)
        ).reshape(R * Bsz, G)
        dxp, dw, dh0, dc0 = _merged_rows_train_bwd(
            Bsz, time_block, interpret, res, (dhs, dhT, dcT)
        )
        dx_b = jnp.transpose(
            dxp.reshape(T, n_targets, D, Bsz, 4 * G), (3, 1, 0, 2, 4)
        )
        dw_b = dw.reshape(n_targets, D, G, 4 * G)
        dh0_b = jnp.transpose(dh0.reshape(n_targets, D, Bsz, G), (2, 0, 1, 3))
        dc0_b = jnp.transpose(dc0.reshape(n_targets, D, Bsz, G), (2, 0, 1, 3))
        return dx_b, dw_b, dh0_b, dc0_b

    call.defvjp(fwd, bwd)
    return call


def lstm_layer_pallas_merged_batched(
    x_proj: Array,
    hh_w: Array,
    h0: Array,
    c0: Array,
    time_block: int = 8,
    interpret: bool = False,
):
    """Explicitly-batched, DIFFERENTIABLE merged layer (training entry).

    x_proj: (B, T#, T, D, 4G); hh_w: (T#, D, G, 4G) float32;
    h0/c0: (B, T#, D, G).  Returns (hs (B, T#, T, D, G), hT, cT).
    The primal is the inference kernel; jax.grad runs the residual-mode
    forward + reverse-grid backward kernels (custom VJP above)."""
    return _merged_batched_vjp(time_block, interpret)(
        x_proj, hh_w.astype(jnp.float32),
        h0.astype(jnp.float32), c0.astype(jnp.float32),
    )


def _merged_batched_impl(x_proj, hh_w, h0, c0, time_block, interpret):
    """Batched merged layer: fold the batch axis into matmul rows.

    x_proj: (B, T#, T, D, 4G), hh_w: (T#, D, G, 4G), h0/c0: (B, T#, D, G).
    Returns (hs (B, T#, T, D, G), hT (B, T#, D, G), cT (B, T#, D, G)).
    """
    Bsz, n_targets, T, D, G4 = x_proj.shape
    G = G4 // 4
    R = n_targets * D
    hh_flat = hh_w.astype(jnp.bfloat16).reshape(R, G, G4)
    # rows chain-major: row = ((t# * D) + d) * B + b
    xp_rows = jnp.transpose(x_proj, (2, 1, 3, 0, 4)).reshape(T, R * Bsz, G4)
    h0_rows = jnp.transpose(h0.astype(jnp.float32), (1, 2, 0, 3)).reshape(R * Bsz, G)
    c0_rows = jnp.transpose(c0.astype(jnp.float32), (1, 2, 0, 3)).reshape(R * Bsz, G)

    hs, hT, cT = _merged_rows(
        xp_rows, hh_flat, h0_rows, c0_rows, Bsz, time_block, interpret
    )
    hs = jnp.transpose(hs.reshape(T, n_targets, D, Bsz, G), (3, 1, 0, 2, 4))
    hT = jnp.transpose(hT.reshape(n_targets, D, Bsz, G), (2, 0, 1, 3))
    cT = jnp.transpose(cT.reshape(n_targets, D, Bsz, G), (2, 0, 1, 3))
    return hs, hT, cT


@functools.lru_cache(maxsize=None)
def _merged_batched_custom(time_block: int, interpret: bool):
    """custom_vmap wrapper for the BATCHED merged call: a further vmap
    level folds its axis into the existing batch dimension (rows through
    shared weights) instead of serializing the Pallas grid."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def call(x_proj, hh_w, h0, c0):
        return _merged_batched_impl(x_proj, hh_w, h0, c0, time_block, interpret)

    @call.def_vmap
    def rule(axis_size, in_batched, x_proj, hh_w, h0, c0):
        xb, wb, hb, cb_ = in_batched

        def bc(a, isb):
            return a if isb else jnp.broadcast_to(a[None], (axis_size, *a.shape))

        if wb:
            # per-instance weights: chains are weight-distinct, nothing to
            # fold — run instances sequentially (same as default vmap).
            outs = jax.lax.map(
                lambda args: call(*args),
                (bc(x_proj, xb), hh_w, bc(h0, hb), bc(c0, cb_)),
            )
            return outs, (True, True, True)

        x_proj = bc(x_proj, xb)
        h0 = bc(h0, hb)
        c0 = bc(c0, cb_)
        B2, B1 = x_proj.shape[0], x_proj.shape[1]
        fold = lambda a: a.reshape(B2 * B1, *a.shape[2:])
        hs, hT, cT = call(fold(x_proj), hh_w, fold(h0), fold(c0))
        unfold = lambda a: a.reshape(B2, B1, *a.shape[1:])
        return (unfold(hs), unfold(hT), unfold(cT)), (True, True, True)

    return call


@functools.lru_cache(maxsize=None)
def _merged_custom(time_block: int, interpret: bool):
    """custom_vmap wrapper for the UNBATCHED merged call (the public
    entry): vmap folds the mapped axis into matmul batch rows."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def call(x_proj, hh_w, h0, c0):
        hs, hT, cT = _merged_batched_impl(
            x_proj[None], hh_w, h0[None], c0[None], time_block, interpret
        )
        return hs[0], hT[0], cT[0]

    @call.def_vmap
    def rule(axis_size, in_batched, x_proj, hh_w, h0, c0):
        xb, wb, hb, cb_ = in_batched

        def bc(a, isb):
            return a if isb else jnp.broadcast_to(a[None], (axis_size, *a.shape))

        if wb:
            outs = jax.lax.map(
                lambda args: call(*args),
                (bc(x_proj, xb), hh_w, bc(h0, hb), bc(c0, cb_)),
            )
            return outs, (True, True, True)

        batched = _merged_batched_custom(time_block, interpret)
        outs = batched(bc(x_proj, xb), hh_w, bc(h0, hb), bc(c0, cb_))
        return outs, (True, True, True)

    return call


@functools.partial(jax.jit, static_argnames=("time_block", "interpret"))
def lstm_layer_pallas_merged(
    x_proj: Array,
    hh_w: Array,
    h0: Array,
    c0: Array,
    time_block: int = 8,
    interpret: bool = False,
):
    """Target-merged variant: grid over time only; all targets' and
    directions' weights resident in VMEM simultaneously (UMX-L bf16:
    8*512*2048*2B = 16.8 MB) so the 8 independent recurrence chains
    pipeline the MXU within each step.

    Batch-native under ``jax.vmap``: a custom_vmap rule folds mapped axes
    into extra matmul rows through the shared (per-chain) weights, so
    batched tracks / segments / requests keep kernel-grade recurrence
    latency instead of serializing the grid (the default vmap-over-Pallas
    behavior).

    Same signature/returns as :func:`lstm_layer_pallas`.
    """
    return _merged_custom(time_block, interpret)(
        x_proj, hh_w, h0.astype(jnp.float32), c0.astype(jnp.float32)
    )
