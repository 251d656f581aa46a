"""Fused Cooley-Tukey iSTFT — a CLOSED NEGATIVE RESULT kept as an A/B arm.

Round-3 verdict (scripts/ct2_decompose_probe.py, PERF.md): every
formulation of the CT factorization is layout-bound on this chip and
loses to the dense matmul-DFT at single-pass bf16 precision
(istft[dense@default] 6.9 ms vs the best fused CT kernel 11.7 ms).
The 12x MAC saving cannot be banked because the spectra arrive
T-major/F-lanes and every route to a contractable layout costs more
than the MACs saved: XLA bins-major transpose 12.6 ms, minor-split
reshape 14.3 ms, sub-512-byte OLA lane shifts 14 ms, in-kernel VMEM
assembly copies ~5+ ms (~700k single-vreg moves).  The shipped iSTFT
is ops/stft.py istft_planes with ``idft_precision`` (PARITY.md bounds).

This module preserves the working implementations as measurement /
parity arms (``istft_algo="ct2" | "ct2_xla" | "ct2_interpret"``).

The factorization replaces the dense (2049, 4096) inverse-DFT matmul
(ops/fft.py::irdft, semantics of reference src/dsp.cpp:178-258) with a
two-stage CT split chosen so that, on TPU, *no tensor ever changes
layout between the spectral input and the time-domain frames*:

    k = N1*c' + e'      (bins:   c' in [0, C),  e' in [0, N1=128))
    n = N2*b' + a'      (time:   b' in [0, N1), a' in [0, N2=32))

    x[n] = Re{ sum_k v[k] e^{2pi i nk/N} },  v = w_k X / N  (half-spectrum
    fold weights w_0 = w_{N/2} = 1, else 2 — same fold as irdft)

    nk/N = b'c' + b'e'/N1 + a'c'/N2 + a'e'/N, so:

    stage 1 (contract c'):  U[e', a'] = sum_c' v[c', e'] W1[c', a']
    twiddle (elementwise):  T[e', a'] = U[e', a'] * e^{2pi i a'e'/N}
    stage 2 (contract e'):  x[N2*b' + a'] = Re{ sum_e' T[e', a'] W2[e', b'] }

Why this decimation (round-2 on-chip probes, scripts/ct_feasibility_probe.py):

* The half spectrum (2049 of 4096 bins) occupies only c' in [0, 16] —
  stage 1 contracts 17 rows instead of 65 (the other pairing).
* Both contractions are over the *leading* axis of the operand
  (``dot_general`` dimension_numbers ``((0,), (0,))``), which the probe
  validated lowers in Mosaic at HIGHEST precision with parity-grade
  accuracy (3.4e-7) and needs no operand transposes.
* Stage 2's output ordering is (b', frames, a'): with n = 32b' + a',
  hop-sized pieces of each frame are contiguous b'-slices (hop=1024 =
  32*N2), so overlap-add runs *in the permuted domain* and only the
  final ~10x-smaller signal is un-permuted (power-of-2 minor dims —
  immune to the 44.1 kHz DMA-misalignment tax that sank the previous
  CT attempt, PERF.md "relayout-bound at 96 GB/s").
* The synthesis window w[n] = wgrid[b', a'] is an elementwise epilogue
  inside the kernel (folded, like ops/fft.py irdft(window=)).

MAC count: ~1.4M real MACs/frame vs 16.8M for the dense matmul-DFT —
12x fewer at the same (HIGHEST, 6-pass fp32) accuracy class.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

N1 = 128  # e'/b' extent — the MXU-native factor
_HIGHEST = jax.lax.Precision.HIGHEST


def _n2(n_fft: int) -> int:
    assert n_fft % (N1 * 8) == 0, f"ct2 requires 1024 | n_fft, got {n_fft}"
    return n_fft // N1


def _c_rows(n_fft: int) -> int:
    """Rows of the (c', e') bin grid covering the one-sided spectrum."""
    return (n_fft // 2) // N1 + 1  # 17 at n_fft=4096


@functools.lru_cache(maxsize=4)
def _ct2_consts_np(n_fft: int):
    n2 = _n2(n_fft)
    c_rows = _c_rows(n_fft)
    f64 = np.float64
    c = np.arange(c_rows, dtype=f64)
    a = np.arange(n2, dtype=f64)
    e = np.arange(N1, dtype=f64)
    b = np.arange(N1, dtype=f64)
    ph1 = 2.0 * np.pi * c[:, None] * a[None, :] / n2          # (C, n2)
    pht = 2.0 * np.pi * e[:, None] * a[None, :] / n_fft       # (N1, n2)
    ph2 = 2.0 * np.pi * e[:, None] * b[None, :] / N1          # (N1, N1)
    c1, s1 = np.cos(ph1), np.sin(ph1)
    # One stacked stage-1 matrix: rows [vre; vim], cols [Ure | Uim]
    #   Ure = vre.C1 - vim.S1 ; Uim = vre.S1 + vim.C1
    wstack = np.block([[c1, s1], [-s1, c1]]).astype(np.float32)  # (2C, 2*n2)
    f32 = np.float32
    return (
        wstack,
        np.cos(pht).astype(f32), np.sin(pht).astype(f32),       # twiddle (N1, n2)
        np.cos(ph2).astype(f32), np.sin(ph2).astype(f32),       # stage 2 (N1, N1)
    )


def ct2_layout(re: Array, im: Array, n_fft: int, n_bins: int) -> Array:
    """Fold + scale + transpose spectral planes into the CT-ready layout.

    ``re, im (..., T, n_bins)`` → one stacked tensor ``(..., 2C, N1, T)``
    holding [vre; vim] on the leading bin-row axis, where
    ``v = w_k X / n_fft`` (conjugate-symmetry fold weights).

    This is the ONE layout-changing pass of the ct2 path (bins-major,
    frames-in-lanes); everything downstream is layout-static.  A
    producer kernel (Wiener apply / mask multiply) can emit this layout
    directly, making the pass free.
    """
    n2 = _n2(n_fft)
    c_rows = _c_rows(n_fft)
    assert n_bins == n_fft // 2 + 1
    lead = re.shape[:-2]
    t = re.shape[-2]
    w = jnp.full((n_bins,), 2.0 / n_fft, jnp.float32)
    w = w.at[0].set(1.0 / n_fft).at[-1].set(1.0 / n_fft)
    pad = c_rows * N1 - n_bins  # 127 zero bins to complete the last c' row
    padding = [(0, 0)] * len(lead) + [(0, 0), (0, pad)]
    vre = jnp.pad(re.astype(jnp.float32) * w, padding)
    vim = jnp.pad(im.astype(jnp.float32) * w, padding)
    v = jnp.concatenate(
        [
            vre.reshape(*lead, t, c_rows, N1),
            vim.reshape(*lead, t, c_rows, N1),
        ],
        axis=-2,
    )  # (..., T, 2C, N1)
    nl = len(lead)
    return v.transpose(*range(nl), nl + 1, nl + 2, nl)  # (..., 2C, N1, T)


def _stages_xla(v: Array, n_fft: int, window: Array | None) -> Array:
    """CT stages as XLA einsums (portable reference / A-B arm).

    ``v (..., 2C, N1, T)`` → permuted frames ``(..., N1, T, n2)`` where
    frame sample ``n2*b' + a'`` lives at ``[..., b', t, a']``.
    """
    n2 = _n2(n_fft)
    c_rows = _c_rows(n_fft)
    wstack, twc, tws, c2, s2 = (jnp.asarray(m) for m in _ct2_consts_np(n_fft))
    dot = functools.partial(jnp.einsum, precision=_HIGHEST)
    d = dot("...cet,cz->...etz", v, wstack)  # (..., N1, T, 2*n2)
    ure, uim = d[..., :n2], d[..., n2:]
    twc = twc[:, None, :]
    tws = tws[:, None, :]
    tre = ure * twc - uim * tws
    tim = ure * tws + uim * twc
    x = dot("...eta,eb->...bta", tre, c2) - dot("...eta,eb->...bta", tim, s2)
    if window is not None:
        x = x * window.reshape(N1, 1, n2)
    return x


def _dot0(m, x):
    """dim-0 contraction — the probe-validated Mosaic-friendly dot form."""
    return jax.lax.dot_general(
        m, x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=_HIGHEST,
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Fully-fused natural-layout kernel (round 3, third design)
#
# On-chip decomposition of the second design (ct2_decompose_probe):
# the XLA "vstack" fold cost 14.3 ms (the (T, 2176) -> (T, 17, 128)
# reshape is a relayout), the flat permuted OLA cost 14.0 ms (its
# 128-byte lane shifts are below the 512-byte DMA granule), and the
# block-diagonal stage-1 wasted g x MACs.  All three die together by
# moving EVERYTHING into one kernel:
#
# * the kernel reads the RAW (re, im) planes in natural (kf, 2049)
#   full-lane blocks (the proven Wiener-kernel block shape) — the only
#   XLA prep is halving the two Nyquist-fold columns and zero-padding
#   the frame axis;
# * a VMEM scratch assembly re-tiles each block to bins-major
#   (34, kf*128) via static (1, 128) row copies — the copies ARE the
#   layout change, at VMEM speed, so stage 1 is one DENSE
#   (34, kf*128) @ (34, 32) dot pair per block: zero block-diag waste
#   (the 2/n_fft fold weight lives inside the stage-1 constants);
# * twiddle is tiled-2D elementwise on (kf*128, 32);
# * a second scratch re-tiles T to (128, kf*32) via per-frame (128, 32)
#   tile copies, making stage 2 one dense (128, 128) @ (128, kf*32)
#   pair with the synthesis window folded in;
# * the OVERLAP-ADD happens in-kernel: a (32, (kf+3)*32) sliding
#   slot-window scratch accumulates each frame's four hop pieces
#   (static (32, 32) vreg adds), shifts by kf slots per grid step, and
#   writes each completed window once — the 338 MB frames tensor never
#   exists; the kernel's output IS the hop-slot-packed signal
#   (B, 32, H*32) with sample hop*h + 32*b2 + a at [b2, h*32 + a].
#
# Only that ~10x-smaller signal pays the one unavoidable relayout back
# to time order (XLA transpose of (32, H, 32) -> (H, 32, 32)).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _ct2f_consts_np(n_fft: int):
    n2 = _n2(n_fft)
    c_rows = _c_rows(n_fft)
    wstack, twc, tws, c2, s2 = _ct2_consts_np(n_fft)
    scale = 2.0 / n_fft  # fold weight, folded into stage 1 (Nyquist
    # columns are pre-halved by the caller)
    c1 = wstack[:c_rows, :n2] * scale
    s1 = wstack[:c_rows, n2 : 2 * n2] * scale
    w1re = np.concatenate([c1, -s1]).astype(np.float32)  # (34, 32)
    w1im = np.concatenate([s1, c1]).astype(np.float32)
    return w1re, w1im, twc, tws, c2, s2


def istft_ct2_fused(
    re: Array,
    im: Array,
    n_fft: int,
    hop: int,
    window: Array | None = None,
    kf: int = 16,
    interpret: bool = False,
) -> Array:
    """Fully-fused natural-layout CT iSTFT: planes (..., T, n_bins) ->
    raw overlap-added signal (..., (T-1)*hop + n_fft) — the drop-in
    replacement for irdft+overlap_add (window folded; the caller still
    divides by the window-sumsquare envelope)."""
    n2 = _n2(n_fft)
    c_rows = _c_rows(n_fft)
    pieces = n_fft // hop
    pb = N1 // pieces
    assert pb * n2 == hop, "ct2 fused OLA requires hop == n_fft/4"
    assert kf >= pieces
    lead = re.shape[:-2]
    t = re.shape[-2]
    n_bins = re.shape[-1]
    assert n_bins == n_fft // 2 + 1

    w1re, w1im, twc, tws, c2, s2 = (
        jnp.asarray(m) for m in _ct2f_consts_np(n_fft)
    )
    twc_t = jnp.tile(twc, (kf, 1))  # (kf*128, 32), row-tiled per frame
    tws_t = jnp.tile(tws, (kf, 1))
    if window is not None:
        win2 = jnp.asarray(window, jnp.float32).reshape(N1, n2)
    else:
        win2 = jnp.ones((N1, n2), jnp.float32)
    wgrid = jnp.tile(win2, (1, kf))  # (128, kf*32)

    # the 2/n_fft fold lives in the stage-1 constants; bins 0 and
    # Nyquist carry weight 1/n_fft -> halve those two lane columns
    half = jnp.ones((n_bins,), jnp.float32).at[0].set(0.5).at[-1].set(0.5)
    reb = (re.astype(jnp.float32) * half).reshape(-1, t, n_bins)
    imb = (im.astype(jnp.float32) * half).reshape(-1, t, n_bins)
    b_sz = reb.shape[0]

    n_steps = -(-(t + pieces - 1) // kf) + 1
    t_pad = n_steps * kf
    reb = jnp.pad(reb, [(0, 0), (0, t_pad - t), (0, 0)])
    imb = jnp.pad(imb, [(0, 0), (0, t_pad - t), (0, 0)])

    w_slots = kf + pieces - 1  # sliding slot window
    carry = pieces - 1

    def kernel(re_ref, im_ref, w1re_ref, w1im_ref, twc_ref, tws_ref,
               c2_ref, s2_ref, wg_ref, o_ref, vbins, t2re, t2im, pwin):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _():
            pwin[...] = jnp.zeros_like(pwin)

        # completed window [(ti-1)*kf, ti*kf) -> output block ti-1
        # (step 0 writes zeros to block 0; step 1 revisits it with data)
        o_ref[0] = pwin[:, : kf * n2]
        # slide the window kf slots left
        pwin[:, : carry * n2] = pwin[:, kf * n2 : w_slots * n2]
        pwin[:, carry * n2 :] = jnp.zeros((pb, kf * n2), jnp.float32)

        # ---- assembly: natural (kf, n_bins) -> bins-major (34, kf*128)
        # the last bin chunk is partial (lane 2048 only): zero its rows
        vbins[c_rows - 1 : c_rows, :] = jnp.zeros((1, kf * N1), jnp.float32)
        vbins[2 * c_rows - 1 : 2 * c_rows, :] = jnp.zeros((1, kf * N1), jnp.float32)
        for f in range(kf):
            for c in range(c_rows - 1):
                vbins[c : c + 1, f * N1 : (f + 1) * N1] = re_ref[
                    0, f : f + 1, c * N1 : (c + 1) * N1
                ]
                vbins[c_rows + c : c_rows + c + 1, f * N1 : (f + 1) * N1] = im_ref[
                    0, f : f + 1, c * N1 : (c + 1) * N1
                ]
            c = c_rows - 1
            vbins[c : c + 1, f * N1 : f * N1 + 1] = re_ref[
                0, f : f + 1, c * N1 : c * N1 + 1
            ]
            vbins[c_rows + c : c_rows + c + 1, f * N1 : f * N1 + 1] = im_ref[
                0, f : f + 1, c * N1 : c * N1 + 1
            ]

        # ---- stage 1 (dense) + twiddle: rows (f, e), lanes a
        ure = _dot0(vbins[...], w1re_ref[...])  # (kf*128, 32)
        uim = _dot0(vbins[...], w1im_ref[...])
        tre = ure * twc_ref[...] - uim * tws_ref[...]
        tim = ure * tws_ref[...] + uim * twc_ref[...]

        # ---- re-tile T to (128 e, kf*32 (f,a)) via per-frame tile copies
        for f in range(kf):
            t2re[:, f * n2 : (f + 1) * n2] = tre[f * N1 : (f + 1) * N1, :]
            t2im[:, f * n2 : (f + 1) * n2] = tim[f * N1 : (f + 1) * N1, :]

        # ---- stage 2 (dense) + window: rows b', lanes (f, a)
        xg = _dot0(c2_ref[...], t2re[...]) - _dot0(s2_ref[...], t2im[...])
        xg = xg * wg_ref[...]

        # ---- in-kernel OLA: piece u of local frame f -> slot f+u
        for f in range(kf):
            for u in range(pieces):
                s0 = (f + u) * n2
                pwin[:, s0 : s0 + n2] += xg[u * pb : (u + 1) * pb, f * n2 : (f + 1) * n2]

    out = pl.pallas_call(
        kernel,
        grid=(b_sz, n_steps),
        in_specs=[
            pl.BlockSpec((1, kf, n_bins), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, kf, n_bins), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec(w1re.shape, lambda bi, ti: (0, 0)),
            pl.BlockSpec(w1im.shape, lambda bi, ti: (0, 0)),
            pl.BlockSpec(twc_t.shape, lambda bi, ti: (0, 0)),
            pl.BlockSpec(tws_t.shape, lambda bi, ti: (0, 0)),
            pl.BlockSpec(c2.shape, lambda bi, ti: (0, 0)),
            pl.BlockSpec(s2.shape, lambda bi, ti: (0, 0)),
            pl.BlockSpec(wgrid.shape, lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, pb, kf * n2), lambda bi, ti: (bi, 0, jnp.maximum(ti - 1, 0))
        ),
        out_shape=jax.ShapeDtypeStruct((b_sz, pb, t_pad * n2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * c_rows, kf * N1), jnp.float32),
            pltpu.VMEM((N1, kf * n2), jnp.float32),
            pltpu.VMEM((N1, kf * n2), jnp.float32),
            pltpu.VMEM((pb, w_slots * n2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(reb, imb, w1re, w1im, twc_t, tws_t, c2, s2, wgrid)

    # out (B, pb, Tpad*n2): slot h's samples hop*h + n2*b2 + a at
    # [b2, h*n2 + a].  The signal is (T + pieces - 1) slots long.
    h = t + pieces - 1
    sig = out[:, :, : h * n2].reshape(b_sz, pb, h, n2)
    sig = jnp.moveaxis(sig, -3, -2).reshape(b_sz, h * hop)
    return sig.reshape(*lead, h * hop)


def overlap_add_perm(xp: Array, n_fft: int, hop: int) -> Array:
    """Overlap-add of frames held in the ct2 permuted layout.

    ``xp (..., N1, T, n2)`` (sample ``n2*b' + a'`` of frame t at
    ``[..., b', t, a']``) → signal ``(..., (T-1)*hop + n_fft)``.

    Because hop = 32*n2, the hop-piece decomposition of a frame is a
    contiguous b'-slice, so the OLA sum commutes with the permutation:
    pieces accumulate into hop slots via pads/adds along the (middle)
    frame axis, and only the summed signal — ~n_fft/hop times smaller
    than the frames tensor — pays the final un-permute, on power-of-2
    minor dims (no 44.1 kHz misalignment anywhere).
    """
    *lead, n1, t, n2 = xp.shape
    assert n1 == N1 and hop % n2 == 0
    pieces = n_fft // hop
    pb = hop // n2  # b' rows per hop piece
    assert pb * pieces == N1
    nl = len(lead)
    total = None
    for p in range(pieces):
        sl = xp[..., p * pb : (p + 1) * pb, :, :]
        sl = jnp.pad(sl, [(0, 0)] * nl + [(0, 0), (p, pieces - 1 - p), (0, 0)])
        total = sl if total is None else total + sl
    # total: (..., pb, H, n2) with H = T + pieces - 1 hop slots
    h = t + pieces - 1
    out = total.transpose(*range(nl), nl + 1, nl, nl + 2)  # (..., H, pb, n2)
    return out.reshape(*lead, h * hop)


def irdft_ct2(
    re: Array,
    im: Array,
    n_fft: int,
    window: Array | None = None,
    impl: str = "xla",
) -> Array:
    """Inverse-DFT-of-frames in the ct2 PERMUTED output layout, as XLA
    einsums (the A/B arm; the production Pallas path is
    :func:`istft_ct2_fused`, which never builds the bins-major layout).

    ``re, im (..., T, n_bins)`` → ``(..., N1, T, n2)`` permuted frames
    (feed to :func:`overlap_add_perm`, not :func:`ops.stft.overlap_add`).
    """
    assert impl == "xla", "pallas path moved to istft_ct2_fused"
    v = ct2_layout(re, im, n_fft, re.shape[-1])
    return _stages_xla(v, n_fft, window)
