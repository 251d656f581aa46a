"""Fused Cooley-Tukey iSTFT — the lane-efficient CT factorization.

Replaces the dense (2049, 4096) inverse-DFT matmul (ops/fft.py::irdft,
semantics of reference src/dsp.cpp:178-258) with a two-stage CT
factorization chosen so that, on TPU, *no tensor ever changes layout
between the spectral input and the time-domain frames*:

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
# Fused natural-layout kernel (round 3, second design)
#
# The first design required the spectra in bins-major layout; the
# (T, 2C, N1) -> (2C, N1, T) relayout alone measured 12.6 ms on-chip —
# as much as the whole dense iSTFT (scripts/ct2_decompose_probe.py).
# This kernel consumes the planes in their NATURAL (T-major, F-lanes)
# layout and keeps every tensor in a pinned layout end to end:
#
# * the (re, im) planes are fold-weighted, bin-padded to 17*128, and
#   stacked to (..., T, 40, 128) rows [vre(17); vim(17); 0(6)] — all
#   elementwise/pad ops, no transpose; 40 rows keep the sublane tiling
#   8-aligned so the global (T*40, 128) flattening is free;
# * stage 1 contracts the 40 stacked bin rows of g frames at once with a
#   BLOCK-DIAGONAL (g*40, g*32) constant: out (128 e-rows, g*32 (f,a)
#   lanes).  The g x MAC waste of the zero blocks is the price of
#   keeping frames batched through one MXU pass from the natural layout
#   (per-frame dots are issue-bound: ~20k frames x ~200 cycles);
# * twiddle is 2D elementwise against (128, g*32)-tiled constants;
# * stage 2 is a dense (128,128) @ (128, g*32) pair per group — e rows
#   in, b' rows out — with the synthesis window folded in;
# * groups write static lane slices of a flat (128, K_f*32) block into
#   the global (B, 128, Tpad*32) PERMUTED-FLAT frame tensor: sample
#   n = 32 b' + a of frame t lives at [b', t*32 + a].
#
# Overlap-add then runs IN the permuted-flat domain: hop = 1024 = 32*32
# means piece u of a frame is the contiguous row slice [32u, 32u+32),
# and a one-hop shift is a 32*32-element (4 KiB, DMA-granule-aligned)
# lane shift — so OLA is 4 static row-slices + lane pads + adds.  Only
# the summed signal (~n_fft/hop x smaller than the frames) pays the one
# unavoidable relayout back to time order.
# ---------------------------------------------------------------------------

_C_PAD = 3  # zero rows appended to the 2*17 stacked bin rows -> 40 (8 | 40)


@functools.lru_cache(maxsize=4)
def _ct2f_consts_np(n_fft: int, g: int):
    n2 = _n2(n_fft)
    c_rows = _c_rows(n_fft)
    rows = 2 * c_rows + 2 * _C_PAD  # 40 at n_fft=4096
    wstack, twc, tws, c2, s2 = _ct2_consts_np(n_fft)
    c1 = wstack[:c_rows, :n2]  # cos(2pi c a / n2)
    s1 = wstack[:c_rows, n2 : 2 * n2]  # sin
    zero = np.zeros((2 * _C_PAD, n2), np.float32)
    w1re = np.concatenate([c1, -s1, zero])  # (40, 32): U_re rows
    w1im = np.concatenate([s1, c1, zero])  # (40, 32): U_im rows
    f32 = np.float32

    def bd(m):  # block-diagonal over the g frames of a group
        out = np.zeros((g * rows, g * m.shape[1]), f32)
        for i in range(g):
            out[i * rows : (i + 1) * rows, i * m.shape[1] : (i + 1) * m.shape[1]] = m
        return out

    return (
        bd(w1re),
        bd(w1im),
        np.tile(twc, (1, g)).astype(f32),  # (128, g*32)
        np.tile(tws, (1, g)).astype(f32),
        c2,  # (128, 128) cos(2pi e b / 128)
        s2,
    )


def ct2f_vstack(re: Array, im: Array, n_fft: int) -> Array:
    """Natural-layout fold: planes (..., T, n_bins) -> (..., T, 40, 128).

    Pure elementwise + pad + free reshapes — NO transpose (the whole
    point of this formulation)."""
    c_rows = _c_rows(n_fft)
    n_bins = re.shape[-1]
    assert n_bins == n_fft // 2 + 1
    lead = re.shape[:-2]
    t = re.shape[-2]
    w = jnp.full((n_bins,), 2.0 / n_fft, jnp.float32)
    w = w.at[0].set(1.0 / n_fft).at[-1].set(1.0 / n_fft)
    pad = c_rows * N1 - n_bins
    widths = [(0, 0)] * len(lead) + [(0, 0), (0, pad)]
    vre = jnp.pad(re.astype(jnp.float32) * w, widths).reshape(*lead, t, c_rows, N1)
    vim = jnp.pad(im.astype(jnp.float32) * w, widths).reshape(*lead, t, c_rows, N1)
    zeros = jnp.zeros((*lead, t, 2 * _C_PAD, N1), jnp.float32)
    return jnp.concatenate([vre, vim, zeros], axis=-2)  # (..., T, 40, 128)


def _ct2f_kernel_call(
    v: Array, n_fft: int, window: Array | None, g: int, kf: int, interpret: bool
) -> Array:
    """v (B, Tpad, 40, 128) natural-stacked -> permuted-flat frames
    (B, 128, Tpad*32)."""
    n2 = _n2(n_fft)
    b_sz, t_pad, rows, n1 = v.shape
    assert n1 == N1 and rows == 2 * _c_rows(n_fft) + 2 * _C_PAD
    assert t_pad % kf == 0 and kf % g == 0
    w1re, w1im, twc_g, tws_g, c2, s2 = (
        jnp.asarray(m) for m in _ct2f_consts_np(n_fft, g)
    )
    if window is not None:
        win2 = jnp.asarray(window, jnp.float32).reshape(N1, n2)
    else:
        win2 = jnp.ones((N1, n2), jnp.float32)
    wgrid_g = jnp.tile(win2, (1, g))  # (128, g*32)

    v2 = v.reshape(b_sz, t_pad * rows, N1)  # free: 8 | rows, lanes fixed
    n_groups = kf // g
    grid = (b_sz, t_pad // kf)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, ti: (0,) * len(shape))

    def kernel(v_ref, w1re_ref, w1im_ref, twc_ref, tws_ref, c2_ref, s2_ref,
               wg_ref, o_ref):
        for gi in range(n_groups):
            vg = v_ref[0, gi * g * rows : (gi + 1) * g * rows, :]  # (g*40, 128)
            ure = _dot0(vg, w1re_ref[...])  # (128 e, g*32 (f,a))
            uim = _dot0(vg, w1im_ref[...])
            tre = ure * twc_ref[...] - uim * tws_ref[...]
            tim = ure * tws_ref[...] + uim * twc_ref[...]
            xg = _dot0(c2_ref[...], tre) - _dot0(s2_ref[...], tim)  # (128 b, g*32)
            o_ref[0, :, gi * g * n2 : (gi + 1) * g * n2] = xg * wg_ref[...]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, kf * rows, N1), lambda bi, ti: (bi, ti, 0)),
            const(w1re.shape),
            const(w1im.shape),
            const(twc_g.shape),
            const(tws_g.shape),
            const(c2.shape),
            const(s2.shape),
            const(wgrid_g.shape),
        ],
        out_specs=pl.BlockSpec((1, N1, kf * n2), lambda bi, ti: (bi, 0, ti)),
        out_shape=jax.ShapeDtypeStruct((b_sz, N1, t_pad * n2), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(v2, w1re, w1im, twc_g, tws_g, c2, s2, wgrid_g)


def overlap_add_perm_flat(xf: Array, n_fft: int, hop: int, t: int) -> Array:
    """Overlap-add + un-permute from the permuted-flat frame tensor.

    xf (..., N1, Tpad*n2) with sample ``n2*b' + a`` of frame ``t`` at
    ``[..., b', t*n2 + a]`` -> signal (..., (t-1)*hop + n_fft).

    All OLA arithmetic stays in the permuted domain: piece u of a frame
    is the contiguous row slice [pb*u, pb*u+pb), and the frame axis is
    n2-element groups of lanes, so the hop shift is a lane pad by a
    multiple of n2*pb... strictly: slot h receives piece u of frame
    h - u, i.e. row-block u shifted u frames right.  Only the summed
    signal — n_fft/hop x smaller than the frames — pays the final
    relayout to time order."""
    n2 = _n2(n_fft)
    pieces = n_fft // hop
    pb = N1 // pieces  # rows per hop piece (32)
    assert pb * n2 == hop
    lead = xf.shape[:-2]
    nl = len(lead)
    xf = xf[..., : t * n2]  # crop padded frames
    total = None
    for u in range(pieces):
        sl = xf[..., u * pb : (u + 1) * pb, :]  # (..., pb, t*n2)
        sl = jnp.pad(sl, [(0, 0)] * nl + [(0, 0), (u * n2, (pieces - 1 - u) * n2)])
        total = sl if total is None else total + sl
    h = t + pieces - 1  # hop slots
    # total (..., pb, h*n2): slot h2's samples hop*h2 + n2*b2 + a at
    # [..., b2, h2*n2 + a].  Un-permute: -> (..., h, pb, n2) -> flat.
    s3 = total.reshape(*lead, pb, h, n2)
    s3 = jnp.moveaxis(s3, -3, -2)  # (..., h, pb, n2)
    return s3.reshape(*lead, h * hop)


def istft_ct2_fused(
    re: Array,
    im: Array,
    n_fft: int,
    hop: int,
    window: Array | None = None,
    g: int = 4,
    kf: int = 8,
    interpret: bool = False,
) -> Array:
    """Natural-layout fused CT iSTFT: planes (..., T, n_bins) -> raw
    overlap-added signal (..., (T-1)*hop + n_fft) — the drop-in
    replacement for irdft+overlap_add (window folded; the caller still
    divides by the window-sumsquare envelope)."""
    lead = re.shape[:-2]
    t = re.shape[-2]
    v = ct2f_vstack(re, im, n_fft)  # (..., T, 40, 128)
    v = v.reshape(-1, *v.shape[-3:])
    t_pad = -(-t // kf) * kf
    if t_pad != t:
        v = jnp.pad(v, [(0, 0), (0, t_pad - t), (0, 0), (0, 0)])
    xf = _ct2f_kernel_call(v, n_fft, window, g, kf, interpret)
    sig = overlap_add_perm_flat(xf, n_fft, hop, t)
    return sig.reshape(*lead, sig.shape[-1])


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
