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


def _stages_pallas(v: Array, n_fft: int, window: Array | None, interpret: bool) -> Array:
    """CT stages as TWO Pallas kernels with an HBM round trip between.

    ``v (B, 2C, N1, Tpad)`` with ``Tpad % 128 == 0`` → ``(B, N1, Tpad, n2)``.

    Mosaic layout rule learned on-chip (round 3): reshapes that MERGE a
    computed vreg's trailing dims into the lane dim ("(128,128,32) →
    (128,4096)") are *unsupported shape casts* — and a dim-0 dot_general
    with a 3D rhs lowers through exactly that reshape.  Load-side merges
    (ref[...] then reshape) and computed SUBLANE splits are fine.  So:

    * kernel A (stage 1 + twiddle): load-merge v to (2C, N1*kf), one
      stacked K=2C dot producing ([e' f], [Ure|Uim]), twiddle applied in
      2D against row-repeated constants, outputs written as the free
      sublane-split (N1, kf, n2) — giving T the (e', frames, a') HBM
      layout stage 2 wants;
    * kernel B (stage 2 + window): load-merge T blocks to (N1, kf*n2),
      two K=N1 dots → (b', [f a']), window epilogue in tiled-2D form,
      output written 2D and lane-split OUTSIDE the kernel (an XLA
      metadata reshape on the HBM array).

    The T round trip costs ~1.4 GB of HBM traffic per 60 s segment
    (~2 ms at the measured 653 GB/s) — accepted; every tensor keeps a
    pinned layout and the dense path's 694 GFLOP drop to ~55.
    """
    n2 = _n2(n_fft)
    c_rows = _c_rows(n_fft)
    b_sz, two_c, n1, t_pad = v.shape
    assert two_c == 2 * c_rows and n1 == N1 and t_pad % N1 == 0
    kf = N1  # frames per grid step (lane dim of the input block)
    wstack, twc, tws, c2, s2 = _ct2_consts_np(n_fft)
    # twiddle expanded to the 2D ([e' f], a') working form: row e' repeats
    # kf times (one per frame in the block)
    twc_x = jnp.asarray(np.repeat(twc, kf, axis=0))  # (N1*kf, n2)
    tws_x = jnp.asarray(np.repeat(tws, kf, axis=0))
    wstack, c2, s2 = jnp.asarray(wstack), jnp.asarray(c2), jnp.asarray(s2)
    # window expanded to the 2D (b', [f a']) output form: lanes tile kf x.
    # Built with jnp ops — `window` may be a traced array under jit.
    if window is not None:
        win2 = jnp.asarray(window, jnp.float32).reshape(N1, n2)
    else:
        win2 = jnp.ones((N1, n2), jnp.float32)
    wgrid_x = jnp.tile(win2, (1, kf))  # (N1, kf*n2)

    grid = (b_sz, t_pad // kf)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, ti: (0,) * len(shape))

    def kernel_a(v_ref, ws_ref, twc_ref, tws_ref, tre_ref, tim_ref):
        vs = v_ref[...].reshape(2 * c_rows, N1 * kf)  # load-side merge: ok
        d = _dot0(vs, ws_ref[...])  # ([e' f], [Ure | Uim])
        ure, uim = d[:, :n2], d[:, n2:]
        tre = ure * twc_ref[...] - uim * tws_ref[...]  # 2D twiddle
        tim = ure * tws_ref[...] + uim * twc_ref[...]
        # computed sublane SPLIT (lane dim n2 unchanged): supported
        tre_ref[...] = tre.reshape(1, N1, kf, n2)
        tim_ref[...] = tim.reshape(1, N1, kf, n2)

    t_shape = jax.ShapeDtypeStruct((b_sz, N1, t_pad, n2), jnp.float32)
    tre, tim = pl.pallas_call(
        kernel_a,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * c_rows, N1, kf), lambda bi, ti: (bi, 0, 0, ti)),
            const(wstack.shape),
            const(twc_x.shape),
            const(tws_x.shape),
        ],
        out_specs=[
            pl.BlockSpec((1, N1, kf, n2), lambda bi, ti: (bi, 0, ti, 0)),
            pl.BlockSpec((1, N1, kf, n2), lambda bi, ti: (bi, 0, ti, 0)),
        ],
        out_shape=[t_shape, t_shape],
        interpret=interpret,
    )(v, wstack, twc_x, tws_x)

    def kernel_b(tre_ref, tim_ref, c2_ref, s2_ref, wg_ref, o_ref):
        tre2 = tre_ref[...].reshape(N1, kf * n2)  # load-side merge: ok
        tim2 = tim_ref[...].reshape(N1, kf * n2)
        x = _dot0(c2_ref[...], tre2) - _dot0(s2_ref[...], tim2)  # (b', [f a'])
        o_ref[...] = (x * wg_ref[...]).reshape(1, N1, kf * n2)

    out2d = pl.pallas_call(
        kernel_b,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N1, kf, n2), lambda bi, ti: (bi, 0, ti, 0)),
            pl.BlockSpec((1, N1, kf, n2), lambda bi, ti: (bi, 0, ti, 0)),
            const(c2.shape),
            const(s2.shape),
            const(wgrid_x.shape),
        ],
        out_specs=pl.BlockSpec((1, N1, kf * n2), lambda bi, ti: (bi, 0, ti)),
        out_shape=jax.ShapeDtypeStruct((b_sz, N1, t_pad * n2), jnp.float32),
        interpret=interpret,
    )(tre, tim, c2, s2, wgrid_x)
    # lane-split OUTSIDE the kernel: free metadata reshape on the HBM array
    return out2d.reshape(b_sz, N1, t_pad, n2)


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
    """Drop-in inverse-DFT-of-frames in the ct2 PERMUTED output layout.

    ``re, im (..., T, n_bins)`` → ``(..., N1, T, n2)`` permuted frames
    (feed to :func:`overlap_add_perm`, not :func:`ops.stft.overlap_add`).
    ``impl``: "xla" | "pallas" | "pallas_interpret".
    """
    v = ct2_layout(re, im, n_fft, re.shape[-1])
    if impl == "xla":
        return _stages_xla(v, n_fft, window)
    lead = v.shape[:-3]
    t = v.shape[-1]
    t_pad = -(-t // N1) * N1
    v = v.reshape(-1, *v.shape[-3:])
    if t_pad != t:
        v = jnp.pad(v, [(0, 0), (0, 0), (0, 0), (0, t_pad - t)])
    x = _stages_pallas(v, n_fft, window, interpret=(impl == "pallas_interpret"))
    x = x[:, :, :t, :]
    return x.reshape(*lead, N1, t, x.shape[-1])
