"""Real DFT as MXU matmuls.

The TPU's compute power lives in the 128x128 systolic array, and the
axon TPU backend does not implement XLA's FFT op at all — so the 4096-pt
real transform is expressed as dense matmuls against constant cos/sin
matrices.  At UMX's fixed n_fft=4096 this costs ~34 MFLOP/frame, which
the MXU eats at a rate that makes the whole STFT a rounding error next
to the LSTM; in exchange the transform batches perfectly over
(channels x frames) and fuses with the window multiply.

Forward (one-sided, unscaled — matches Eigen FFT fwd with HalfSpectrum |
Unscaled, dsp.cpp:130-139, i.e. torch.stft normalized=False):

    Xre[k] =  sum_n x[n] cos(2 pi n k / N)
    Xim[k] = -sum_n x[n] sin(2 pi n k / N)          k in [0, N/2]

Inverse (includes the 1/N scaling torch.istft applies):

    x[n] = (1/N) sum_k w_k (Xre[k] cos(2 pi n k/N) - Xim[k] sin(2 pi n k/N))
    w_k = 1 for k in {0, N/2}, else 2   (conjugate-symmetry fold)

Both directions share the same two (N, N/2+1) constant matrices
(inverse contracts over the other axis), kept in float32 with HIGHEST
matmul precision so STFT round-trip error stays at fp32 FFT levels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=4)
def _dft_mats_np(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _dot(a: Array, b: Array, precision: str, transpose_b: bool = False) -> Array:
    contract = ((a.ndim - 1,), (1 if transpose_b else 0,))
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(contract, ((), ())),
        precision=_PRECISIONS[precision],
        preferred_element_type=jnp.float32,
    )


def rdft(x: Array, n_fft: int, precision: str = "high", algo: str = "dense") -> tuple[Array, Array]:
    """Forward one-sided real DFT of frames ``x (..., n_fft)`` →
    ``(re, im)`` each ``(..., n_fft//2 + 1)``.

    ``algo="dense"`` is one (n_fft, n_bins) matmul pair; ``algo="ct"`` is
    the two-stage Cooley-Tukey factorization (~12x fewer MXU FLOPs, see
    :func:`rdft_ct`)."""
    if algo == "ct":
        return rdft_ct(x, n_fft, precision)
    cos_m, sin_m = (jnp.asarray(m) for m in _dft_mats_np(n_fft))
    x = x.astype(jnp.float32)
    return _dot(x, cos_m, precision), -_dot(x, sin_m, precision)


def irdft(
    re: Array,
    im: Array,
    n_fft: int,
    precision: str = "high",
    algo: str = "dense",
    window: Array | None = None,
    out_dtype=jnp.float32,
) -> Array:
    """Inverse of :func:`rdft` with 1/N scaling → frames ``(..., n_fft)``.

    ``window`` (n_fft,) is the synthesis window, FOLDED INTO the inverse
    transform: for the dense algo it is baked into the constant iDFT
    matrices (zero extra passes over the frame tensor), for the CT algo it
    multiplies the last stage's epilogue.  This removes the separate
    window-multiply pass the reference does after its per-frame iFFT
    (dsp.cpp:178-258).

    ``out_dtype=bfloat16`` downcasts in the subtract epilogue (free in
    the dot fusion; the cos/sin products still cancel in f32) — halves
    the frame tensor the downstream overlap-add streams (339 → 169 MB
    per 60 s segment at production shape)."""
    if algo == "ct":
        out = irdft_ct(re, im, n_fft, precision, window=window)
        return out if out_dtype == jnp.float32 else out.astype(out_dtype)
    cos_m, sin_m = (jnp.asarray(m) for m in _dft_mats_np(n_fft))
    if window is not None:
        cos_m = cos_m * window[:, None]
        sin_m = sin_m * window[:, None]
    n_bins = n_fft // 2 + 1
    w = jnp.full((n_bins,), 2.0 / n_fft, jnp.float32)
    w = w.at[0].set(1.0 / n_fft).at[-1].set(1.0 / n_fft)
    # The conjugate-symmetry/1/N weights are per-BIN (the contraction
    # axis), so they fold into the constant matrices' columns instead of
    # pre-scaling the operand — the spectra feed the dot straight from
    # storage (no read-modify-write pass over the 170 MB y planes).
    cos_m = cos_m * w[None, :]
    sin_m = sin_m * w[None, :]
    # Nyquist split (even n_fft): contracting the odd K=n_bins=2049 pays
    # a full extra K-tile of pad in every MXU pass — measured 15% of the
    # inverse matmul pair (132.7 → 158.4 TF/s, 98% of the chip's
    # achievable bf16 peak; scripts/istft_align_probe.py).  The last bin
    # is the Nyquist column: sin(pi*n) == 0 exactly, so its entire
    # contribution is the rank-1 term re[..., -1] * cos_nyq — one
    # broadcast FMA over the output, fused into the subtract epilogue —
    # leaving a tile-aligned K=n_fft/2 contraction.
    split_nyq = n_fft % 2 == 0
    if split_nyq:
        nyq = cos_m[:, -1]  # f32 (n_fft,), window + 1/N weight folded
        cos_m, sin_m = cos_m[:, :-1], sin_m[:, :-1]
    if precision == "default" and re.dtype == jnp.bfloat16:
        # single-pass MXU path: bf16 Wiener outputs feed the matmul
        # as-is (a float32 promotion would just re-materialize the cast
        # the out_dtype=bfloat16 emission avoided); the constants are
        # bf16-rounded exactly once, same class as the DEFAULT feed
        cos_m = cos_m.astype(jnp.bfloat16)
        sin_m = sin_m.astype(jnp.bfloat16)
        a_re, a_im = re, im
    else:
        a_re, a_im = re.astype(jnp.float32), im.astype(jnp.float32)
    if split_nyq:
        out = _dot(a_re[..., :-1], cos_m, precision, transpose_b=True) - _dot(
            a_im[..., :-1], sin_m, precision, transpose_b=True
        )
        # computed in f32 regardless of the matmul feed dtype (cheap, and
        # strictly more accurate than a bf16 constant column)
        out = out + a_re[..., -1:].astype(jnp.float32) * nyq
    else:
        out = _dot(a_re, cos_m, precision, transpose_b=True) - _dot(
            a_im, sin_m, precision, transpose_b=True
        )
    return out if out_dtype == jnp.float32 else out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Two-stage Cooley-Tukey factorization
# ---------------------------------------------------------------------------
#
# The dense matmul-DFT costs n_fft * n_bins MACs per frame (~8.4M at 4096).
# Splitting N = N1*N2 (decimation: n = N2*a + b, k = N1*c + d) runs two
# small matmul stages + one elementwise twiddle:
#
#   stage 1 (contract a, length N1):  P[b,d] + iQ[b,d] = sum_a x[a,b] W_N1^{ad}
#   twiddle:                          U = (P+iQ) * W_N^{bd}
#   stage 2 (contract b, length N2):  X[N1*c+d] = sum_b U[b,d] W_N2^{bc}
#
# At (N1, N2) = (128, 32) this is ~0.66M MACs/frame — 12.6x fewer — and
# stage 1 (the bulk) contracts K=128 into N=128 output columns, exactly
# filling the MXU.  The inverse runs the same factorization transposed.


def _ct_factors(n_fft: int) -> tuple[int, int]:
    n1 = 128 if n_fft % 128 == 0 else 64
    assert n_fft % n1 == 0, f"n_fft={n_fft} not factorable for CT"
    return n1, n_fft // n1


@functools.lru_cache(maxsize=4)
def _ct_fwd_mats_np(n_fft: int):
    n1, n2 = _ct_factors(n_fft)
    a = np.arange(n1, dtype=np.float64)
    b = np.arange(n2, dtype=np.float64)
    d = np.arange(n1, dtype=np.float64)
    c = np.arange(n2 // 2 + 1, dtype=np.float64)  # only bins k <= n_fft//2 + n1
    s1 = 2.0 * np.pi * a[:, None] * d[None, :] / n1          # (N1, N1) stage 1
    tw = 2.0 * np.pi * b[:, None] * d[None, :] / n_fft       # (N2, N1) twiddle
    s2 = 2.0 * np.pi * b[:, None] * c[None, :] / n2          # (N2, C2) stage 2
    f32 = np.float32
    return (
        np.cos(s1).astype(f32), np.sin(s1).astype(f32),
        np.cos(tw).astype(f32), np.sin(tw).astype(f32),
        np.cos(s2).astype(f32), np.sin(s2).astype(f32),
    )


def rdft_ct(x: Array, n_fft: int, precision: str = "high") -> tuple[Array, Array]:
    """Two-stage Cooley-Tukey one-sided real DFT (same contract as
    :func:`rdft`)."""
    n1, n2 = _ct_factors(n_fft)
    c2 = n2 // 2 + 1
    n_bins = n_fft // 2 + 1
    cos1, sin1, twc, tws, cos2, sin2 = (jnp.asarray(m) for m in _ct_fwd_mats_np(n_fft))
    lead = x.shape[:-1]
    x = x.astype(jnp.float32).reshape(*lead, n1, n2)  # [a, b]

    # stage 1: contract a (dim -2) -> (..., b, d)
    p = _dot_at(x, cos1, -2, precision)
    q = -_dot_at(x, sin1, -2, precision)
    # twiddle (b, d): U = (P + iQ)(cos - i sin)
    ure = p * twc + q * tws
    uim = q * twc - p * tws
    # stage 2: contract b (dim -2) -> (..., d, c)
    xre = _dot_at(ure, cos2, -2, precision) + _dot_at(uim, sin2, -2, precision)
    xim = _dot_at(uim, cos2, -2, precision) - _dot_at(ure, sin2, -2, precision)
    # k = N1*c + d: reorder (..., d, c) -> (..., c, d) -> (..., C2*N1), slice
    xre = jnp.swapaxes(xre, -1, -2).reshape(*lead, c2 * n1)[..., :n_bins]
    xim = jnp.swapaxes(xim, -1, -2).reshape(*lead, c2 * n1)[..., :n_bins]
    return xre, xim


def irdft_ct(
    re: Array,
    im: Array,
    n_fft: int,
    precision: str = "high",
    window: Array | None = None,
) -> Array:
    """Two-stage Cooley-Tukey inverse of :func:`rdft_ct` with 1/N scaling
    (and optional synthesis-window epilogue)."""
    n1, n2 = _ct_factors(n_fft)
    c2 = n2 // 2 + 1
    n_bins = n_fft // 2 + 1
    cos1, sin1, twc, tws, cos2, sin2 = (jnp.asarray(m) for m in _ct_fwd_mats_np(n_fft))
    lead = re.shape[:-1]

    # conjugate-symmetry fold weights + 1/N scaling on the small bin axis
    w = jnp.full((n_bins,), 2.0 / n_fft, jnp.float32)
    w = w.at[0].set(1.0 / n_fft).at[-1].set(1.0 / n_fft)
    vre = (re.astype(jnp.float32) * w)
    vim = (im.astype(jnp.float32) * w)
    pad = c2 * n1 - n_bins
    vre = jnp.pad(vre, [(0, 0)] * len(lead) + [(0, pad)]).reshape(*lead, c2, n1)
    vim = jnp.pad(vim, [(0, 0)] * len(lead) + [(0, pad)]).reshape(*lead, c2, n1)

    # stage 1: U[b,d] = sum_c V[c,d] e^{+2pi i bc/N2}; the matrices are the
    # stage-2 forward ones (N2, C2)[b, c], contracted over their c axis
    # (transpose_b).  (Vre + iVim)(cos + i sin) expands to the two real
    # contractions below; the result's layout is (..., d, b).
    ure = _dot_at(vre, cos2, -2, precision, transpose_b=True) - _dot_at(
        vim, sin2, -2, precision, transpose_b=True
    )
    uim = _dot_at(vre, sin2, -2, precision, transpose_b=True) + _dot_at(
        vim, cos2, -2, precision, transpose_b=True
    )
    # twiddle e^{+2pi i bd/N}: arranged (d, b) = twc.T/tws.T
    twcT = twc.T  # (N1, N2) [d, b]
    twsT = tws.T
    wre = ure * twcT - uim * twsT
    wim = ure * twsT + uim * twcT
    # stage 2: x[N2*a + b] = sum_d wre[d,b] cos(2pi ad/N1) - wim[d,b] sin(...)
    # contract d (dim -2) with (N1, N1)[a, d] transposed -> (..., b, a)
    xr = _dot_at(wre, cos1, -2, precision, transpose_b=True) - _dot_at(
        wim, sin1, -2, precision, transpose_b=True
    )  # (..., b, a)
    if window is not None:
        # window[n], n = N2*a + b -> (a, b) grid -> transpose to (b, a)
        wmat = window.reshape(n1, n2).T
        xr = xr * wmat
    return jnp.swapaxes(xr, -1, -2).reshape(*lead, n_fft)


def _dot_at(a: Array, b: Array, dim: int, precision: str, transpose_b: bool = False) -> Array:
    """dot_general contracting ``a``'s axis ``dim`` with ``b``'s first (or
    second) axis; the contracted axis's slot moves to the end."""
    if dim < 0:
        dim += a.ndim
    contract = ((dim,), (1 if transpose_b else 0,))
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(contract, ((), ())),
        precision=_PRECISIONS[precision],
        preferred_element_type=jnp.float32,
    )
