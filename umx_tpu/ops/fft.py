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


def rdft(x: Array, n_fft: int, precision: str = "high") -> tuple[Array, Array]:
    """Forward one-sided real DFT of frames ``x (..., n_fft)`` →
    ``(re, im)`` each ``(..., n_fft//2 + 1)``."""
    cos_m, sin_m = (jnp.asarray(m) for m in _dft_mats_np(n_fft))
    x = x.astype(jnp.float32)
    return _dot(x, cos_m, precision), -_dot(x, sin_m, precision)


def irdft(re: Array, im: Array, n_fft: int, precision: str = "high") -> Array:
    """Inverse of :func:`rdft` with 1/N scaling → frames ``(..., n_fft)``."""
    cos_m, sin_m = (jnp.asarray(m) for m in _dft_mats_np(n_fft))
    n_bins = n_fft // 2 + 1
    w = jnp.full((n_bins,), 2.0 / n_fft, jnp.float32)
    w = w.at[0].set(1.0 / n_fft).at[-1].set(1.0 / n_fft)
    return _dot(re.astype(jnp.float32) * w, cos_m, precision, transpose_b=True) - _dot(
        im.astype(jnp.float32) * w, sin_m, precision, transpose_b=True
    )
