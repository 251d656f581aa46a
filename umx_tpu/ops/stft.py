"""STFT / iSTFT on device, torch.stft-convention.

Semantics (reference: src/dsp.cpp:109-258, upstream openunmix
``transforms.make_filterbanks(n_fft=4096, n_hop=1024, center=True)``):

* periodic Hann window (L+1 points minus the last, dsp.hpp:61-77),
* centered: reflect-pad by n_fft//2 on both sides.  NOTE: the reference's
  ``pad_signal`` (dsp.cpp:109-128) actually implements *symmetric* padding
  (edge sample duplicated); we implement true reflect padding to match
  torch.stft, since PyTorch parity is the quality north star.
* forward: unscaled one-sided rFFT of each windowed frame,
* inverse: 1/N-scaled irFFT, window + overlap-add, normalized by the
  librosa window-sumsquare (dsp.cpp:231-258) with a 1e-8 floor.

TPU-first design: framing is done with reshape/concat of hop-strided
views (no gathers), the hot transform is one batched rFFT over all
frames, and overlap-add is n_fft/hop shifted vectorized adds instead of
a scatter — everything static-shaped and fusible by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from umx_tpu.config import DSPConfig
from umx_tpu.ops import fft as mxu_fft

Array = jax.Array


def _use_matmul_fft(cfg: DSPConfig) -> bool:
    if cfg.fft_impl == "auto":
        return jax.default_backend() not in ("cpu",)
    return cfg.fft_impl == "matmul"


@functools.lru_cache(maxsize=8)
def _hann_window_np(n_fft: int) -> np.ndarray:
    # periodic Hann: L+1-point symmetric window minus the last sample
    n = np.arange(n_fft, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))).astype(np.float32)


def hann_window(n_fft: int) -> Array:
    return jnp.asarray(_hann_window_np(n_fft))


def frame_signal(x: Array, n_fft: int, hop: int) -> Array:
    """Split ``x (..., n)`` into hop-strided frames ``(..., T, n_fft)`` where
    ``T = (n - n_fft) // hop + 1``, without gathers.

    Requires ``n_fft % hop == 0`` (true for 4096/1024): frame t is the
    concatenation of hop-sized pieces p ∈ [0, n_fft/hop) starting at
    ``(t+p)*hop``, so each piece column is just a shifted reshape of x.
    """
    n = x.shape[-1]
    assert n_fft % hop == 0, "frame_signal requires hop | n_fft"
    ratio = n_fft // hop
    n_frames = (n - n_fft) // hop + 1
    pieces = [
        x[..., p * hop : (p + n_frames) * hop].reshape(*x.shape[:-1], n_frames, hop)
        for p in range(ratio)
    ]
    return jnp.concatenate(pieces, axis=-1)


def overlap_add(frames: Array, hop: int) -> Array:
    """Inverse of :func:`frame_signal`: sum frames ``(..., T, n_fft)`` into a
    signal ``(..., (T-1)*hop + n_fft)`` at hop-strided offsets.

    Implemented as a sum of n_fft/hop zero-padded piece grids — pure
    pad + add, fully fusible elementwise.  (The earlier strided
    ``.at[].add`` formulation was pattern-rewritten by XLA:TPU into a
    convolution fusion costing ~6 ms/segment.)
    """
    *lead, n_frames, n_fft = frames.shape
    assert n_fft % hop == 0
    ratio = n_fft // hop
    pieces = frames.reshape(*lead, n_frames, ratio, hop)
    total = None
    for p in range(ratio):
        # piece p of frame t lands at output row t + p of a hop-wide grid
        x = pieces[..., p, :]  # (..., T, hop)
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(p, ratio - 1 - p), (0, 0)])
        total = x if total is None else total + x
    out = total.reshape(*lead, (n_frames + ratio - 1) * hop)
    return out[..., : (n_frames - 1) * hop + n_fft]


def window_sumsquare(window: Array, n_frames: int, hop: int, out_len: int) -> Array:
    """librosa-style sum of squared, hop-shifted windows (dsp.hpp:79-102)."""
    w2 = jnp.broadcast_to(window * window, (n_frames, window.shape[0]))
    return overlap_add(w2, hop)[:out_len]


def stft_planes(x: Array, cfg: DSPConfig) -> tuple[Array, Array]:
    """Centered STFT as (re, im) float32 planes — the native form of the
    matmul-DFT path, letting the whole pipeline stay in real arithmetic
    (XLA materializes complex64 as strided pairs; planes avoid the
    interleave/deinterleave passes)."""
    pad = cfg.pad
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(xp, cfg.n_fft, cfg.hop) * hann_window(cfg.n_fft)
    frames = frames.astype(jnp.float32)
    if _use_matmul_fft(cfg):
        return mxu_fft.rdft(frames, cfg.n_fft, _resolve_dft_precision(cfg), cfg.dft_algo)
    spec = jnp.fft.rfft(frames, axis=-1)
    return spec.real.astype(jnp.float32), spec.imag.astype(jnp.float32)


def stft(x: Array, cfg: DSPConfig) -> Array:
    """Centered STFT.  x: (..., n) → complex64 (..., T, n_bins) with
    ``T = n // hop + 1`` (dsp.hpp:46)."""
    re, im = stft_planes(x, cfg)
    return jax.lax.complex(re, im)


def _resolve_istft_algo(cfg: DSPConfig) -> str:
    algo = getattr(cfg, "istft_algo", "auto")
    if algo == "auto":
        # ct2 stays opt-in until the fused natural-layout kernel is
        # measured faster on-chip: the first ct2 design's bins-major
        # relayout alone costs 12.6 ms (scripts/ct2_decompose_probe.py)
        # — as much as the whole dense iSTFT it was meant to replace.
        return "dense"
    return algo


def _resolve_dft_precision(cfg: DSPConfig) -> str:
    prec = getattr(cfg, "dft_precision", "auto")
    if prec == "auto":
        # On TPU, single-pass bf16 triples the forward DFT's MXU
        # throughput (2.0 -> ~0.8 ms/segment).  The forward feeds the
        # network input magnitudes and the Wiener phase reference, so
        # its bound is measured END TO END: 45.3 dB below signal at
        # production shape (PARITY.md dft_default row) — the same
        # accepted class as the network's shipped default matmuls.
        # CPU matmuls are fp32 at any setting; "high" keeps the label
        # honest there.
        return "default" if jax.default_backend() not in ("cpu",) else "high"
    return prec


def _resolve_idft_precision(cfg: DSPConfig) -> str:
    prec = getattr(cfg, "idft_precision", "auto")
    if prec == "auto":
        # On TPU, single-pass bf16 triples the iDFT's MXU throughput and
        # its ~-52 dB rounding noise is a <=0.01 dB SDR perturbation
        # (PARITY.md idft row) — the same accepted class as the
        # network's default path.  CPU matmuls are fp32 at any setting.
        return "default" if jax.default_backend() not in ("cpu",) else _resolve_dft_precision(cfg)
    return prec


def _resolve_iframes_dtype(cfg: DSPConfig):
    choice = getattr(cfg, "iframes_dtype", "auto")
    if choice == "auto":
        # bf16 frame storage only pays when the inverse matmuls are
        # already single-pass bf16 (TPU): the downcast then adds the
        # same rounding class the transform already carries, and the
        # OLA's streamed traffic halves.
        on_tpu = jax.default_backend() not in ("cpu",)
        return (
            jnp.bfloat16
            if on_tpu and _resolve_idft_precision(cfg) == "default"
            else jnp.float32
        )
    return jnp.dtype(choice)


def istft_planes(re: Array, im: Array, n_samples: int, cfg: DSPConfig) -> Array:
    """Inverse STFT from (re, im) planes → (..., n_samples).

    The synthesis window is folded into the inverse-DFT matmul
    (ops/fft.py irdft ``window=``) instead of a separate full-frame
    multiply pass — the reference multiplies post-iFFT (dsp.cpp:178-258).

    The inverse matmuls run at ``cfg.idft_precision`` (default on TPU:
    single-pass bf16 — see :func:`_resolve_idft_precision`)."""
    n_frames = re.shape[-2]
    win = hann_window(cfg.n_fft)
    algo = _resolve_istft_algo(cfg) if _use_matmul_fft(cfg) else "dense"
    if algo != "dense":
        from umx_tpu.ops import istft_ct

        if algo in ("ct2", "ct2_interpret"):
            # fused natural-layout Pallas kernel (no relayout anywhere)
            sig = istft_ct.istft_ct2_fused(
                re, im, cfg.n_fft, cfg.hop, window=win,
                interpret=(algo == "ct2_interpret"),
            )
        else:  # ct2_xla — the einsum A/B arm (bins-major layout + permuted OLA)
            xp = istft_ct.irdft_ct2(re, im, cfg.n_fft, window=win, impl="xla")
            sig = istft_ct.overlap_add_perm(xp, cfg.n_fft, cfg.hop)
    else:
        if _use_matmul_fft(cfg):
            frames = mxu_fft.irdft(
                re, im, cfg.n_fft, _resolve_idft_precision(cfg), cfg.dft_algo,
                window=win, out_dtype=_resolve_iframes_dtype(cfg),
            )
        else:
            spec = jax.lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))
            frames = jnp.fft.irfft(spec, n=cfg.n_fft, axis=-1).astype(jnp.float32) * win
        sig = overlap_add(frames, cfg.hop)
    wss = window_sumsquare(win, n_frames, cfg.hop, sig.shape[-1])
    # normalization always in f32 (wss spans ~3 orders of magnitude)
    sig = sig.astype(jnp.float32) / (wss + 1e-8)
    return sig[..., cfg.pad : cfg.pad + n_samples]


def istft(spec: Array, n_samples: int, cfg: DSPConfig) -> Array:
    """Inverse of :func:`stft`.  spec: (..., T, n_bins) → (..., n_samples)
    (strips the n_fft//2 center padding)."""
    return istft_planes(spec.real, spec.imag, n_samples, cfg)


def magnitude(spec: Array) -> Array:
    return jnp.abs(spec)


def unit_phasors(re: Array, im: Array) -> tuple[Array, Array]:
    """``ref / |ref|`` in planes form, with |ref| = 0 → 1 + 0i (the
    std::polar(mag, arg(0)=0) convention of dsp.cpp:260-289)."""
    a2 = re * re + im * im
    nz = a2 > 0.0
    rs = jax.lax.rsqrt(jnp.where(nz, a2, 1.0))
    return jnp.where(nz, re * rs, 1.0), jnp.where(nz, im * rs, 0.0)


def polar_to_complex(mag: Array, ref: Array) -> Array:
    """``mag * exp(i * angle(ref))`` without trig: scale ref to unit modulus
    (dsp.cpp:260-289 uses std::polar; arg(0)=0 → unit 1)."""
    a = jnp.abs(ref)
    unit = jnp.where(a > 0, ref / jnp.where(a > 0, a, 1.0), 1.0 + 0.0j)
    return mag.astype(unit.real.dtype) * unit
