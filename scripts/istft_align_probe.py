#!/usr/bin/env python
"""Probe: is the dense iDFT's remaining MFU gap the odd 2049 contraction?

The round-4 roofline has the iSTFT's dense matmuls at 121.6 TF/s vs the
chip's 161 TF/s bf16 peak while the forward STFT (same matrices, the
2049 axis on the OUTPUT side) runs at 180.7 TF/s / 91.8% MFU.  Two
structural differences could explain the inverse-side gap:

  1. the inverse contracts over K=2049 — one past a 16-sublane/128-lane
     tile boundary, so every K-tile row carries pad;
  2. the constants are stored (n_fft, n_bins) and contracted with
     ``transpose_b`` — the minor axis of the constant is the contraction
     axis, the transposed-operand MXU layout.

Variants (all production-representative: bf16 spectra in — the Wiener
emission dtype — bf16 window+bin-weight-folded constants, f32
accumulate, bf16 frames out):

  base       the shipped irdft (transpose_b, K=2049)
  pret       constants pre-transposed host-side to (2049, 4096): plain
             K-major contraction, no transposed operand
  split      pret with K=2048 (tile-aligned) + a rank-1 epilogue for the
             Nyquist bin: sin(pi n) == 0, so bin 2048 contributes only
             re[..., 2048] * (w_k * window * cos(pi n)) — one broadcast
             FMA over the (T, 4096) output, fusable into the subtract
  splitT     transpose_b layout with K=2048 + the same epilogue
             (separates the alignment effect from the layout effect)

Equality: split/splitT are the same real sum re-associated; pret is
bit-identical math.  All are checked against base at bf16 resolution.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/umx_tpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from umx_tpu.ops.fft import _dft_mats_np

    n_fft, n_bins = 4096, 2049
    T = 2584
    S2 = 8  # 4 targets x 2 channels
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((S2, T, n_bins)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    im = jnp.asarray(rng.standard_normal((S2, T, n_bins)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    cos_np, sin_np = _dft_mats_np(n_fft)  # (n_fft, n_bins) f32
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    w = np.full((n_bins,), 2.0 / n_fft, np.float32)
    w[0] = 1.0 / n_fft
    w[-1] = 1.0 / n_fft
    cosw_np = cos_np * win[:, None] * w[None, :]
    sinw_np = sin_np * win[:, None] * w[None, :]

    bf = jnp.bfloat16
    cosw = jnp.asarray(cosw_np).astype(bf)           # (n_fft, n_bins)
    sinw = jnp.asarray(sinw_np).astype(bf)
    coswT = jnp.asarray(cosw_np.T.copy()).astype(bf)  # (n_bins, n_fft)
    sinwT = jnp.asarray(sinw_np.T.copy()).astype(bf)
    # aligned-K split pieces + Nyquist rank-1 row (sin row is exactly 0)
    coswT_a = jnp.asarray(cosw_np.T[:2048].copy()).astype(bf)
    sinwT_a = jnp.asarray(sinw_np.T[:2048].copy()).astype(bf)
    cosw_a = jnp.asarray(cosw_np[:, :2048].copy()).astype(bf)
    sinw_a = jnp.asarray(sinw_np[:, :2048].copy()).astype(bf)
    nyq = jnp.asarray(cosw_np.T[2048].copy())  # f32 (n_fft,)

    def dot(a, b, tb):
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((a.ndim - 1,), (1 if tb else 0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def base(a, b):
        return (dot(a, cosw, True) - dot(b, sinw, True)).astype(bf)

    def pret(a, b):
        return (dot(a, coswT, False) - dot(b, sinwT, False)).astype(bf)

    def split(a, b):
        out = dot(a[..., :2048], coswT_a, False) - dot(b[..., :2048], sinwT_a, False)
        out = out + a[..., 2048:2049].astype(jnp.float32) * nyq
        return out.astype(bf)

    def splitT(a, b):
        out = dot(a[..., :2048], cosw_a, True) - dot(b[..., :2048], sinw_a, True)
        out = out + a[..., 2048:2049].astype(jnp.float32) * nyq
        return out.astype(bf)

    def drain(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    R_INNER = 6

    def timeit(f, reps=8):
        def many(a, b):
            acc = None
            for i in range(R_INNER):
                # the perturbation must survive bf16 rounding or XLA CSEs
                # the reps into one (2^-7 steps are exact in bf16)
                o = f(a * (1.0 + 0.0078125 * (i + 1)), b * (1.0 + 0.0078125 * (i + 1)))
                s = jnp.sum(o.astype(jnp.float32))
                acc = s if acc is None else acc + s
            return acc

        fn = jax.jit(many)
        drain_s = float(fn(re, im))  # compile
        _ = drain_s
        for _ in range(2):
            float(fn(re, im))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(re, im)
            float(out)
            walls.append((time.perf_counter() - t0) / reps)
        return sorted(walls)[1] / R_INNER * 1000.0

    ref = None
    for name, f in (("base", base), ("pret", pret), ("split", split), ("splitT", splitT)):
        out = jax.jit(f)(re, im)
        o32 = np.asarray(out.astype(jnp.float32))
        if ref is None:
            ref = o32
            err = 0.0
        else:
            err = float(np.max(np.abs(o32 - ref)) / (np.max(np.abs(ref)) + 1e-30))
        ms = timeit(f)
        # 2 matmuls x 2 FLOP/MAC over (S2*T, K, n_fft)
        k = n_bins if name in ("base", "pret") else 2048
        tf = 2 * 2 * S2 * T * k * n_fft / (ms / 1000.0) / 1e12
        print(f"{name:8s} {ms:7.2f} ms   {tf:6.1f} TF/s   rel_err_vs_base {err:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
