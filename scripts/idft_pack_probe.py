#!/usr/bin/env python
"""Probe: the dense inverse-DFT as ONE packed matmul vs two dots.

Current irdft computes  re*w @ cos^T - im*w @ sin^T  — two (T,2049)@
(2049,4096) dots whose partial products XLA may materialize as separate
(T,4096) f32 buffers plus a subtract pass (~2.6 ms of pure bandwidth at
the production shape).  The packed form concatenates the operands once
([re*w || im*w] (T,4098) @ [cos || -sin]^T) so the MXU accumulates both
halves in one pass with no intermediate.  Same math, bit-comparable at
every precision (the contraction is a strict superset reordering).
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

    from umx_tpu.ops.fft import _dft_mats_np, _dot

    n_fft, n_bins = 4096, 2049
    T = 2584
    S2 = 8  # 4 targets x 2 channels
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((S2, T, n_bins)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((S2, T, n_bins)).astype(np.float32))

    cos_m, sin_m = (jnp.asarray(m) for m in _dft_mats_np(n_fft))
    win = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    cos_w = cos_m * win[:, None]
    sin_w = sin_m * win[:, None]
    w = jnp.full((n_bins,), 2.0 / n_fft, jnp.float32)
    w = w.at[0].set(1.0 / n_fft).at[-1].set(1.0 / n_fft)

    prec = "default"

    def two_dots(a, b):
        return _dot(a * w, cos_w, prec, transpose_b=True) - _dot(
            b * w, sin_w, prec, transpose_b=True
        )

    packed_mat = jnp.concatenate([cos_w, -sin_w], axis=1)  # (n_fft, 2*n_bins)

    def packed(a, b):
        x = jnp.concatenate([a * w, b * w], axis=-1)  # (..., 2*n_bins)
        return _dot(x, packed_mat, prec, transpose_b=True)

    # packed with bf16 pre-cast (halves the concat copy)
    packed_mat16 = packed_mat.astype(jnp.bfloat16)

    def packed16(a, b):
        x = jnp.concatenate(
            [(a * w).astype(jnp.bfloat16), (b * w).astype(jnp.bfloat16)], axis=-1
        )
        return jax.lax.dot_general(
            x, packed_mat16,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def drain(x):
        return float(jnp.sum(x))

    def timeit(f, reps=8):
        fn = jax.jit(f)
        drain(fn(re, im)); drain(fn(re, im))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = fn(re, im)
            drain(out)
            walls.append((time.perf_counter() - t0) / reps)
        return sorted(walls)[1] * 1000

    a = timeit(two_dots)
    b = timeit(packed)
    c = timeit(packed16)
    print(f"two_dots  : {a:7.2f} ms")
    print(f"packed    : {b:7.2f} ms")
    print(f"packed16  : {c:7.2f} ms")

    # numeric check (same precision class)
    d = jax.jit(two_dots)(re[:1, :8], im[:1, :8])
    e = jax.jit(packed)(re[:1, :8], im[:1, :8])
    err = float(jnp.max(jnp.abs(d - e)) / (jnp.max(jnp.abs(d)) + 1e-30))
    print(f"packed vs two_dots rel err: {err:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
