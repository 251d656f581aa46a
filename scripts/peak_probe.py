#!/usr/bin/env python
"""Calibrate the chip: achievable HBM bandwidth and MXU throughput.

These two numbers anchor every roofline claim in PERF.md — 'bandwidth
bound' is meaningless without the empirically achievable peak (the axon
tunnel's v5e may deliver less than the 819 GB/s / 197 TFLOP/s paper
numbers through this stack).
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

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    def drain(x):
        return float(jnp.sum(x))

    def timeit(fn, *a, reps=10):
        drain(fn(*a))
        drain(fn(*a))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = fn(*a)
            drain(out)
            walls.append((time.perf_counter() - t0) / reps)
        return sorted(walls)[1]

    R_INNER = 8

    def timeit_inner(stage, *a, reps=5):
        """Time ``stage`` with R_INNER applications INSIDE one jitted
        program (inputs perturbed to defeat CSE), canceling the ~3 ms
        per-dispatch overhead of the tunneled backend."""

        def many(*a):
            acc = None
            for i in range(R_INNER):
                perturbed = tuple(
                    x * (1.0 + 1e-7 * (i + 1)) if hasattr(x, "dtype") else x
                    for x in a
                )
                out = stage(*perturbed)
                first = out[0] if isinstance(out, tuple) else out
                s = jnp.sum(first)
                acc = s if acc is None else acc + s
            return acc

        f = jax.jit(many)
        return timeit(f, *a, reps=reps) / R_INNER

    # --- dispatch floor ------------------------------------------------------
    tiny = jnp.zeros((8, 128), jnp.float32)
    d0 = timeit(jax.jit(lambda x: x + 1.0), tiny, reps=20)
    print(f"dispatch floor (tiny jit call): {d0 * 1000:.2f} ms")

    rng = np.random.default_rng(0)

    # --- HBM bandwidth: big elementwise copy-add (read N + write N) --------
    for mb in (256, 1024):
        n = mb * 1024 * 1024 // 4
        x = jnp.asarray(rng.standard_normal((n // 1024, 1024)).astype(np.float32))
        f = jax.jit(lambda x: x * 1.000001 + 1.0)
        dt = timeit(f, x)
        gb = 2 * n * 4 / 1e9
        print(f"elementwise {mb} MB: {dt * 1000:.2f} ms -> {gb / dt:.0f} GB/s")

    # --- inner-rep variants (dispatch overhead canceled) --------------------
    n = 256 * 1024 * 1024 // 4
    x = jnp.asarray(rng.standard_normal((n // 1024, 1024)).astype(np.float32))
    dt = timeit_inner(lambda x: x * 1.000001 + 1.0, x)
    print(f"elementwise 256 MB inner: {dt * 1000:.2f} ms -> {2 * n * 4 / 1e9 / dt:.0f} GB/s")

    m = 4096
    for dt_name, dtype, prec in (
        ("bf16", jnp.bfloat16, jax.lax.Precision.DEFAULT),
        ("f32-high", jnp.float32, jax.lax.Precision.HIGH),
    ):
        a = jnp.asarray(rng.standard_normal((m, m)), dtype)
        b = jnp.asarray(rng.standard_normal((m, m)), dtype)
        dt = timeit_inner(
            lambda a, b, prec=prec: jnp.dot(
                a, b, precision=prec, preferred_element_type=jnp.float32
            ),
            a,
            b,
        )
        print(f"matmul {m}^3 {dt_name} inner: {dt * 1000:.2f} ms -> {2 * m**3 / dt / 1e12:.0f} TFLOP/s")

    # --- two-operand add (read 2N + write N) --------------------------------
    n = 256 * 1024 * 1024 // 4
    x = jnp.asarray(rng.standard_normal((n // 1024, 1024)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((n // 1024, 1024)).astype(np.float32))
    f2 = jax.jit(lambda a, b: a + b)
    dt = timeit(f2, x, y)
    print(f"add 2x256 MB: {dt * 1000:.2f} ms -> {3 * n * 4 / 1e9 / dt:.0f} GB/s")

    # --- strided accumulate (the OLA pattern) -------------------------------
    T, hop = 2584, 1024
    frames = jnp.asarray(rng.standard_normal((8, T, 4096)).astype(np.float32))

    def ola(fr):
        out = jnp.zeros((8, (T - 1) * hop + 4096), jnp.float32)
        for p in range(4):
            piece = fr[..., p * hop : (p + 1) * hop].reshape(8, T * hop)
            out = out.at[..., p * hop : p * hop + T * hop].add(piece)
        return out

    f3 = jax.jit(ola)
    dt = timeit(f3, frames)
    gb = (8 * T * 4096 * 4 + 2 * 4 * 8 * T * hop * 4) / 1e9
    print(f"overlap-add S*C=8 frames: {dt * 1000:.2f} ms -> {gb / dt:.0f} GB/s (counted)")

    # --- MXU peak: bf16 and fp32(3-pass) square matmuls ---------------------
    for dt_name, dtype, prec in (
        ("bf16", jnp.bfloat16, jax.lax.Precision.DEFAULT),
        ("f32-high", jnp.float32, jax.lax.Precision.HIGH),
        ("f32-highest", jnp.float32, jax.lax.Precision.HIGHEST),
    ):
        m = 4096
        a = jnp.asarray(rng.standard_normal((m, m)), dtype)
        b = jnp.asarray(rng.standard_normal((m, m)), dtype)
        f4 = jax.jit(
            lambda a, b, prec=prec: jnp.dot(
                a, b, precision=prec, preferred_element_type=jnp.float32
            )
        )
        dt = timeit(f4, a, b)
        tf = 2 * m**3 / dt / 1e12
        print(f"matmul {m}^3 {dt_name}: {dt * 1000:.2f} ms -> {tf:.0f} TFLOP/s")

    # --- skinny matmul like the iSTFT (M=T*8, K=2049, N=4096) --------------
    a = jnp.asarray(rng.standard_normal((8 * 2584, 2049)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2049, 4096)).astype(np.float32))
    f5 = jax.jit(
        lambda a, b: jnp.dot(
            a, b, precision=jax.lax.Precision.HIGH, preferred_element_type=jnp.float32
        )
    )
    dt = timeit(f5, a, b)
    tf = 2 * a.shape[0] * 2049 * 4096 / dt / 1e12
    print(f"istft-shape matmul f32-high: {dt * 1000:.2f} ms -> {tf:.0f} TFLOP/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
