"""Pallas overlap-add tests (interpreter mode on CPU): the combine +
DMA-transpose + normalize path must match the XLA pad+sum path, for both
kernel impls, under vmap (batched tracks), and through the fused-track
program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umx_tpu.engine.separator import _overlap_add_chunks
from umx_tpu.ops.ola_pallas import overlap_add_normalized


def _ref(ys, sw, stride, padded_len):
    return np.asarray(_overlap_add_chunks(ys, stride, padded_len)) / np.asarray(sw)


def _case(n_chunks, mid, seg, stride, seed=0):
    rng = np.random.default_rng(seed)
    ys = jnp.asarray(rng.standard_normal((n_chunks, *mid, seg)).astype(np.float32))
    padded_len = (n_chunks - 1) * stride + seg
    w = jnp.asarray(rng.uniform(0.5, 1.5, seg).astype(np.float32))
    sw = _overlap_add_chunks(jnp.broadcast_to(w, (n_chunks, seg)), stride, padded_len)
    return ys, sw, padded_len


@pytest.mark.parametrize("impl", ["pallas", "xla_dus"])
def test_ola_matches_xla(impl):
    ys, sw, padded_len = _case(4, (4, 2), 512, 384)
    out = overlap_add_normalized(
        ys, 1.0 / sw, 384, padded_len, impl=impl, interpret=True
    )
    assert out is not None
    np.testing.assert_allclose(
        np.asarray(out), _ref(ys, sw, 384, padded_len), rtol=2e-6, atol=2e-6
    )


@pytest.mark.slow
def test_ola_single_chunk_and_no_overlap():
    # n_chunks=1 exercises the no-previous-tail path everywhere
    ys, sw, padded_len = _case(1, (2,), 512, 384, seed=1)
    out = overlap_add_normalized(ys, 1.0 / sw, 384, padded_len, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _ref(ys, sw, 384, padded_len), rtol=2e-6, atol=2e-6
    )
    # tail_len == 0 (stride == seg): pure re-tiling, no combine
    ys, sw, padded_len = _case(3, (2,), 384, 384, seed=2)
    out = overlap_add_normalized(ys, 1.0 / sw, 384, padded_len, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _ref(ys, sw, 384, padded_len), rtol=2e-6, atol=2e-6
    )


@pytest.mark.slow
def test_ola_rejects_bad_geometry():
    # overlap > 50%: head/tail split doesn't apply
    ys, sw, padded_len = _case(3, (2,), 512, 128, seed=3)
    assert overlap_add_normalized(ys, 1.0 / sw, 128, padded_len, interpret=True) is None
    # stride with no divisor in [128, 4096] (small strides)
    ys, sw, padded_len = _case(3, (2,), 64, 48, seed=3)
    assert overlap_add_normalized(ys, 1.0 / sw, 48, padded_len, interpret=True) is None


@pytest.mark.slow
def test_ola_batched_vmap():
    ys, sw, padded_len = _case(3, (4, 2), 512, 384, seed=4)
    B = 3
    rng = np.random.default_rng(5)
    ys_b = jnp.asarray(rng.standard_normal((B, *ys.shape)).astype(np.float32))
    f = lambda y: overlap_add_normalized(y, 1.0 / sw, 384, padded_len, interpret=True)
    vm = jax.vmap(f)(ys_b)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(vm[i]), _ref(ys_b[i], sw, 384, padded_len), rtol=2e-6, atol=2e-6
        )


@pytest.mark.slow
def test_fused_track_with_ola_kernel(small_cfg, small_params):
    """demix() through ola_impl=pallas_interpret equals the XLA path
    (small_cfg's 2 s segments give stride 66150 -> t2 3150)."""
    from umx_tpu.engine.separator import Separator

    rng = np.random.default_rng(6)
    sr = small_cfg.dsp.sample_rate
    audio = rng.uniform(-0.5, 0.5, (2, int(3.4 * sr))).astype(np.float32)

    sep_x = Separator(small_params, small_cfg.replace(ola_impl="xla", shifts=0))
    sep_p = Separator(
        small_params, small_cfg.replace(ola_impl="pallas_interpret", shifts=0)
    )
    out_x = np.asarray(sep_x.demix(audio))
    out_p = np.asarray(sep_p.demix(audio))
    np.testing.assert_allclose(out_p, out_x, atol=1e-5)
