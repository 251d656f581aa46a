"""Fused Cooley-Tukey iSTFT (ops/istft_ct.py) vs the dense path.

The ct2 factorization must be numerically interchangeable with the
dense window-folded inverse (ops/fft.py::irdft + overlap_add), which is
itself pinned to torch.istft by tests/test_stft.py.  Reference
semantics: src/dsp.cpp:178-258.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umx_tpu.config import DSPConfig
from umx_tpu.ops import istft_ct
from umx_tpu.ops import stft as stft_ops


def _random_planes(t=37, n_bins=2049, lead=(), seed=0):
    rng = np.random.default_rng(seed)
    re = rng.standard_normal((*lead, t, n_bins)).astype(np.float32)
    im = rng.standard_normal((*lead, t, n_bins)).astype(np.float32)
    return jnp.asarray(re), jnp.asarray(im)


def _dense_frames(re, im, n_fft, window):
    from umx_tpu.ops import fft as mxu_fft

    return mxu_fft.irdft(re, im, n_fft, precision="highest", window=window)


def _perm_to_frames(xp):
    """(…, N1, T, n2) permuted frames → (…, T, n_fft) time-major frames."""
    xp = jnp.moveaxis(xp, -2, -3)  # (…, T, N1, n2); n = n2*b' + a'
    return xp.reshape(*xp.shape[:-2], xp.shape[-2] * xp.shape[-1])


class TestCT2Stages:
    @pytest.mark.slow
    def test_xla_stages_match_dense_irdft(self):
        re, im = _random_planes()
        win = stft_ops.hann_window(4096)
        got = _perm_to_frames(istft_ct.irdft_ct2(re, im, 4096, window=win, impl="xla"))
        want = _dense_frames(re, im, 4096, win)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    def test_xla_stages_no_window(self):
        re, im = _random_planes(seed=3)
        got = _perm_to_frames(istft_ct.irdft_ct2(re, im, 4096, window=None, impl="xla"))
        want = _dense_frames(re, im, 4096, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    @pytest.mark.slow
    def test_fused_interpret_matches_xla_arm(self):
        # the fused natural-layout kernel (+ permuted-flat OLA) against
        # the einsum arm (+ 4D permuted OLA): same signal, different
        # pipelines/layouts end to end
        re, im = _random_planes(t=40, lead=(2,), seed=1)
        win = stft_ops.hann_window(4096)
        xp = istft_ct.irdft_ct2(re, im, 4096, window=win, impl="xla")
        want = istft_ct.overlap_add_perm(xp, 4096, 1024)
        got = istft_ct.istft_ct2_fused(re, im, 4096, 1024, window=win, interpret=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    @pytest.mark.slow
    def test_fused_pads_ragged_frame_count(self):
        # T=37 is not a multiple of the kf=8 frame block
        re, im = _random_planes(t=37, lead=(3,), seed=2)
        xp = istft_ct.irdft_ct2(re, im, 4096, window=None, impl="xla")
        want = istft_ct.overlap_add_perm(xp, 4096, 1024)
        got = istft_ct.istft_ct2_fused(re, im, 4096, 1024, window=None, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    @pytest.mark.slow
    def test_fused_block_sizes_agree(self):
        re, im = _random_planes(t=24, seed=5)
        a = istft_ct.istft_ct2_fused(re, im, 4096, 1024, kf=16, interpret=True)
        b = istft_ct.istft_ct2_fused(re, im, 4096, 1024, kf=8, interpret=True)
        c = istft_ct.istft_ct2_fused(re, im, 4096, 1024, kf=4, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


class TestPermutedOLA:
    def test_matches_time_major_ola(self):
        rng = np.random.default_rng(0)
        t, n_fft, hop = 11, 4096, 1024
        xp = jnp.asarray(rng.standard_normal((2, istft_ct.N1, t, 32)).astype(np.float32))
        got = istft_ct.overlap_add_perm(xp, n_fft, hop)
        want = stft_ops.overlap_add(_perm_to_frames(xp), hop)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestEndToEnd:
    @pytest.mark.parametrize(
        "algo",
        [
            pytest.param("ct2_xla", marks=pytest.mark.slow),
            pytest.param("ct2_interpret", marks=pytest.mark.slow),
        ],
    )
    def test_istft_planes_ct2_matches_dense(self, algo):
        cfg = DSPConfig(fft_impl="matmul", dft_precision="highest")
        rng = np.random.default_rng(7)
        n = 44100
        x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
        re, im = stft_ops.stft_planes(x, cfg)
        dense = stft_ops.istft_planes(re, im, n, cfg)
        cfg_ct = dataclasses.replace(cfg, istft_algo=algo)
        ct = stft_ops.istft_planes(re, im, n, cfg_ct)
        np.testing.assert_allclose(np.asarray(ct), np.asarray(dense), atol=1e-5)
        # and the round trip itself stays within the dsp tolerance
        np.testing.assert_allclose(np.asarray(ct), np.asarray(x), atol=1e-4)
