"""BSS-eval correctness tests: exact-estimate limits, known-SNR
calibration, and interference attribution."""

import numpy as np
import pytest

from umx_tpu.eval.bss import bss_eval_images_framewise, bss_eval_window


@pytest.fixture(scope="module")
def sources():
    rng = np.random.default_rng(61)
    J, C, T = 3, 2, 8000
    # independent-ish band-limited sources
    s = rng.standard_normal((J, C, T))
    for j in range(J):
        k = 50 * (j + 1)
        t = np.arange(T)
        s[j] += 2.0 * np.sin(2 * np.pi * k * t / T)[None, :]
    return s.astype(np.float64)


def test_perfect_estimate_high_sdr(sources):
    sdr, isr, sir, sar = bss_eval_window(sources, sources.copy(), flen=16)
    assert (sdr > 60).all(), sdr
    assert (isr > 60).all()
    assert (sir > 60).all()


def test_additive_noise_sdr_tracks_snr(sources):
    rng = np.random.default_rng(62)
    target_snr_db = 20.0
    est = sources.copy()
    for j in range(sources.shape[0]):
        p = np.mean(sources[j] ** 2)
        noise = rng.standard_normal(sources[j].shape)
        noise *= np.sqrt(p / np.mean(noise**2) * 10 ** (-target_snr_db / 10))
        est[j] = sources[j] + noise
    sdr, isr, sir, sar = bss_eval_window(sources, est, flen=16)
    # white noise is mostly artifact: SDR should sit near the SNR
    np.testing.assert_allclose(sdr, target_snr_db, atol=2.0)
    # ...and SAR should approximate SDR while SIR stays high
    assert (sir > sdr + 6).all()


def test_interference_detected(sources):
    # estimate of source 0 contaminated by source 1 -> finite SIR,
    # attributed to interference not artifacts
    est = sources.copy()
    est[0] = sources[0] + 0.3 * sources[1]
    sdr, isr, sir, sar = bss_eval_window(sources, est, flen=16)
    assert sir[0] < 30
    assert sar[0] > sir[0] + 10  # contamination is interference, not artifact
    assert sir[1] > 60


def test_filtered_estimate_forgiven_by_projection(sources):
    # a short FIR filtering of the true source is absorbed by the
    # projection (counts as spatial distortion, not artifact): SAR stays
    # high while ISR drops
    from scipy.signal import lfilter

    est = sources.copy()
    est[0] = lfilter([0.9, 0.3, -0.1], [1.0], sources[0], axis=-1)
    sdr, isr, sir, sar = bss_eval_window(sources, est, flen=16)
    assert sar[0] > 40, sar
    assert isr[0] < sar[0]


def test_batched_solver_matches_per_window(sources):
    from umx_tpu.eval.bss import bss_eval_window_batch

    rng = np.random.default_rng(64)
    est = sources + 0.05 * rng.standard_normal(sources.shape)
    W = 2
    refs_w = np.stack([sources[..., :4000], sources[..., 4000:8000]])
    ests_w = np.stack([est[..., :4000], est[..., 4000:8000]])
    batched = bss_eval_window_batch(refs_w, ests_w, flen=16)
    for w in range(W):
        single = bss_eval_window(refs_w[w], ests_w[w], flen=16)
        for m_b, m_s in zip(batched, single):
            # f32 device solves vs f64 CPU solves: sub-0.1 dB agreement
            np.testing.assert_allclose(m_b[w], m_s, atol=0.1)


def test_framewise_jax_accelerator_matches_numpy(sources):
    rng = np.random.default_rng(65)
    est = sources + 0.05 * rng.standard_normal(sources.shape)
    a = bss_eval_images_framewise(
        sources, est, window=4000, hop=4000, flen=16, accelerator="numpy"
    )
    b = bss_eval_images_framewise(
        sources, est, window=4000, hop=4000, flen=16, accelerator="jax"
    )
    np.testing.assert_allclose(a["median_SDR"], b["median_SDR"], atol=0.1)
    np.testing.assert_allclose(a["median_SIR"], b["median_SIR"], atol=0.3)


def test_framewise_shapes_and_median(sources):
    J, C, T = sources.shape
    est = sources + 0.01 * np.random.default_rng(63).standard_normal(sources.shape)
    res = bss_eval_images_framewise(sources, est, window=4000, hop=4000, flen=16)
    assert res["SDR"].shape[0] == J
    assert res["SDR"].shape[1] == 2  # two full windows
    assert res["median_SDR"].shape == (J,)
    assert np.isfinite(res["median_SDR"]).all()


def test_jax_path_falls_back_to_float64_on_nonfinite(monkeypatch):
    # ADVICE r1: NaNs from a float32 Cholesky on near-singular Grams must
    # not be silently absorbed by nanmedian — those windows re-solve in
    # float64 on the CPU path.
    from umx_tpu.eval import bss

    rng = np.random.default_rng(19)
    refs = rng.normal(size=(2, 2, 2 * 44100)).astype(np.float32) * 0.1
    ests = refs + 0.01 * rng.normal(size=refs.shape).astype(np.float32)

    real_batch = bss.bss_eval_window_batch

    def poisoned_batch(references, estimates, flen=512, max_windows=8):
        out = real_batch(references, estimates, flen, max_windows)
        return tuple(np.full_like(o, np.nan) for o in out)

    monkeypatch.setattr(bss, "bss_eval_window_batch", poisoned_batch)
    got = bss.bss_eval_images_framewise(refs, ests, flen=64, accelerator="jax")
    want = bss.bss_eval_images_framewise(refs, ests, flen=64, accelerator="numpy")
    for key in ("SDR", "ISR", "SIR", "SAR"):
        assert np.isfinite(got[key]).all(), key
        np.testing.assert_allclose(got[key], want[key], rtol=1e-6, atol=1e-6)
