"""STFT/iSTFT tests: round-trip at 1e-4 (mirrors test/test_dsp.cpp:41-114)
and exact parity against torch.stft/istft (the golden transform used by
openunmix, automating scripts/compare-torch-stft.py)."""

import numpy as np
import pytest

from umx_tpu.config import DSPConfig
from umx_tpu.ops import stft as stft_ops

torch = pytest.importorskip("torch")


def _torch_stft(x: np.ndarray, cfg: DSPConfig) -> np.ndarray:
    win = torch.hann_window(cfg.n_fft, periodic=True)
    spec = torch.stft(
        torch.from_numpy(x),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop,
        window=win,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return spec.numpy().swapaxes(-1, -2)  # torch gives (..., bins, T)


def _torch_istft(spec: np.ndarray, n: int, cfg: DSPConfig) -> np.ndarray:
    win = torch.hann_window(cfg.n_fft, periodic=True)
    return (
        torch.istft(
            torch.from_numpy(spec.swapaxes(-1, -2).copy()),
            n_fft=cfg.n_fft,
            hop_length=cfg.hop,
            window=win,
            center=True,
            length=n,
        )
        .numpy()
    )


@pytest.fixture(scope="module")
def cfg():
    return DSPConfig()


def test_hann_window_matches_torch(cfg):
    ours = np.asarray(stft_ops.hann_window(cfg.n_fft))
    theirs = torch.hann_window(cfg.n_fft, periodic=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_frame_count(cfg):
    # nb_frames = n // hop + 1 (dsp.hpp:46, torch center=True convention)
    n = 44100
    x = np.random.default_rng(0).standard_normal((2, n)).astype(np.float32)
    spec = np.asarray(stft_ops.stft(x, cfg))
    assert spec.shape == (2, n // cfg.hop + 1, cfg.n_bins)


def test_stft_matches_torch(cfg):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3 * cfg.hop * 16)).astype(np.float32)
    ours = np.asarray(stft_ops.stft(x, cfg))
    theirs = _torch_stft(x, cfg)
    assert ours.shape == theirs.shape
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, atol=2e-4 * scale, rtol=0)


def test_stft_matches_torch_square_wave(cfg):
    # synthetic square wave, the compare-torch-stft.py probe signal
    n = 4096 * 8
    t = np.arange(n) / cfg.sample_rate
    x = np.sign(np.sin(2 * np.pi * 441.0 * t)).astype(np.float32)[None]
    ours = np.asarray(stft_ops.stft(x, cfg))
    theirs = _torch_stft(x, cfg)
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, atol=2e-4 * scale, rtol=0)


def test_round_trip_noise(cfg):
    # mirrors test_dsp.cpp round-trip tolerance of 1e-4
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (2, cfg.hop * 200)).astype(np.float32)
    spec = stft_ops.stft(x, cfg)
    x2 = np.asarray(stft_ops.istft(spec, x.shape[-1], cfg))
    np.testing.assert_allclose(x2, x, atol=1e-4)


@pytest.mark.slow
def test_round_trip_non_multiple_length(cfg):
    rng = np.random.default_rng(3)
    n = cfg.hop * 50 + 123
    x = rng.uniform(-1, 1, (2, n)).astype(np.float32)
    spec = stft_ops.stft(x, cfg)
    x2 = np.asarray(stft_ops.istft(spec, n, cfg))
    np.testing.assert_allclose(x2, x, atol=1e-4)


def test_istft_matches_torch(cfg):
    rng = np.random.default_rng(4)
    n = cfg.hop * 64
    x = rng.standard_normal((2, n)).astype(np.float32)
    spec = _torch_stft(x, cfg)
    ours = np.asarray(stft_ops.istft(spec, n, cfg))
    theirs = _torch_istft(spec, n, cfg)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


@pytest.mark.slow
def test_magnitude_phase_reconstruction(cfg):
    # magnitude/phase decomposition → polar_to_complex → istft round trip
    # (mirrors test_dsp.cpp:118-273)
    rng = np.random.default_rng(5)
    n = cfg.hop * 40
    x = rng.uniform(-1, 1, (2, n)).astype(np.float32)
    spec = stft_ops.stft(x, cfg)
    mag = np.abs(spec)
    recon = stft_ops.polar_to_complex(mag, spec)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(spec), atol=1e-5)
    x2 = np.asarray(stft_ops.istft(recon, n, cfg))
    np.testing.assert_allclose(x2, x, atol=1e-4)


def test_matmul_dft_matches_xla_fft(cfg):
    # the MXU matmul DFT (used on TPU, where XLA FFT is unavailable) must
    # agree with jnp.fft to fp32 FFT accuracy
    from umx_tpu.ops import fft as mxu_fft

    rng = np.random.default_rng(7)
    frames = rng.standard_normal((5, cfg.n_fft)).astype(np.float32)
    re, im = mxu_fft.rdft(frames, cfg.n_fft)
    ref = np.fft.rfft(frames, axis=-1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-5 * scale)

    back = np.asarray(mxu_fft.irdft(re, im, cfg.n_fft))
    np.testing.assert_allclose(back, frames, atol=1e-4)


@pytest.mark.slow
def test_stft_impls_agree(cfg):
    import dataclasses

    from umx_tpu.ops import stft as so

    rng = np.random.default_rng(8)
    n = cfg.hop * 32
    x = rng.uniform(-1, 1, (2, n)).astype(np.float32)
    cfg_mm = dataclasses.replace(cfg, fft_impl="matmul")
    cfg_xla = dataclasses.replace(cfg, fft_impl="xla")
    s_mm = np.asarray(so.stft(x, cfg_mm))
    s_xla = np.asarray(so.stft(x, cfg_xla))
    scale = np.abs(s_xla).max()
    np.testing.assert_allclose(s_mm, s_xla, atol=2e-5 * scale)
    x_mm = np.asarray(so.istft(so.stft(x, cfg_mm), n, cfg_mm))
    np.testing.assert_allclose(x_mm, x, atol=1e-4)


def test_overlap_add_inverts_framing(cfg):
    rng = np.random.default_rng(6)
    x = rng.standard_normal((3, cfg.n_fft + cfg.hop * 7)).astype(np.float32)
    frames = stft_ops.frame_signal(x, cfg.n_fft, cfg.hop)
    assert frames.shape == (3, 8, cfg.n_fft)
    # each frame must be the exact strided slice
    for t in range(8):
        np.testing.assert_array_equal(
            np.asarray(frames)[:, t], x[:, t * cfg.hop : t * cfg.hop + cfg.n_fft]
        )


@pytest.mark.slow
def test_ct_dft_matches_npfft(cfg):
    # two-stage Cooley-Tukey matmul DFT: same accuracy class as the dense
    # matmul DFT, ~12x fewer MXU FLOPs
    from umx_tpu.ops import fft as mxu_fft

    rng = np.random.default_rng(9)
    frames = rng.standard_normal((5, cfg.n_fft)).astype(np.float32)
    re, im = mxu_fft.rdft_ct(frames, cfg.n_fft)
    assert re.shape == (5, cfg.n_fft // 2 + 1)
    ref = np.fft.rfft(frames, axis=-1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-5 * scale)

    back = np.asarray(mxu_fft.irdft_ct(re, im, cfg.n_fft))
    np.testing.assert_allclose(back, frames, atol=1e-4)


@pytest.mark.slow
def test_irdft_window_folding(cfg):
    # irdft(window=w) == irdft() * w, for both dense and CT algos
    from umx_tpu.ops import fft as mxu_fft
    from umx_tpu.ops.stft import hann_window

    rng = np.random.default_rng(10)
    spec = np.fft.rfft(rng.standard_normal((3, cfg.n_fft)), axis=-1)
    re = spec.real.astype(np.float32)
    im = spec.imag.astype(np.float32)
    win = hann_window(cfg.n_fft)
    for algo in ("dense", "ct"):
        plain = np.asarray(mxu_fft.irdft(re, im, cfg.n_fft, algo=algo))
        folded = np.asarray(mxu_fft.irdft(re, im, cfg.n_fft, algo=algo, window=win))
        np.testing.assert_allclose(folded, plain * np.asarray(win), atol=1e-5)


def test_precision_auto_resolution(cfg):
    """``dft_precision="auto"`` resolves to the 3-pass fp32-class path on
    CPU (where matmuls are fp32 regardless, keeping the label honest) and
    single-pass bf16 on accelerators (PARITY.md dft_default row bounds it
    end-to-end at production shape).  Explicit settings pass through, and
    the idft auto-resolution falls back to the forward resolver on CPU."""
    import dataclasses

    import jax

    on_cpu = jax.default_backend() == "cpu"
    assert stft_ops._resolve_dft_precision(cfg) == ("high" if on_cpu else "default")
    for explicit in ("default", "high", "highest"):
        c = dataclasses.replace(cfg, dft_precision=explicit)
        assert stft_ops._resolve_dft_precision(c) == explicit
    if on_cpu:
        assert stft_ops._resolve_idft_precision(cfg) == "high"
        c = dataclasses.replace(cfg, dft_precision="highest")
        assert stft_ops._resolve_idft_precision(c) == "highest"


@pytest.mark.slow
def test_stft_ct_vs_dense_algo(cfg):
    import dataclasses

    rng = np.random.default_rng(11)
    n = cfg.hop * 16
    x = rng.uniform(-1, 1, (2, n)).astype(np.float32)
    cfg_ct = dataclasses.replace(cfg, fft_impl="matmul", dft_algo="ct")
    cfg_dn = dataclasses.replace(cfg, fft_impl="matmul", dft_algo="dense")
    s_ct = np.asarray(stft_ops.stft(x, cfg_ct))
    s_dn = np.asarray(stft_ops.stft(x, cfg_dn))
    scale = np.abs(s_dn).max()
    np.testing.assert_allclose(s_ct, s_dn, atol=2e-5 * scale)
    x_ct = np.asarray(stft_ops.istft(stft_ops.stft(x, cfg_ct), n, cfg_ct))
    np.testing.assert_allclose(x_ct, x, atol=1e-4)


class TestRealAudioFixtures:
    """Real-recording DSP tests mirroring the reference's gtest suite
    (test/test_dsp.cpp:10-114, fixtures test/data/gspi_*.wav): exact
    sample counts, mono duplication, STFT bin count, and round-trips at
    the reference's 1e-4 tolerance on actual music."""

    DATA = __import__("os").path.join(__import__("os").path.dirname(__file__), "data")

    def _load(self, name):
        from umx_tpu.io.audio import load_audio

        return load_audio(__import__("os").path.join(self.DATA, name))

    def test_load_mono_duplicates(self):
        x = self._load("gspi_mono.wav")
        assert x.shape == (2, 262144)  # test_dsp.cpp:17
        np.testing.assert_array_equal(x[0], x[1])

    def test_load_stereo(self):
        x = self._load("gspi_stereo.wav")
        assert x.shape == (2, 262144)  # test_dsp.cpp:33

    def test_stft_bins_and_roundtrip_stereo(self, cfg):
        x = self._load("gspi_stereo.wav")
        spec = stft_ops.stft(x, cfg)
        assert spec.shape[-1] == 2049  # test_dsp.cpp bin assertion
        back = np.asarray(stft_ops.istft(spec, x.shape[1], cfg))
        np.testing.assert_allclose(back, x, atol=1e-4)  # tolerance test_dsp.cpp:7

    def test_magnitude_phase_roundtrip_mono(self, cfg):
        # mirrors the polar decomposition round trip (test_dsp.cpp:118-273)
        x = self._load("gspi_mono.wav")
        spec = stft_ops.stft(x, cfg)
        mag = np.abs(np.asarray(spec))
        recon = stft_ops.polar_to_complex(jnp_asarray(mag), spec)
        back = np.asarray(stft_ops.istft(recon, x.shape[1], cfg))
        np.testing.assert_allclose(back, x, atol=1e-4)

    def test_torch_parity_on_real_audio(self, cfg):
        x = self._load("gspi_stereo.wav")[:, :44100]
        ours = np.asarray(stft_ops.stft(x, cfg))
        theirs = _torch_stft(x, cfg)
        scale = np.abs(theirs).max()
        np.testing.assert_allclose(ours, theirs, atol=2e-5 * scale)


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)
