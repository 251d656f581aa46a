"""Configuration layer for umx-tpu.

The reference keeps all of these as compile-time C++ constants scattered
across headers (dsp.hpp:16-19, inference.hpp:13-16, wiener.hpp:12-17,
model.cpp:109-114).  Here they are one typed, frozen config tree that is
hashable, so configs can be passed as static arguments to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Literal


@dataclasses.dataclass(frozen=True)
class DSPConfig:
    """STFT/iSTFT constants (reference: dsp.hpp:16-19).

    The transform is the torch.stft convention: centered, reflect-padded,
    periodic Hann window, one-sided, unscaled forward / 1/N inverse with
    librosa window-sumsquare normalization.
    """

    sample_rate: int = 44100
    n_fft: int = 4096
    hop: int = 1024
    # FFT backend: "xla" uses jnp.fft (fast on CPU); "matmul" runs the
    # transform as MXU matmuls against constant DFT matrices (required on
    # TPU backends without an FFT op, and MXU-friendly regardless);
    # "auto" picks matmul on TPU, xla elsewhere.
    fft_impl: Literal["auto", "xla", "matmul"] = "auto"
    # MXU precision for the FORWARD matmul-DFT: "highest" = 6-pass fp32
    # emulation, "high" = 3-pass bf16 (~1e-6 relative error — far inside
    # the 1e-4 STFT tolerance), "default" = 1-pass bf16 (3x faster,
    # ~1e-3).  "auto" = "default" on TPU (stft 2.0 -> ~0.8 ms; the
    # forward feeds the network magnitudes AND the Wiener phase, and the
    # end-to-end bound is 45.3 dB below signal at production shape —
    # the same accepted class as the network's default path, PARITY.md
    # dft_default row), "high" elsewhere (CPU matmuls are fp32 anyway).
    dft_precision: Literal["auto", "highest", "high", "default"] = "auto"
    # Matmul-DFT algorithm: "dense" = one (n_fft, n_bins) matmul pair;
    # "ct" = two-stage (128x32) Cooley-Tukey factorization — ~12x fewer
    # MXU FLOPs at the same accuracy class (ops/fft.py), but its
    # relayout passes currently make it slower on-chip (PERF.md) so
    # dense stays the default.
    dft_algo: Literal["dense", "ct"] = "dense"
    # INVERSE-transform algorithm (the iSTFT is 4x the forward's work —
    # one inverse per target).  "dense" = window-folded dense matmul-DFT;
    # "ct2" = the fused Pallas Cooley-Tukey kernel (ops/istft_ct.py) —
    # a measured NEGATIVE result on v5e (19.6 vs dense 13.9 ms: the
    # in-kernel layout-assembly copies eat the 12x MAC saving; kept as
    # an A/B arm); "ct2_xla" = the factorization as XLA einsums;
    # "ct2_interpret" = Pallas interpreter (CPU tests).  "auto" = dense.
    istft_algo: Literal["auto", "dense", "ct2", "ct2_xla", "ct2_interpret"] = "auto"
    # Matmul precision for the INVERSE transform only.  The iSTFT is
    # downstream of the mask/Wiener math, so its rounding adds plain
    # output noise: single-pass bf16 ("default") injects ~2.3e-3
    # relative (~-52 dB) — a <=0.01 dB SDR perturbation, the same class
    # as the network's shipped default path — while tripling iDFT MXU
    # throughput vs the 3-pass "high".  "auto" = "default" on TPU,
    # dft_precision elsewhere (CPU matmuls are true fp32 regardless).
    idft_precision: Literal["auto", "default", "high", "highest"] = "auto"
    # Storage dtype of the post-iDFT frame tensor that the overlap-add
    # streams (339 MB f32 per 60 s segment x 4 targets at production
    # shape).  "bfloat16" downcasts in the iDFT's subtract epilogue
    # (free) and runs the OLA in bf16, halving that traffic; the rounding
    # is the same ~2.3e-3 class as the bf16 iDFT matmul itself and lands
    # purely on the output waveform (parity row in PARITY.md).  The
    # window-sumsquare normalization always divides in float32.
    # "auto" = bfloat16 on TPU when the inverse matmuls already run
    # single-pass bf16, float32 elsewhere.
    iframes_dtype: Literal["auto", "float32", "bfloat16"] = "auto"

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1  # 2049

    @property
    def pad(self) -> int:
        return self.n_fft // 2  # 2048

    def n_frames(self, n_samples: int) -> int:
        """Frame count of a centered STFT over ``n_samples`` (dsp.hpp:46)."""
        return n_samples // self.hop + 1


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """UMX mask-network architecture constants (reference: model.cpp:109-186,
    inference.cpp:39-55)."""

    hidden_size: int = 1024  # UMX-L; UMX-HQ uses 512
    n_targets: int = 4  # bass, drums, other, vocals
    n_lstm_layers: int = 3
    # Bandwidth crop: bins kept per channel (16 kHz at 44.1kHz/4096-pt fft).
    nb_bins_cropped: int = 1487
    n_bins: int = 2049
    bn_eps: float = 1e-5
    # BLSTM recurrence implementation: "auto" = pallas_merged on TPU,
    # scan elsewhere (resolved at trace time; measured 46 -> 33 ms per
    # 60 s segment network on v5e, PERF.md); "scan" = lax.scan
    # (portable); "pallas" = per-target Pallas kernel (VMEM-resident
    # state/weights); "pallas_merged" = all targets per step (weights of
    # all 8 chains in VMEM, independent matmuls pipeline the MXU);
    # "pallas_interpret" = Pallas interpreter (CPU tests).  Training
    # always lowers to "scan" (the recurrence kernel defines no VJP).
    lstm_impl: Literal["auto", "scan", "pallas", "pallas_merged", "pallas_interpret"] = "auto"
    # timesteps per Pallas grid step (DMA amortization)
    lstm_time_block: int = 8
    # Input/output normalization convention:
    #  - "openunmix": x = (x + mean) * scale   (upstream open-unmix-pytorch)
    #  - "umxcpp":    x = x * scale + mean     (reference inference.cpp:73-83)
    # The two differ; the reference deviates from upstream. Default follows
    # upstream since the quality north-star is parity with PyTorch UMX-L.
    input_scaling: Literal["openunmix", "umxcpp"] = "openunmix"

    @property
    def lstm_hidden(self) -> int:
        return self.hidden_size // 2

    @property
    def n_features(self) -> int:
        return 2 * self.nb_bins_cropped  # 2974 stacked-stereo input features

    @property
    def n_outputs(self) -> int:
        return 2 * self.n_bins  # 4098 stacked-stereo mask outputs


@dataclasses.dataclass(frozen=True)
class WienerConfig:
    """Multichannel Wiener-EM post-filter constants (reference: wiener.hpp:12-17)."""

    iterations: int = 1
    eps: float = 1e-10
    scale_factor: float = 10.0
    # The reference computes the source PSD as ((re+im))^2 instead of
    # |y|^2 = re^2+im^2 (wiener.cpp:185-204).  "correct" implements the
    # mathematically standard openunmix |y|^2; "umxcpp" reproduces the quirk.
    psd: Literal["correct", "umxcpp"] = "correct"
    # Implementation: "einsum" = whole-segment einsum chain (portable,
    # supports the psd quirk); "pallas" = fused two-pass TPU kernels
    # (ops/wiener_pallas.py, ~6x less HBM traffic); "pallas_interpret"
    # runs the kernels in the Pallas interpreter (CPU tests); "auto"
    # picks pallas on TPU backends when psd == "correct".
    impl: Literal["auto", "einsum", "pallas", "pallas_interpret"] = "auto"
    # time rows per Pallas grid step.  SMALL is load-bearing: a Pallas
    # call with a large scoped-VMEM footprint evicts the neighboring LSTM
    # scans' VMEM-resident weights (+16 ms measured at 136-row blocks);
    # 8-row blocks keep the kernels ~2 MB and the scans untouched.
    time_block: int = 8
    # dtype of the EMITTED y planes (Pallas path only).  The y spectra
    # feed straight into the iSTFT, whose TPU matmuls already run
    # single-pass bf16 (DSPConfig.idft_precision) — so emitting bf16
    # halves the apply kernel's dominant write traffic (340 -> 170 MB
    # per 60 s segment) at the same output-noise class (~-58 dB,
    # bounded by the PARITY wiener_bf16 row).  "auto" = bfloat16 on
    # TPU, float32 elsewhere; the einsum path always emits float32.
    out_dtype: Literal["auto", "float32", "bfloat16"] = "auto"


@dataclasses.dataclass(frozen=True)
class SegmentConfig:
    """Demucs-style overlapping-segment inference constants
    (reference: inference.hpp:13-16)."""

    segment_secs: float = 60.0
    overlap: float = 0.25
    max_shift_secs: float = 0.5
    transition_power: float = 1.0
    # Whether LSTM h/c state carries across segments (the reference's
    # "streaming LSTM", umx.cpp:167-171 / lstm.cpp:82).
    streaming: bool = True
    # Non-streaming fused tracks run segments in vmapped groups of this
    # width (segments are independent without the state carry); batched
    # rows fold into the batch-native BLSTM kernel's matmul rows,
    # amortizing the recurrence's width-independent latency floor —
    # wider is monotonically faster until HBM runs out (420 s track:
    # width 4 = 1251x, 8 = 1416x, 16 = 1574x, PERF.md).  0 = AUTO: the
    # HBM planner picks the largest width whose estimated footprint
    # (track buffers + width x segment transients) fits the device
    # (engine/memory.py::suggest_chunk_batch, calibrated against the
    # measured 16-fits / 32-OOMs batch-curve endpoint).
    chunk_batch: int = 0
    # Windowed-fused execution for tracks longer than one fused program
    # can hold: the track runs as a chain of W-chunk fused windows, each
    # ONE XLA program, carrying the LSTM state and the unnormalized
    # overlap-add boundary tail (stems + weight sum over the final
    # seg-stride samples) between windows — bit-equal math to the single
    # fused program at <=50% overlap, at fused-program throughput for ANY
    # track length (the 60-minute single program RESOURCE_EXHAUSTs,
    # PERF.md).  0 = AUTO: single fused program while the HBM planner
    # says the whole track fits, windowed at the planner's largest
    # fitting W beyond that (engine/memory.suggest_window_chunks).
    # -1 disables windowing (always one program, the pre-round-5
    # behavior); >0 forces that window width.
    window_chunks: int = 0

    def __post_init__(self):
        if not (0.0 <= self.overlap < 1.0):
            raise ValueError(f"overlap must be in [0, 1), got {self.overlap}")
        if self.segment_secs <= 0:
            raise ValueError(f"segment_secs must be positive, got {self.segment_secs}")
        if self.max_shift_secs < 0:
            raise ValueError(f"max_shift_secs must be >= 0, got {self.max_shift_secs}")

    def segment_samples(self, sample_rate: int) -> int:
        return int(self.segment_secs * sample_rate)

    def stride_samples(self, sample_rate: int) -> int:
        return int((1.0 - self.overlap) * self.segment_samples(sample_rate))

    def max_shift_samples(self, sample_rate: int) -> int:
        return int(self.max_shift_secs * sample_rate)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Top-level inference-engine configuration."""

    dsp: DSPConfig = DSPConfig()
    model: ModelConfig = ModelConfig()
    wiener: WienerConfig = WienerConfig()
    segment: SegmentConfig = SegmentConfig()
    # Apply the Wiener-EM post-filter (reference always does when built with
    # it; the original release ran without it, README.md:38-44).
    use_wiener: bool = True
    # Number of random-shift passes to average for the Demucs
    # time-equivariance trick (0 disables; the reference supports exactly
    # 1, umx.cpp:99-150; N>1 averages N passes per upstream Demucs).
    shifts: int = 1
    # Matmul precision for the network's XLA matmul stages.  On TPU the
    # DEFAULT precision is a single-pass bf16 matmul even for float32
    # inputs, so there is no separate "bfloat16 speed mode" — default IS
    # the fast path, and its full-scale oracle deviation is 46 dB below
    # signal (≤±0.02 dB SDR, PARITY.md).  "high" (3-pass) / "highest"
    # (6-pass) buy true fp32-class parity at 3x/6x matmul cost.  (This
    # replaces the round-2 `compute_dtype` flag, which silently compiled
    # the identical program for float32 and bfloat16 — VERDICT r2 #8.)
    # NOTE: the Pallas merged-kernel recurrence (lstm_impl auto on TPU)
    # always holds hh weights in bf16 with f32 accumulation regardless
    # of this knob (full-scale deviation identical to fp32, PARITY.md);
    # high/highest affect the XLA matmul stages (fc1/2/3, ih, DFT).
    matmul_precision: Literal["default", "high", "highest"] = "default"
    # Overlap-add implementation for fused-track programs.  "auto" =
    # "unroll" (statically unrolled slice-adds — fastest measured, valid
    # for any overlap).  "xla" = pad+sum grids; "pallas" / "xla_dus" =
    # measured A/B variants (ops/ola_pallas.py, slower: the 44.1 kHz row
    # misalignment taxes layout-changing approaches — PERF.md);
    # "pallas_interpret" runs the kernel in interpreter mode (tests).
    ola_impl: str = "auto"
    # Storage dtype of the network's mask output at the inference seam
    # (fed to Wiener / mask-apply; 169 MB f32 per 60 s segment, read by
    # BOTH Wiener passes).  "bfloat16" halves that traffic; the masks
    # already come out of single-pass bf16 matmuls on TPU, so the store
    # rounding is the same accepted class (parity row in PARITY.md).
    # "auto" = bfloat16 on TPU, float32 elsewhere.  Training never sees
    # this seam (train.py consumes umx_forward's f32 masks directly).
    mask_dtype: Literal["auto", "float32", "bfloat16"] = "auto"
    # Storage dtype of the fused-track programs' stacked weighted chunk
    # stems (the lax.scan output feeding overlap-add: (n_chunks, T#, 2,
    # seg) — 847 MB f32 for a 7-min track, the program's largest
    # allocation).  "bfloat16" halves both the stack and the OLA's read
    # stream; overlap-add still ACCUMULATES in f32 (at 25% overlap each
    # output sample sums at most 2 chunk contributions, so the only
    # error is the bf16 store rounding — the same accepted class as the
    # mask/iframes seams, PARITY.md).  "auto" = bfloat16 on TPU, float32
    # elsewhere.  Adopted round 4 for CAPACITY, not speed: the B=1
    # headline is measurement-neutral (1066 vs 1071x, within the ±3%
    # session noise), but halving the stack moves the whole-track batch
    # and single-program track-length ceilings (engine/memory.py).
    stems_stack_dtype: Literal["auto", "float32", "bfloat16"] = "auto"
    # STREAMING fused-track schedule.  "scan" = one lax.scan over chunks
    # (the default — measured AT the sum of its phase costs, PERF.md
    # round-3 decomposition: the state chain itself costs ~0).  "groups"
    # = the split-phase program (pre/post vmapped across chunk groups,
    # only the recurrence chained) — a measured NEGATIVE result on v5e
    # (45.2 vs 41.6 ms/chunk: batching only helps the issue-bound LSTM
    # kernel, which streaming forbids folding, and the group-concat
    # overlap-add form costs an extra pass); kept as an A/B arm.
    # "pipelined" = cross-chunk LAYER pipelining: iteration i runs
    # L1(chunk i) | L2(chunk i-1) | L3(chunk i-2) as ONE merged-kernel
    # call (3x the weight-distinct chains per dependent recurrence
    # step; identical math — only WITHIN a chunk are the bidirectional
    # layers serial).  Dense weights + the merged kernel only;
    # standalone feasibility probe: scripts/lstm_pipeline_probe.py.
    stream_impl: Literal["scan", "groups", "pipelined"] = "scan"

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)


UMXL = EngineConfig()
UMXHQ = EngineConfig(model=ModelConfig(hidden_size=512))

TARGETS = ("bass", "drums", "other", "vocals")
# Output file digit convention (reference scripts/umx_pytorch_inference.py:12-17)
TARGET_FILE_INDEX = {"bass": 0, "drums": 1, "other": 2, "vocals": 3}
