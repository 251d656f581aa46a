"""Open-Unmix mask-prediction network, TPU-native.

Architecture (reference: src/inference.cpp:70-186, src/model.cpp:136-186;
upstream open-unmix-pytorch OpenUnmix module): per target,

    crop+stack stereo magnitudes -> input norm -> fc1 -> bn1 -> tanh
    -> 3-layer bidirectional LSTM -> skip-concat [x, lstm] -> fc2 -> bn2
    -> ReLU -> fc3 -> bn3 -> output norm -> ReLU = mask

TPU-first design decisions (vs the reference's per-target Python/C++ loop
and per-timestep Eigen gemvs, lstm.cpp:101-179):

* All four targets' weights are STACKED on a leading axis and the network
  is ``vmap``-ed over it, so fc matmuls run as one batched MXU gemm for
  all targets.
* The LSTM input projections (which carry no recurrence) are hoisted out
  of the time loop as one large ``(T, in) @ (in, 4H)`` gemm per
  layer/direction; only the small hidden-hidden matmul stays inside a
  ``lax.scan`` over time.
* Both directions run in the same scan as a batch axis (the backward
  direction scans the time-reversed sequence), halving scan trips.
* Streaming state (h, c per target/layer/direction) is an explicit carry
  in and out, reproducing the reference's "streaming LSTM" whose state
  persists across segments (umx.cpp:167-171, lstm.cpp:82).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
import numpy as np

from umx_tpu.config import ModelConfig

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass
class UMXParams:
    """UMX weights for all targets, stacked on a leading target axis.

    Shapes below use T#=n_targets (4), F=n_features (2974), H=hidden_size
    (1024 for UMX-L), L=n_lstm_layers (3), D=2 directions, G=lstm_hidden
    (H/2), O=n_outputs (4098).
    """

    input_mean: Array  # (T#, F)
    input_scale: Array  # (T#, F)
    fc1_w: Array  # (T#, F, H)  — applied as x @ fc1_w
    bn1_w: Array  # (T#, H)
    bn1_b: Array  # (T#, H)
    bn1_rm: Array  # (T#, H)
    bn1_rv: Array  # (T#, H)
    lstm_ih_w: Array  # (T#, L, D, H, 4G)
    lstm_hh_w: Array  # (T#, L, D, G, 4G)
    lstm_ih_b: Array  # (T#, L, D, 4G)
    lstm_hh_b: Array  # (T#, L, D, 4G)
    fc2_w: Array  # (T#, 2H, H)
    bn2_w: Array  # (T#, H)
    bn2_b: Array  # (T#, H)
    bn2_rm: Array  # (T#, H)
    bn2_rv: Array  # (T#, H)
    fc3_w: Array  # (T#, H, O)
    bn3_w: Array  # (T#, O)
    bn3_b: Array  # (T#, O)
    bn3_rm: Array  # (T#, O)
    bn3_rv: Array  # (T#, O)
    output_scale: Array  # (T#, O)
    output_mean: Array  # (T#, O)

    @property
    def n_targets(self) -> int:
        return self.fc1_w.shape[0]

    @property
    def hidden_size(self) -> int:
        return self.fc1_w.shape[-1]

    @property
    def lstm_hidden(self) -> int:
        return self.lstm_hh_w.shape[-2]

    def astype(self, dtype) -> "UMXParams":
        """Cast dense arrays; QTensor fields pass through untouched (their
        planes/scale/offset must stay exact for the fused dequant)."""
        from umx_tpu.ops.qmatmul import QTensor

        return jax.tree.map(
            lambda x: x if isinstance(x, QTensor) else x.astype(dtype),
            self,
            is_leaf=lambda x: isinstance(x, QTensor),
        )


@jax.tree_util.register_dataclass
@dataclass
class LSTMState:
    """Streaming LSTM state: hidden and cell per target/layer/direction."""

    h: Array  # (T#, L, D, G)
    c: Array  # (T#, L, D, G)


def init_lstm_state(cfg: ModelConfig, dtype=jnp.float32) -> LSTMState:
    shape = (cfg.n_targets, cfg.n_lstm_layers, 2, cfg.lstm_hidden)
    return LSTMState(h=jnp.zeros(shape, dtype), c=jnp.zeros(shape, dtype))


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def params_from_ggml(model, cfg: ModelConfig | None = None) -> UMXParams:
    """Build the stacked parameter pytree from a parsed
    :class:`umx_tpu.io.ggml.GGMLModel` (torch state-dict tensor layouts)."""
    from umx_tpu.io.ggml import TARGET_ORDER

    if cfg is None:
        cfg = ModelConfig(hidden_size=model.hidden_size)
    per_target = [model.targets[t] for t in TARGET_ORDER]

    def stack(fn):
        return jnp.asarray(np.stack([fn(t) for t in per_target]))

    def stack_lstm(kind, transpose):
        # torch layout: weight_* (4G, in) -> ours (in, 4G); biases (4G,)
        def one(t):
            per_layer = []
            for layer in range(cfg.n_lstm_layers):
                per_dir = []
                for rev in ("", "_reverse"):
                    w = t[f"lstm.{kind}_l{layer}{rev}"]
                    per_dir.append(w.T if transpose else w)
                per_layer.append(np.stack(per_dir))
            return np.stack(per_layer)

        return jnp.asarray(np.stack([one(t) for t in per_target]))

    def dup(name):
        # input_mean/scale are stored per cropped bin (1487) and used
        # duplicated for the stacked stereo features (model.cpp:240-290);
        # same for output mean/scale (2049 -> 4098).
        return stack(lambda t: np.concatenate([t[name], t[name]]))

    return UMXParams(
        input_mean=dup("input_mean"),
        input_scale=dup("input_scale"),
        fc1_w=stack(lambda t: t["fc1.weight"].T),
        bn1_w=stack(lambda t: t["bn1.weight"]),
        bn1_b=stack(lambda t: t["bn1.bias"]),
        bn1_rm=stack(lambda t: t["bn1.running_mean"]),
        bn1_rv=stack(lambda t: t["bn1.running_var"]),
        lstm_ih_w=stack_lstm("weight_ih", transpose=True),
        lstm_hh_w=stack_lstm("weight_hh", transpose=True),
        lstm_ih_b=stack_lstm("bias_ih", transpose=False),
        lstm_hh_b=stack_lstm("bias_hh", transpose=False),
        fc2_w=stack(lambda t: t["fc2.weight"].T),
        bn2_w=stack(lambda t: t["bn2.weight"]),
        bn2_b=stack(lambda t: t["bn2.bias"]),
        bn2_rm=stack(lambda t: t["bn2.running_mean"]),
        bn2_rv=stack(lambda t: t["bn2.running_var"]),
        fc3_w=stack(lambda t: t["fc3.weight"].T),
        bn3_w=stack(lambda t: t["bn3.weight"]),
        bn3_b=stack(lambda t: t["bn3.bias"]),
        bn3_rm=stack(lambda t: t["bn3.running_mean"]),
        bn3_rv=stack(lambda t: t["bn3.running_var"]),
        output_scale=dup("output_scale"),
        output_mean=dup("output_mean"),
    )


def quantized_params_from_ggml(model, cfg: ModelConfig | None = None) -> UMXParams:
    """Like :func:`params_from_ggml` but keeps the large matmul weights
    (fc1/fc2/fc3, LSTM ih) quantized in HBM as QTensors — the ggml
    u8/u16 payloads stay byte-exact on device and dequantization is
    fused algebraically into each gemm (ops/qmatmul.py).  Small vectors
    (batchnorm stats, means/scales, biases) are dequantized to float32.

    The LSTM *hh* weights are pre-densified to bfloat16 instead: u8
    planes are stored as bf16 bytes anyway (ops/qmatmul.py), so a dense
    bf16 hh costs ZERO extra HBM while letting the recurrence ride the
    merged Pallas kernel without a per-dispatch densify pass — and
    bf16(f32-affine) is bit-identical to what the kernel computed from
    the in-program densify before.  The exact affine epilogue stays on
    the batched, MXU-friendly ih/fc gemms where the u8/u16 payloads'
    extra precision is preserved.

    Requires a GGMLModel parsed with ``keep_quantized=True``.
    """
    from umx_tpu.io.ggml import TARGET_ORDER
    from umx_tpu.ops.qmatmul import qtensor_from_raw, stack_qtensors

    if model.raw is None:
        raise ValueError("GGMLModel.raw missing: re-read with keep_quantized=True")
    if cfg is None:
        cfg = ModelConfig(hidden_size=model.hidden_size)

    base = params_from_ggml(model, cfg)

    def q_stack(name, transpose):
        qts = []
        for t in TARGET_ORDER:
            q, scale, offset = model.raw[t][name]
            qts.append(qtensor_from_raw(q.T if transpose else q, scale, offset))
        return stack_qtensors(qts)

    def q_stack_lstm(kind):
        per_target = []
        for t in TARGET_ORDER:
            per_layer = []
            for layer in range(cfg.n_lstm_layers):
                per_dir = []
                for rev in ("", "_reverse"):
                    q, scale, offset = model.raw[t][f"lstm.{kind}_l{layer}{rev}"]
                    per_dir.append(qtensor_from_raw(q.T, scale, offset))
                per_layer.append(stack_qtensors(per_dir))
            per_target.append(stack_qtensors(per_layer))
        return stack_qtensors(per_target)

    return dataclasses.replace(
        base,
        fc1_w=q_stack("fc1.weight", transpose=True),
        fc2_w=q_stack("fc2.weight", transpose=True),
        fc3_w=q_stack("fc3.weight", transpose=True),
        lstm_ih_w=q_stack_lstm("weight_ih"),
        lstm_hh_w=base.lstm_hh_w.astype(jnp.bfloat16),
    )


def synthetic_state_dicts(cfg: ModelConfig, seed: int = 0) -> dict[str, dict[str, np.ndarray]]:
    """Random per-target torch-layout state dicts for tests/benchmarks when
    real UMX weights are unavailable (the in-repo reference artifact is a
    Git LFS stub).  Scaled so activations stay in a sane range."""
    from umx_tpu.io.ggml import TARGET_ORDER

    rng = np.random.default_rng(seed)
    H, F, O, G = cfg.hidden_size, cfg.n_features, cfg.n_outputs, cfg.lstm_hidden

    def w(*shape, scale=None):
        scale = scale if scale is not None else 1.0 / np.sqrt(shape[-1])
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    targets = {}
    for t in TARGET_ORDER:
        d = {
            "input_mean": w(F // 2, scale=0.1),
            "input_scale": (1.0 + 0.1 * rng.standard_normal(F // 2)).astype(np.float32),
            "output_scale": (1.0 + 0.1 * rng.standard_normal(O // 2)).astype(np.float32),
            "output_mean": w(O // 2, scale=0.1),
            "fc1.weight": w(H, F),
            "fc2.weight": w(H, 2 * H),
            "fc3.weight": w(O, H),
        }
        for i, pre in enumerate(("bn1", "bn2", "bn3")):
            dim = (H, H, O)[i]
            d[f"{pre}.weight"] = (1.0 + 0.1 * rng.standard_normal(dim)).astype(np.float32)
            d[f"{pre}.bias"] = w(dim, scale=0.1)
            d[f"{pre}.running_mean"] = w(dim, scale=0.1)
            d[f"{pre}.running_var"] = (1.0 + 0.1 * np.abs(rng.standard_normal(dim))).astype(
                np.float32
            )
        for layer in range(cfg.n_lstm_layers):
            in_dim = H  # lstm input is H for layer 0 and 2G=H for layers 1..
            for rev in ("", "_reverse"):
                d[f"lstm.weight_ih_l{layer}{rev}"] = w(4 * G, in_dim)
                d[f"lstm.weight_hh_l{layer}{rev}"] = w(4 * G, G)
                d[f"lstm.bias_ih_l{layer}{rev}"] = w(4 * G, scale=0.1)
                d[f"lstm.bias_hh_l{layer}{rev}"] = w(4 * G, scale=0.1)
        targets[t] = d
    return targets


def synthetic_params(cfg: ModelConfig, seed: int = 0) -> UMXParams:
    from umx_tpu.io.ggml import GGMLModel

    return params_from_ggml(
        GGMLModel(hidden_size=cfg.hidden_size, targets=synthetic_state_dicts(cfg, seed)),
        cfg,
    )


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def _batchnorm(x: Array, w: Array, b: Array, rm: Array, rv: Array, eps: float) -> Array:
    """Inference-mode BatchNorm1d (inference.cpp:88-99)."""
    inv = jax.lax.rsqrt(rv + eps)
    return (x - rm) * inv * w + b


# compute spec: name -> (matmul input dtype, XLA matmul precision).
# On TPU the DEFAULT precision is a single-pass bf16 matmul regardless of
# f32 inputs, so "float32" and "bfloat16" compile to the SAME program
# there (PARITY.md footnote 1) — both map to DEFAULT and are kept for
# portability/tests.  The knobs that actually change the TPU program are
# "high" (3-pass bf16 ~ fp32) and "highest" (6-pass), traded against
# 3x/6x MXU time on the matmul stages.
_COMPUTE_SPECS = {
    "default": ("float32", jax.lax.Precision.DEFAULT),
    "float32": ("float32", jax.lax.Precision.DEFAULT),
    "bfloat16": ("bfloat16", jax.lax.Precision.DEFAULT),
    "high": ("float32", jax.lax.Precision.HIGH),
    "highest": ("float32", jax.lax.Precision.HIGHEST),
}


def resolve_compute(name) -> tuple[jnp.dtype, jax.lax.Precision]:
    """Resolve a compute spec: a name from ``_COMPUTE_SPECS``, a raw
    dtype (legacy direct-call convention → DEFAULT precision), or an
    already-resolved (dtype, precision) tuple (idempotent)."""
    if isinstance(name, tuple):
        return name
    if isinstance(name, str):
        if name in _COMPUTE_SPECS:
            dtype, prec = _COMPUTE_SPECS[name]
            return jnp.dtype(dtype), prec
        try:  # legacy direct-dtype convention ('float16', ...)
            return jnp.dtype(name), jax.lax.Precision.DEFAULT
        except TypeError:
            raise ValueError(
                f"unknown compute spec {name!r}; valid names: "
                f"{sorted(_COMPUTE_SPECS)} or any dtype name"
            ) from None
    return jnp.dtype(name), jax.lax.Precision.DEFAULT


def _mm(x: Array, w, compute) -> Array:
    """Matmul over the last/first axes with the resolved compute spec
    ``(input dtype, precision)`` and float32 accumulation.  Accepts
    either a dense Array or an HBM-resident quantized QTensor (dequant
    fused algebraically, ops/qmatmul.py)."""
    from umx_tpu.ops.qmatmul import QTensor, q_mm

    if isinstance(w, QTensor):
        return q_mm(x, w)
    dtype, prec = compute
    return jax.lax.dot_general(
        x.astype(dtype),
        w.astype(dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32,
    )


def _bilstm_layer(x, ih_w, ih_b, hh_w, hh_b, h0, c0, compute):
    """One bidirectional LSTM layer over a full sequence.

    x: (T, in); per-direction weights ih_w (D, in, 4G), hh_w (D, G, 4G),
    biases (D, 4G); initial state h0/c0 (D, G).  Returns (out (T, 2G),
    (hT, cT) each (D, G)).

    The backward direction is the forward scan applied to the reversed
    sequence — its state carry therefore flows across segment boundaries
    exactly like the reference's streaming LSTM (lstm.cpp:112-174 with the
    persistent arenas of umx.cpp:167-171).
    """
    from umx_tpu.ops.qmatmul import QTensor, q_einsum_hh, q_einsum_ih

    dtype, prec = resolve_compute(compute)
    xs = jnp.stack([x, x[::-1]])  # (D, T, in)
    # Input projection hoisted out of the recurrence: one big MXU gemm.
    # Matmul inputs run in the compute spec's dtype/precision with
    # float32 accumulation; gate math and the c/h state stay float32 so
    # error cannot compound across the thousands of scan steps.
    if isinstance(ih_w, QTensor):
        proj = q_einsum_ih(xs, ih_w)
    else:
        proj = jnp.einsum(
            "dti,dig->tdg",
            xs.astype(dtype),
            ih_w.astype(dtype),
            precision=prec,
            preferred_element_type=jnp.float32,
        )
    x_proj = proj + ih_b + hh_b  # (T, D, 4G) float32

    if not isinstance(hh_w, QTensor):
        hh_w = hh_w.astype(dtype)

    def step(carry, xp):
        h, c = carry  # (D, G) float32
        if isinstance(hh_w, QTensor):
            rec = q_einsum_hh(h, hh_w)
        else:
            rec = jnp.einsum(
                "dg,dgf->df", h.astype(dtype), hh_w,
                precision=prec, preferred_element_type=jnp.float32,
            )
        gates = xp + rec
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    (hT, cT), hs = jax.lax.scan(step, (h0, c0), x_proj)  # hs: (T, D, G)
    out = jnp.concatenate([hs[:, 0], hs[::-1, 1]], axis=-1)  # (T, 2G)
    return out, (hT, cT)


def _pre_lstm(params: UMXParams, x: Array, cfg: ModelConfig, compute) -> Array:
    """Input scaling + fc1 + bn1 + tanh for one target: (T, F) → (T, H)."""
    if cfg.input_scaling == "openunmix":
        x = (x + params.input_mean) * params.input_scale
    else:  # reference deviation (inference.cpp:73-83)
        x = x * params.input_scale + params.input_mean
    x = _mm(x, params.fc1_w, compute)
    return jnp.tanh(
        _batchnorm(x, params.bn1_w, params.bn1_b, params.bn1_rm, params.bn1_rv, cfg.bn_eps)
    )


def _post_lstm(params: UMXParams, x: Array, lstm_out: Array, cfg: ModelConfig, compute) -> Array:
    """Skip-concat + fc2/bn2/relu + fc3/bn3 + output norm for one target."""
    eps = cfg.bn_eps
    x = jnp.concatenate([x, lstm_out], axis=-1)  # (T, 2H)
    x = _mm(x, params.fc2_w, compute)
    x = jax.nn.relu(_batchnorm(x, params.bn2_w, params.bn2_b, params.bn2_rm, params.bn2_rv, eps))
    x = _mm(x, params.fc3_w, compute)
    x = _batchnorm(x, params.bn3_w, params.bn3_b, params.bn3_rm, params.bn3_rv, eps)
    return jax.nn.relu(x * params.output_scale + params.output_mean)  # mask (T, O)


def _forward_one_target(
    params: UMXParams, x: Array, h0: Array, c0: Array, cfg: ModelConfig, compute=None
):
    """Mask network for ONE target (to be vmapped over the target axis).

    x: (T, F) cropped stacked-stereo magnitudes.  h0/c0: (L, D, G).
    ``compute`` is the resolved (dtype, precision) spec for every matmul
    (accumulation and elementwise math stay float32).
    Returns (mask (T, O), (hT, cT)).
    """
    if compute is None:
        compute = resolve_compute("default")
    x = _pre_lstm(params, x, cfg, compute)

    lstm_in = x
    hTs, cTs = [], []
    for layer in range(cfg.n_lstm_layers):
        lstm_in, (hT, cT) = _bilstm_layer(
            lstm_in,
            params.lstm_ih_w[layer],
            params.lstm_ih_b[layer],
            params.lstm_hh_w[layer],
            params.lstm_hh_b[layer],
            h0[layer],
            c0[layer],
            compute,
        )
        hTs.append(hT)
        cTs.append(cT)

    mask = _post_lstm(params, x, lstm_in, cfg, compute)
    return mask, (jnp.stack(hTs), jnp.stack(cTs))


def resolve_lstm_impl(impl: str) -> str:
    """Resolve ``"auto"`` to the fastest implementation for the active
    backend: the merged Pallas recurrence kernel on TPU (46 -> 33 ms per
    60 s-segment network on v5e), lax.scan everywhere else (Mosaic
    kernels only lower on real TPUs).  Resolved at trace time — the
    default backend is a process-level property."""
    if impl != "auto":
        return impl
    return "pallas_merged" if jax.default_backend() == "tpu" else "scan"


def umx_pre(params: UMXParams, x: Array, cfg: ModelConfig, compute="default") -> Array:
    """Phase 1 of the mask network: everything BEFORE the recurrence
    (input norm + fc1 + bn1 + tanh, vmapped over targets).

    x: (T, F) shared input magnitudes → x1 (T#, T, H).  Carries no LSTM
    state, so across track chunks this phase is embarrassingly parallel —
    the split-phase streaming orchestrator batches it over chunk groups
    (engine/separator.py) while only :func:`umx_recurrence` rides the
    serial state chain."""
    spec = resolve_compute(compute)
    x = x.astype(jnp.float32)
    return jax.vmap(lambda tp: _pre_lstm(tp, x, cfg, spec))(params)


def umx_post(params: UMXParams, x1: Array, lstm_out: Array, cfg: ModelConfig, compute="default") -> Array:
    """Phase 3: skip-concat + fc2/fc3/bn + output norm (vmapped over
    targets).  State-free, like :func:`umx_pre`.  Returns masks (T#, T, O)."""
    spec = resolve_compute(compute)
    return jax.vmap(lambda tp, a, b: _post_lstm(tp, a, b, cfg, spec))(params, x1, lstm_out)


def _recurrence_scan(params: UMXParams, x1: Array, state: LSTMState, cfg: ModelConfig, spec):
    """3-layer BLSTM via lax.scan, vmapped per target (CPU/portable path)."""

    def one(tp, x1t, h0, c0):
        lstm_in = x1t
        hTs, cTs = [], []
        for layer in range(cfg.n_lstm_layers):
            lstm_in, (hT, cT) = _bilstm_layer(
                lstm_in,
                tp.lstm_ih_w[layer],
                tp.lstm_ih_b[layer],
                tp.lstm_hh_w[layer],
                tp.lstm_hh_b[layer],
                h0[layer],
                c0[layer],
                spec,
            )
            hTs.append(hT)
            cTs.append(cT)
        return lstm_in, (jnp.stack(hTs), jnp.stack(cTs))

    out, (h, c) = jax.vmap(one)(params, x1, state.h, state.c)
    return out, LSTMState(h=h, c=c)


def _recurrence_pallas(
    params: UMXParams, x1: Array, state: LSTMState, cfg: ModelConfig, compute,
    impl: str, interpret=False
):
    """3-layer BLSTM where each layer's recurrence runs as one Pallas
    kernel over ALL targets/directions (ops/lstm_pallas.py)."""
    from umx_tpu.ops.lstm_pallas import lstm_layer_pallas, lstm_layer_pallas_merged
    from umx_tpu.ops.qmatmul import QTensor, q_einsum_ih

    layer_fn = (
        lstm_layer_pallas_merged if impl == "pallas_merged" else lstm_layer_pallas
    )

    dtype, prec = compute

    lstm_in = x1
    hTs, cTs = [], []
    for layer in range(cfg.n_lstm_layers):
        # (T#, D, T, in): forward rows + time-reversed rows
        xs = jnp.stack([lstm_in, lstm_in[:, ::-1]], axis=1)
        ih_w = params.lstm_ih_w[:, layer]
        if isinstance(ih_w, QTensor):
            proj = jax.vmap(q_einsum_ih)(xs, ih_w)  # (T#, T, D, 4G)
        else:
            proj = jnp.einsum(
                "jdti,jdig->jtdg",
                xs.astype(dtype),
                ih_w.astype(dtype),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
        x_proj = proj + (params.lstm_ih_b[:, layer] + params.lstm_hh_b[:, layer])[:, None]

        hh_w = params.lstm_hh_w[:, layer]
        if isinstance(hh_w, QTensor):
            # dense-ify for VMEM residency (still bf16 inside the kernel)
            dense = hh_w.planes[0].astype(jnp.float32)
            if len(hh_w.planes) == 2:
                dense = 256.0 * dense + hh_w.planes[1].astype(jnp.float32)
            scale = hh_w.scale.reshape(*hh_w.scale.shape, 1, 1)
            offset = hh_w.offset.reshape(*hh_w.offset.shape, 1, 1)
            hh_dense = dense * scale + offset
        else:
            hh_dense = hh_w
        # kernel contracts over G: wants (T#, D, G, 4G)
        hs, hT, cT = layer_fn(
            x_proj,
            hh_dense,
            state.h[:, layer],
            state.c[:, layer],
            time_block=cfg.lstm_time_block,
            interpret=interpret,
        )
        lstm_in = jnp.concatenate([hs[:, :, 0], hs[:, ::-1, 1]], axis=-1)  # (T#, T, 2G)
        hTs.append(hT)
        cTs.append(cT)

    return lstm_in, LSTMState(h=jnp.stack(hTs, axis=1), c=jnp.stack(cTs, axis=1))


def umx_recurrence(
    params: UMXParams, x1: Array, state: LSTMState, cfg: ModelConfig, compute="default"
) -> tuple[Array, LSTMState]:
    """Phase 2: the 3-layer bidirectional LSTM — the ONLY phase that
    carries streaming state across chunks (reference: persistent
    lstm_data arenas, umx.cpp:167-171).

    x1: (T#, T, H) from :func:`umx_pre` → (lstm_out (T#, T, 2G), new
    state).  Dispatches to the merged Pallas kernel on TPU (lstm_impl
    "auto") or the vmapped lax.scan path elsewhere."""
    spec = resolve_compute(compute)
    impl = resolve_lstm_impl(cfg.lstm_impl)
    if impl.startswith("pallas"):
        return _recurrence_pallas(
            params, x1, state, cfg, spec, impl, interpret=impl == "pallas_interpret"
        )
    return _recurrence_scan(params, x1, state, cfg, spec)


def _recurrence_pallas_batched(
    params: UMXParams, x1_b: Array, state_b: LSTMState, cfg: ModelConfig,
    compute, interpret: bool = False,
):
    """Explicitly-BATCHED 3-layer BLSTM on the merged kernel — the
    TRAINING recurrence.  Unlike :func:`_recurrence_pallas` (whose
    custom_vmap wrapper folds mapped axes but blocks reverse-mode AD at
    its call primitive), the batch axis here is a real leading dimension
    passed straight into the differentiable batched kernel entry
    (ops/lstm_pallas.lstm_layer_pallas_merged_batched, custom VJP), so
    jax.grad rides the residual-forward + reverse-grid backward kernels.

    x1_b: (B, T#, T, H); state_b: batched LSTMState (B, T#, L, D, G).
    """
    from umx_tpu.ops.lstm_pallas import lstm_layer_pallas_merged_batched

    dtype, prec = compute
    lstm_in = x1_b
    hTs, cTs = [], []
    for layer in range(cfg.n_lstm_layers):
        # (B, T#, D, T, in): forward rows + time-reversed rows
        xs = jnp.stack([lstm_in, lstm_in[:, :, ::-1]], axis=2)
        proj = jnp.einsum(
            "bjdti,jdig->bjtdg",
            xs.astype(dtype),
            params.lstm_ih_w[:, layer].astype(dtype),
            precision=prec,
            preferred_element_type=jnp.float32,
        )
        x_proj = proj + (
            params.lstm_ih_b[:, layer] + params.lstm_hh_b[:, layer]
        )[None, :, None]
        hs, hT, cT = lstm_layer_pallas_merged_batched(
            x_proj,
            params.lstm_hh_w[:, layer],
            state_b.h[:, :, layer],
            state_b.c[:, :, layer],
            time_block=cfg.lstm_time_block,
            interpret=interpret,
        )
        lstm_in = jnp.concatenate([hs[:, :, :, 0], hs[:, :, ::-1, 1]], axis=-1)
        hTs.append(hT)
        cTs.append(cT)

    return lstm_in, LSTMState(h=jnp.stack(hTs, axis=2), c=jnp.stack(cTs, axis=2))


def umx_recurrence_batched(
    params: UMXParams, x1_b: Array, state_b: LSTMState, cfg: ModelConfig,
    compute="default", interpret: bool = False,
) -> tuple[Array, LSTMState]:
    """Batched recurrence dispatch (training path): the differentiable
    merged kernel where inference would use it (lstm_impl auto on TPU,
    dense weights), the vmapped scan elsewhere."""
    from umx_tpu.ops.qmatmul import QTensor

    spec = resolve_compute(compute)
    impl = resolve_lstm_impl(cfg.lstm_impl)
    if impl == "pallas_merged" and not isinstance(params.lstm_hh_w, QTensor):
        return _recurrence_pallas_batched(
            params, x1_b, state_b, cfg, spec, interpret=interpret
        )
    out, st = jax.vmap(
        lambda x1, h, c: _recurrence_scan(params, x1, LSTMState(h=h, c=c), cfg, spec)
    )(x1_b, state_b.h, state_b.c)
    return out, st


def umx_forward_batched(
    params: UMXParams, x_b: Array, state_b: LSTMState, cfg: ModelConfig,
    compute="default",
) -> tuple[Array, LSTMState]:
    """Batched all-targets mask network (training forward): state-free
    pre/post phases vmap over the batch; the recurrence takes the batch
    axis explicitly so training differentiates THROUGH the merged kernel
    (see :func:`umx_recurrence_batched`).  x_b: (B, T, F)."""
    spec = resolve_compute(compute)
    x1_b = jax.vmap(lambda x: umx_pre(params, x, cfg, spec))(x_b)
    lstm_out, new_state = umx_recurrence_batched(params, x1_b, state_b, cfg, spec)
    masks = jax.vmap(
        lambda a, b: umx_post(params, a, b, cfg, spec)
    )(x1_b, lstm_out)
    return masks, new_state


def umx_recurrence_pipelined_step(
    params: UMXParams,
    stage_inputs: list,
    stage_states: list,
    layers: list,
    cfg: ModelConfig,
    compute="default",
    interpret: bool = False,
) -> tuple[list, list]:
    """One iteration of the cross-chunk LAYER-PIPELINED streaming
    recurrence (`stream_impl="pipelined"`; rationale in
    scripts/lstm_pipeline_probe.py).

    Each ACTIVE stage runs LSTM layer ``layers[s]`` on a DIFFERENT
    chunk's data: layer l of chunk k only needs layer l-1 of chunk k
    (one pipeline iteration earlier) and its own layer-l state from
    chunk k-1 (the previous iteration's stage-l output), so the
    schedule L1(k) | L2(k-1) | L3(k-2) is mathematically identical to
    the serial streaming program — PERF.md's "layers are inherently
    serial" argument binds only WITHIN one chunk (a bidirectional layer
    needs its own chunk's full previous-layer sequence).  Stacking the
    stages into the merged kernel's chain axis (R = stages*targets*2)
    triples the independent weight-distinct chains per dependent step;
    whether the hardware hides the chain latency is the probe's
    question.

    stage_inputs: per-stage (T#, T, H) layer inputs (layer 0: umx_pre's
    x1 of the newest chunk; layer l>0: layer l-1's output of an older
    chunk).  stage_states: per-stage (h, c) each (T#, D, G).  layers:
    which LSTM layer each stage runs.  Dense weights only (the
    quantized-HBM path keeps the serial scan — guard in the caller).
    Returns (per-stage outputs (T#, T, 2G), per-stage new (h, c)).
    """
    from umx_tpu.ops.lstm_pallas import lstm_layer_pallas_merged

    spec = resolve_compute(compute)
    dtype, prec = spec
    S = len(layers)
    assert S == len(stage_inputs) == len(stage_states) and S >= 1
    # (S, T#, D, T, H): forward rows + time-reversed rows per stage
    xs = jnp.stack(
        [jnp.stack([x, x[:, ::-1]], axis=1) for x in stage_inputs]
    )
    ih_w = jnp.stack([params.lstm_ih_w[:, l] for l in layers])  # (S,T#,D,H,4G)
    proj = jnp.einsum(
        "sjdti,sjdig->sjtdg",
        xs.astype(dtype),
        ih_w.astype(dtype),
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    bias = jnp.stack(
        [params.lstm_ih_b[:, l] + params.lstm_hh_b[:, l] for l in layers]
    )  # (S, T#, D, 4G)
    x_proj = proj + bias[:, :, None]  # (S, T#, T, D, 4G)
    hh = jnp.stack([params.lstm_hh_w[:, l] for l in layers])  # (S,T#,D,G,4G)

    Sn, Tn, T, D, G4 = x_proj.shape
    G = G4 // 4
    hs, hT, cT = lstm_layer_pallas_merged(
        x_proj.reshape(Sn * Tn, T, D, G4),
        hh.reshape(Sn * Tn, D, G, G4),
        jnp.concatenate([h for h, _ in stage_states], axis=0),
        jnp.concatenate([c for _, c in stage_states], axis=0),
        time_block=cfg.lstm_time_block,
        interpret=interpret,
    )
    outs, new_states = [], []
    for s in range(Sn):
        hss = hs[s * Tn : (s + 1) * Tn]  # (T#, T, D, G)
        outs.append(
            jnp.concatenate([hss[:, :, 0], hss[:, ::-1, 1]], axis=-1)
        )
        new_states.append(
            (hT[s * Tn : (s + 1) * Tn], cT[s * Tn : (s + 1) * Tn])
        )
    return outs, new_states


def umx_forward(
    params: UMXParams, x: Array, state: LSTMState, cfg: ModelConfig, compute="default"
) -> tuple[Array, LSTMState]:
    """All-targets mask network.

    x: (T, F) shared input magnitudes (float32); params carry the target
    axis.  ``compute`` names a spec from ``_COMPUTE_SPECS``: "default"
    (single-pass bf16 matmuls — what TPU DEFAULT precision does even for
    f32 inputs), "high"/"highest" (3/6-pass fp32-class emulation — the
    knobs that ACTUALLY change the TPU program), or the legacy dtype
    names "float32"/"bfloat16" (identical programs on TPU, kept for
    portability and CPU tests).  Activations and state stay float32.
    NOTE: the Pallas merged-kernel recurrence (lstm_impl auto on TPU)
    always runs bf16 hh-weights with f32 accumulation regardless of the
    spec — its full-scale oracle deviation is identical to fp32
    (PARITY.md); only the XLA matmul stages (fc1/fc2/fc3, ih
    projections) honor high/highest.
    Returns (masks (T#, T, O), new streaming state).
    """
    spec = resolve_compute(compute)
    x1 = umx_pre(params, x, cfg, spec)
    lstm_out, new_state = umx_recurrence(params, x1, state, cfg, spec)
    return umx_post(params, x1, lstm_out, cfg, spec), new_state


def param_count(params: UMXParams) -> int:
    return sum(int(np.prod(getattr(params, f.name).shape)) for f in fields(params))
