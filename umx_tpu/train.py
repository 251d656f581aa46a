"""Training for the UMX mask network.

The reference vendors open-unmix-pytorch precisely because that is where
its models come from (SURVEY §2c); the TPU-native framework carries its
own trainer so the full model lifecycle (train → quantize → ggml →
serve) lives here.  Objective follows upstream openunmix: MSE between
the masked mixture magnitude and the target source magnitude, per
target.  All four targets train jointly (their weights are one stacked
pytree), which on TPU turns 4 independent CPU training runs into one
batched program.

Sharding: batch over ``dp``, the stacked target axis over ``tp``
(model parallel).  Gradients reduce over dp via the psum XLA inserts for
the replicated-param/sharded-batch layout; tp needs no gradient
collectives at all because each target's weights only see its own loss
term.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from umx_tpu.config import ModelConfig
from umx_tpu.engine.separator import apply_masks
from umx_tpu.models.umx import UMXParams, init_lstm_state

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: UMXParams
    opt_state: Any
    step: Array


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    # sequence length (frames) per training example
    seq_len: int = 256
    # -- the upstream open-unmix recipe knobs (train.py of the vendored
    # open-unmix-pytorch, SURVEY §2c): ReduceLROnPlateau(factor=0.3,
    # patience=80, cooldown=10) + EarlyStopping(patience=140), both
    # driven by the validation loss.  Patience here counts VALIDATION
    # ROUNDS (one per `valid_every` steps), the epoch analogue.
    lr_decay_gamma: float = 0.3
    lr_decay_patience: int = 80
    lr_decay_cooldown: int = 10
    early_stop_patience: int = 140


def _param_labels() -> UMXParams:
    """BatchNorm running statistics are inference-mode buffers (the loss
    evaluates BN with them), NOT gradient-trained parameters — updating
    them with AdamW can drive running_var negative and NaN the loss.
    Everything else (incl. input/output norm, which upstream openunmix
    registers as nn.Parameter) trains.  NOTE: optax.masked is NOT enough
    here — it passes masked-out gradients through unchanged; the frozen
    group must be routed to set_to_zero."""
    import dataclasses as dc

    frozen = {"bn1_rm", "bn1_rv", "bn2_rm", "bn2_rv", "bn3_rm", "bn3_rv"}
    return UMXParams(
        **{f.name: ("freeze" if f.name in frozen else "train") for f in dc.fields(UMXParams)}
    )


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW over the trainable group, with the learning rate lifted into
    the optimizer STATE (optax.inject_hyperparams) so the host-side
    plateau scheduler can lower it mid-run without retracing the jitted
    train step — the LR rides as a traced scalar, not a compile-time
    constant."""

    def inner(learning_rate):
        return optax.multi_transform(
            {
                "train": optax.adamw(learning_rate, weight_decay=tcfg.weight_decay),
                "freeze": optax.set_to_zero(),
            },
            _param_labels(),
        )

    return optax.inject_hyperparams(inner)(learning_rate=tcfg.learning_rate)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    """New opt_state with the injected learning rate replaced (placed with
    the old scalar's sharding so sharded training keeps its layout)."""
    old = opt_state.hyperparams["learning_rate"]
    new = jax.device_put(jnp.asarray(lr, jnp.float32), old.sharding)
    return opt_state._replace(hyperparams={**opt_state.hyperparams, "learning_rate": new})


@dataclass
class PlateauScheduler:
    """Host-side ReduceLROnPlateau (torch semantics, as used by the
    upstream open-unmix trainer): when the monitored loss hasn't improved
    for ``patience`` rounds, multiply the LR by ``gamma``, then pause
    counting for ``cooldown`` rounds."""

    lr: float
    gamma: float = 0.3
    patience: int = 80
    cooldown: int = 10
    best: float = float("inf")
    _bad: int = 0
    _cool: int = 0

    def update(self, loss: float) -> float:
        """Feed one validation loss; returns the (possibly lowered) LR.

        Mirrors torch ReduceLROnPlateau exactly: the cooldown counter
        decrements EVERY epoch it is active (improving or not) and
        suppresses bad-epoch counting while active, so decay resumes at
        the same epoch upstream would."""
        if loss < self.best:
            self.best = loss
            self._bad = 0
        else:
            self._bad += 1
        if self._cool > 0:
            self._cool -= 1
            self._bad = 0
        if self._bad > self.patience:
            self.lr *= self.gamma
            self._bad = 0
            self._cool = self.cooldown
        return self.lr


@dataclass
class EarlyStopper:
    """Stop when the monitored loss hasn't improved by ``min_delta`` for
    ``patience`` validation rounds (upstream utils.EarlyStopping)."""

    patience: int = 140
    min_delta: float = 0.0
    best: float = float("inf")
    _bad: int = 0

    def update(self, loss: float) -> bool:
        if loss < self.best - self.min_delta:
            self.best = loss
            self._bad = 0
            return False
        self._bad += 1
        return self._bad > self.patience


def init_train_state(params: UMXParams, tcfg: TrainConfig) -> TrainState:
    opt = make_optimizer(tcfg)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))


def mask_loss(params: UMXParams, batch: dict[str, Array], cfg: ModelConfig) -> Array:
    """MSE between masked mix magnitudes and target magnitudes.

    batch:
      x           (B, T, F_in)  cropped stacked-stereo mix magnitudes
      mix_mag     (B, 2, T, n_bins)
      target_mag  (B, T#, 2, T, n_bins)
    """

    # The MERGED Pallas recurrence defines a custom VJP (residual-mode
    # forward + reverse-grid backward kernels, ops/lstm_pallas.py), so
    # training rides the kernel wherever inference does (lstm_impl auto
    # resolves to pallas_merged on TPU) — via the EXPLICITLY-batched
    # forward, because the inference path's custom_vmap wrapper blocks
    # reverse-mode AD at its call primitive.  Only the non-merged /
    # interpret kernels remain forward-only: map those to the scan.
    from umx_tpu.models.umx import resolve_lstm_impl, umx_forward_batched

    if resolve_lstm_impl(cfg.lstm_impl) not in ("scan", "pallas_merged"):
        import dataclasses

        cfg = dataclasses.replace(cfg, lstm_impl="scan")

    B = batch["x"].shape[0]
    state_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B, *x.shape)), init_lstm_state(cfg)
    )
    masks, _ = umx_forward_batched(params, batch["x"], state_b, cfg)  # (B, T#, T, O)
    pred = jax.vmap(lambda m, mg: apply_masks(m, mg, cfg.n_bins))(masks, batch["mix_mag"])
    return jnp.mean(jnp.square(pred - batch["target_mag"]))


def make_eval_step(cfg: ModelConfig):
    """Jitted validation loss: same objective as training, no grad."""
    return jax.jit(partial(mask_loss, cfg=cfg))


def make_train_step(cfg: ModelConfig, tcfg: TrainConfig):
    """Returns ``train_step(state, batch) -> (state, loss)`` (pure; jit
    it with whatever shardings the caller wants)."""
    opt = make_optimizer(tcfg)

    def train_step(state: TrainState, batch: dict[str, Array]):
        loss, grads = jax.value_and_grad(mask_loss)(state.params, batch, cfg)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_sharded_train_step(cfg: ModelConfig, tcfg: TrainConfig, mesh, tp: bool = True):
    """The train step jitted over a (dp, tp) mesh: batch sharded on dp,
    params/optimizer state sharded on tp over the target axis.

    The MESH-sharded step pins the recurrence to the lax.scan BLSTM:
    XLA's sharding propagation partitions a scan transparently, whereas
    a pallas_call under pjit would need explicit shard_map plumbing for
    its operands (the single-chip trainer — the measured configuration —
    rides the merged kernel's custom VJP via mask_loss's auto
    resolution)."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = dataclasses.replace(cfg, lstm_impl="scan")

    pspec = NamedSharding(mesh, P("tp") if tp else P())
    bspec = NamedSharding(mesh, P("dp"))
    rspec = NamedSharding(mesh, P())

    step = make_train_step(cfg, tcfg)

    def shard_state(state: TrainState) -> TrainState:
        def put(x):
            x = jnp.asarray(x)
            if x.ndim >= 1 and x.shape[0] == cfg.n_targets:
                return jax.device_put(x, pspec)
            return jax.device_put(x, rspec)

        return jax.tree.map(put, state)

    def shard_batch(batch):
        return {k: jax.device_put(jnp.asarray(v), bspec) for k, v in batch.items()}

    return jax.jit(step, donate_argnums=(0,)), shard_state, shard_batch


# ---------------------------------------------------------------------------
# Checkpoint / resume (orbax).  The reference has no checkpointing at all
# (inference-only, SURVEY §5); the trainer here gets real save/restore so
# long runs survive preemption.
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def export_ggml(params: UMXParams, path: str, cfg: ModelConfig) -> None:
    """Serialize trained params back to the quantized ggml format, closing
    the train → quantize → serve loop (the reference's converter only goes
    from torch checkpoints)."""
    import numpy as np

    from umx_tpu.io.ggml import TARGET_ORDER, write_ggml

    targets = {}
    half_f = cfg.n_features // 2
    half_o = cfg.n_outputs // 2
    for t_idx, tname in enumerate(TARGET_ORDER):
        p = jax.tree.map(lambda x: np.asarray(x[t_idx]), params)
        d = {
            "input_mean": p.input_mean[:half_f],
            "input_scale": p.input_scale[:half_f],
            "output_scale": p.output_scale[:half_o],
            "output_mean": p.output_mean[:half_o],
            "fc1.weight": p.fc1_w.T,
            "fc2.weight": p.fc2_w.T,
            "fc3.weight": p.fc3_w.T,
        }
        for pre, w, b, rm, rv in (
            ("bn1", p.bn1_w, p.bn1_b, p.bn1_rm, p.bn1_rv),
            ("bn2", p.bn2_w, p.bn2_b, p.bn2_rm, p.bn2_rv),
            ("bn3", p.bn3_w, p.bn3_b, p.bn3_rm, p.bn3_rv),
        ):
            d[f"{pre}.weight"] = w
            d[f"{pre}.bias"] = b
            d[f"{pre}.running_mean"] = rm
            d[f"{pre}.running_var"] = rv
        for layer in range(cfg.n_lstm_layers):
            for di, rev in enumerate(("", "_reverse")):
                d[f"lstm.weight_ih_l{layer}{rev}"] = p.lstm_ih_w[layer, di].T
                d[f"lstm.weight_hh_l{layer}{rev}"] = p.lstm_hh_w[layer, di].T
                d[f"lstm.bias_ih_l{layer}{rev}"] = p.lstm_ih_b[layer, di]
                d[f"lstm.bias_hh_l{layer}{rev}"] = p.lstm_hh_b[layer, di]
        targets[tname] = d
    write_ggml(path, cfg.hidden_size, targets)


@partial(jax.jit, static_argnames=("cfg", "dsp_cfg"))
def _prep_batch(mix, targets, cfg: ModelConfig, dsp_cfg):
    """Jitted at module level (configs are hashable static args) so each
    (shape, config) compiles exactly once — defining it inside
    make_batch_from_audio would retrace every training step."""
    from umx_tpu.ops import stft as stft_ops

    mix_spec = stft_ops.stft(mix, dsp_cfg)  # (B, 2, T, F)
    mix_mag = jnp.abs(mix_spec)
    tgt_mag = jnp.abs(stft_ops.stft(targets, dsp_cfg))  # (B, T#, 2, T, F)
    left = mix_mag[:, 0, :, : cfg.nb_bins_cropped]
    right = mix_mag[:, 1, :, : cfg.nb_bins_cropped]
    x = jnp.concatenate([left, right], axis=-1)  # (B, T, F_in)
    return x, mix_mag, tgt_mag


def make_batch_from_audio(audio_mix, audio_targets, cfg: ModelConfig, dsp_cfg, seq_len: int):
    """Build a training batch from raw audio on the host.

    audio_mix (B, 2, n); audio_targets (B, T#, 2, n).  Uses the same
    on-device STFT as inference (one jit per shape/config).
    """
    x, mix_mag, tgt_mag = _prep_batch(
        jnp.asarray(audio_mix), jnp.asarray(audio_targets), cfg, dsp_cfg
    )
    return {
        "x": x[:, :seq_len],
        "mix_mag": mix_mag[:, :, :seq_len],
        "target_mag": tgt_mag[:, :, :, :seq_len],
    }
