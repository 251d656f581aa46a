"""Sharding plans for params and batched inference.

* Parameters: replicated over dp, optionally sharded over tp on the
  leading target axis (every UMX tensor exists per target, so the target
  axis is a clean model-parallel dimension).
* Batched demix: a batch of independent segments sharded over dp; each
  device runs the full per-segment pipeline locally (no collectives in
  the hot path, matching the "no communication inside a track's forward"
  plan of SURVEY §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from umx_tpu.config import EngineConfig
from umx_tpu.engine.separator import segment_forward
from umx_tpu.models.umx import LSTMState, UMXParams


def shard_params(params: UMXParams, mesh: Mesh, tp: bool = False) -> UMXParams:
    """Place params on the mesh: target axis over 'tp' when requested
    (each chip holds 4/tp targets' weights), else fully replicated."""
    spec = P("tp") if tp else P()
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, sh), params)


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples"))
def _batched_segment_forward(params, audio_batch, states, cfg: EngineConfig, n_samples: int):
    return jax.vmap(
        lambda a, s: segment_forward(params, a, s, cfg, n_samples),
        in_axes=(0, 0),
    )(audio_batch, states)


def demix_segments_batch(
    params: UMXParams,
    audio_batch,  # (B, 2, n_samples)
    states: LSTMState,  # leading batch axis on h/c
    cfg: EngineConfig,
    mesh: Mesh,
    tp: bool = False,
):
    """Demix a batch of independent segments, sharded over the mesh's dp
    axis; with ``tp`` the stacked target axis of the weights is sharded
    over the tp axis as well (model parallel — XLA all-gathers the tiny
    per-target masks where they combine).  Returns ((B, T#, 2, n), new
    states)."""
    n_samples = audio_batch.shape[-1]
    dp = NamedSharding(mesh, P("dp"))
    audio_batch = jax.device_put(jnp.asarray(audio_batch, jnp.float32), dp)
    states = jax.tree.map(lambda x: jax.device_put(x, dp), states)
    params = shard_params(params, mesh, tp=tp)
    return _batched_segment_forward(params, audio_batch, states, cfg, n_samples)


def batched_lstm_state(cfg, batch: int) -> LSTMState:
    from umx_tpu.models.umx import init_lstm_state

    st = init_lstm_state(cfg.model)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch, *x.shape)), st)


_COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "collective-permute",
    "reduce-scatter",
    "collective-broadcast",
)


def audit_collectives(
    params: UMXParams,
    audio_batch,
    states: LSTMState,
    cfg: EngineConfig,
    mesh: Mesh,
    tp: bool = False,
) -> list[str]:
    """Compile the batched demix program under the given mesh shardings
    and return every collective instruction in the optimized HLO.

    The dp fleet plan (SURVEY §2d / mesh.py docstring) promises *zero*
    cross-chip communication in a track's forward — each chip runs the
    whole per-segment pipeline on its shard of the batch.  This audit
    turns that promise into a checkable property of the compiled
    program (VERDICT r2 #6); with ``tp`` the expected collectives are
    the tiny per-target mask all-gathers only.
    """
    n_samples = audio_batch.shape[-1]
    dp = NamedSharding(mesh, P("dp"))
    audio_batch = jax.device_put(jnp.asarray(audio_batch, jnp.float32), dp)
    states = jax.tree.map(lambda x: jax.device_put(x, dp), states)
    params = shard_params(params, mesh, tp=tp)
    compiled = (
        _batched_segment_forward.lower(params, audio_batch, states, cfg, n_samples)
        .compile()
    )
    found: list[str] = []
    for line in compiled.as_text().splitlines():
        s = line.strip()
        for op in _COLLECTIVE_OPS:
            # match HLO instruction definitions ("%x = ... all-reduce(...")
            # and custom-call lowerings, not metadata/comment mentions
            if f" {op}(" in s or f"{op}-start(" in s:
                found.append(s[:160])
                break
    return found
