"""umx-tpu: TPU-native (JAX/XLA/Pallas) Open-Unmix music source separation.

A from-scratch rebuild of the capabilities of sevagh/umx.cpp — quantized
ggml UMX-L/UMX-HQ weights in, 4 demixed stems out — designed for TPU:
the whole per-track pipeline (STFT → mask network → Wiener-EM → iSTFT)
runs as jitted XLA with the 4 targets vmapped, the BLSTM as a lax.scan,
and tracks shardable data-parallel across a device mesh.
"""

__version__ = "0.1.0"

import os as _os

if "UMX_TPU_PLATFORM" in _os.environ:
    # Reliable platform override: some TPU plugins clobber JAX_PLATFORMS
    # at registration time, so an env-var-only override silently fails;
    # jax.config.update wins as long as no backend is initialized yet.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["UMX_TPU_PLATFORM"])

from umx_tpu.config import (  # noqa: F401
    TARGETS,
    DSPConfig,
    EngineConfig,
    ModelConfig,
    SegmentConfig,
    WienerConfig,
)
from umx_tpu.engine.separator import Separator, segment_forward  # noqa: F401
from umx_tpu.models.umx import (  # noqa: F401
    LSTMState,
    UMXParams,
    init_lstm_state,
    params_from_ggml,
    synthetic_params,
    umx_forward,
    umx_post,
    umx_pre,
    umx_recurrence,
)
