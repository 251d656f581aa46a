"""Device-mesh construction for multi-chip runs.

The reference is a single-process CPU binary with no distributed backend
(SURVEY §2d); parallel scale-out here is new design freedom.  The layout
follows the standard JAX recipe: build a Mesh, annotate shardings, let
XLA insert the collectives over ICI.

Axes:

* ``dp`` — data parallel: independent tracks/segments across chips.
  A single track's forward needs no cross-chip communication at all
  (the model is ~132 MB and fits one chip's HBM trivially), so dp is
  the throughput axis for fleet configs (BASELINE.json config 5).
* ``tp`` — model parallel over the 4 separation targets: each chip
  holds 4/tp targets' weights.  The only cross-chip communication is
  at the target-combine points: per-target mask all-gathers and the
  Wiener mixture re-estimate's sum-over-sources, which XLA lowers as
  one small (T, F) complex all-reduce (~1.4 MB per segment — cheap on
  ICI; audited by tests/test_parallel.py on the compiled HLO).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. With defaults, uses all devices for dp."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, have {n}")
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dp_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "dp"
    return NamedSharding(mesh, P(*spec))


def tp_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "tp"
    return NamedSharding(mesh, P(*spec))
