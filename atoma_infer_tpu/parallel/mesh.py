"""Device mesh construction.

The reference's "topology" is a flat list of GPU device ids with one NCCL
communicator (model_executor.rs:405-440). The TPU-native topology is a named
mesh whose axes map onto ICI; tensor parallelism shards over ``tp`` and
(future) data/pipeline axes extend the same mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

TP_AXIS = "tp"
DP_AXIS = "dp"


def make_mesh(
    tp: Optional[int] = None,
    dp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes (dp, tp); tp defaults to all local devices."""
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // dp
    if dp * tp != len(devices):
        raise ValueError(
            f"dp ({dp}) × tp ({tp}) != device count ({len(devices)})"
        )
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))
