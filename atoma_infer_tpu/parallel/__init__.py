"""Parallelism: device mesh + sharding specs.

TPU-native replacement of the reference's NCCL tensor-parallel stack
(models/src/multi_gpu.rs, models/src/llama_nccl.rs, and the per-GPU thread
dispatcher in model_executor.rs:394-545 — SURVEY.md §2.6): instead of
explicit rank threads, comms and column/row-parallel linear wrappers, the
model is ONE SPMD program jitted over a ``jax.sharding.Mesh``; parameter and
KV-cache shardings follow the same math (qkv/gate/up column-sharded, o/down
row-sharded with an implicit psum, KV heads sharded) but XLA inserts the
collectives.
"""

from .mesh import make_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    kv_cache_layer_sharding,
    kv_cache_sharding,
    param_shardings,
    replicated,
    shard_params,
)
