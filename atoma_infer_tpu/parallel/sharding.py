"""Sharding specs for Llama-family parameters and the paged KV cache.

Mirrors the reference's tensor-parallel math (models/src/llama_nccl.rs:31-43,
184-210 + multi_gpu.rs):

- q/k/v/gate/up projections: column-parallel → shard the OUTPUT feature dim
  (reference shards weight dim 0 of ``[out, in]``; our layout is
  ``[L, in, out]`` so the sharded dim is the last).
- o/down projections: row-parallel → shard the INPUT feature dim (dim 1);
  the per-layer all-reduce the reference issues explicitly
  (multi_gpu.rs:159-175) becomes an XLA-inserted psum.
- embed / norms: replicated (llama_nccl.rs:12-25,320-322).
- lm_head: vocab-sharded (logits gathered for sampling).
- KV cache ``[L, slots, 2, Hk, D]``: sharded over kv heads, matching the
  reference's CacheEngine division by world size (worker.rs:584-591).

Quantized tensors (QuantizedTensor pytrees) shard qweight and scales along
the matching dims.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.quant import QuantizedTensor
from .mesh import TP_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_linear(mesh: Mesh, key: str, value) -> Any:
    """Sharding for one stacked linear [L, in, out] (dense or quantized)."""
    if key in ("w1", "w2", "w3", "router"):
        return _spec_for_moe(mesh, key, value)
    if key in ("q_bias", "k_bias", "v_bias"):
        # Additive biases on column-parallel projections: shard the output
        # dim like the matmul result they add to.
        return NamedSharding(mesh, P(None, TP_AXIS))
    col_parallel = key in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
    row_parallel = key in ("o_proj", "down_proj")
    if not (col_parallel or row_parallel):
        return replicated(mesh)

    if isinstance(value, QuantizedTensor):
        if col_parallel:
            return QuantizedTensor(
                qweight=NamedSharding(mesh, P(None, None, TP_AXIS)),
                scales=NamedSharding(mesh, P(None, None, TP_AXIS)),
                bits=value.bits,
                group_size=value.group_size,
            )
        return QuantizedTensor(
            qweight=NamedSharding(mesh, P(None, TP_AXIS, None)),
            scales=NamedSharding(mesh, P(None, TP_AXIS, None)),
            bits=value.bits,
            group_size=value.group_size,
        )
    if col_parallel:
        return NamedSharding(mesh, P(None, None, TP_AXIS))
    return NamedSharding(mesh, P(None, TP_AXIS, None))


def _spec_for_moe(mesh: Mesh, key: str, value) -> Any:
    """Expert parallelism for Mixtral MoE stacks (models/mixtral.py; the
    reference has no MoE — README Roadmap #6, SURVEY §2.6 EP row: NO).

    The expert axis E partitions over the tp mesh axis when divisible —
    each shard holds E/tp whole experts, computes their SwiGLU einsums
    locally, and the final ``te,teh->th`` mix contracts the sharded expert
    axis, which XLA lowers to a psum over ICI (one collective per layer,
    the same count as tensor-parallel row-linears). When E does not divide
    (mesh wider than the expert count) the intermediate dim shards instead
    — plain tensor parallelism inside every expert."""
    if key == "router":
        return replicated(mesh)  # [L, H, E] — tiny, read by every shard
    tp = mesh.shape.get(TP_AXIS, 1)
    E = value.shape[1]
    if E % tp == 0:
        return NamedSharding(mesh, P(None, TP_AXIS, None, None))
    if key in ("w1", "w3"):  # [L, E, H, I]: column-parallel inside experts
        return NamedSharding(mesh, P(None, None, None, TP_AXIS))
    return NamedSharding(mesh, P(None, None, TP_AXIS, None))  # w2 [L,E,I,H]


def param_shardings(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """Pytree of shardings matching ``models/llama.py`` param structure."""
    layers = {}
    for key, value in params["layers"].items():
        layers[key] = _spec_for_linear(mesh, key, value)
    out: Dict[str, Any] = {
        "embed": replicated(mesh),
        "layers": layers,
        "final_norm": replicated(mesh),
    }
    if "lm_head" in params:
        lm = params["lm_head"]
        if isinstance(lm, QuantizedTensor):
            out["lm_head"] = QuantizedTensor(
                qweight=NamedSharding(mesh, P(None, TP_AXIS)),
                scales=NamedSharding(mesh, P(None, TP_AXIS)),
                bits=lm.bits,
                group_size=lm.group_size,
            )
        else:
            out["lm_head"] = NamedSharding(mesh, P(None, TP_AXIS))
    return out


def kv_cache_sharding(mesh: Mesh) -> NamedSharding:
    """Page-major KV cache [L, pages, bs, 2·Hk·D] sharded over the
    head-interleaved row dim — each shard holds its kv heads' K and V
    (ref: worker.rs:584-591 divides kv heads by world size)."""
    return NamedSharding(mesh, P(None, None, None, TP_AXIS))


def kv_cache_layer_sharding(mesh: Mesh) -> NamedSharding:
    """Per-layer page-major cache [pages, bs, 2·Hk·D] — the CacheEngine's
    per-layer-array form of :func:`kv_cache_sharding`."""
    return NamedSharding(mesh, P(None, None, TP_AXIS))


def shard_params(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """Place parameters onto the mesh with TP shardings."""
    specs = param_shardings(mesh, params)
    # QuantizedTensor is a registered pytree, so spec leaves align 1:1 with
    # param leaves (qweight/scales).
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, specs
    )
