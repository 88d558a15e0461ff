"""Pipeline parallelism: stage meshes + parameter splitting.

The reference has no pipeline parallelism (SURVEY.md §2.6 — TP over NCCL is
its only strategy). On TPU pods PP is the lever that keeps tensor-parallel
all-reduces on a small ICI neighbourhood as the chip count grows: a
``pp × tp`` layout runs each chip's all-reduces over only ``tp`` peers and
only its stage's layers, roughly halving (pp=2) per-chip ICI volume at
constant per-chip HBM weight traffic — the difference between ~84% and ~91%
projected scaling efficiency for 70B INT8 on v5e-16
(benchmarks/multihost_70b_plan.py).

Execution model (engine/pp_worker.py): each stage is the existing
tensor-parallel model over its own tp-mesh; the continuous-batching engine
partitions running requests into ``pp`` cohorts and keeps one step per
cohort in flight, so stage s computes cohort k while stage s+1 computes
cohort k−1 — classic pipelining, expressed entirely through JAX's async
dispatch (no bubbles in steady state, no collective-permute loop, no
microbatch weight re-reads).

Here: the pure host-side pieces — contiguous layer split, per-stage
parameter pytrees, stage meshes, and per-stage shardings.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import TP_AXIS, make_mesh
from .sharding import param_shardings


def stage_layer_bounds(num_layers: int, pp: int) -> List[tuple]:
    """Contiguous [lo, hi) layer ranges per stage; earlier stages take the
    remainder (stage 0 also embeds, the last stage also runs the LM head,
    so the ends are the naturally heavier hosts for fewer layers)."""
    base, rem = divmod(num_layers, pp)
    bounds = []
    lo = 0
    for s in range(pp):
        hi = lo + base + (1 if s < rem else 0)
        bounds.append((lo, hi))
        lo = hi
    assert lo == num_layers
    return bounds


def split_params(params: Dict[str, Any], pp: int) -> List[Dict[str, Any]]:
    """Split a full parameter pytree (models/llama.py layout: stacked
    ``[L, ...]`` layer arrays + embed/final_norm/lm_head) into ``pp``
    per-stage pytrees.

    - stage 0 carries ``embed`` (token embedding),
    - the last stage carries ``final_norm`` + ``lm_head`` — and ``embed``
      again when embeddings are tied (compute_logits reads ``embed.T``).
    QuantizedTensor leaves are registered pytrees, so ``tree_map`` slices
    qweight and scales along the stacked layer dim together.
    """
    num_layers = params["layers"]["input_norm"].shape[0]
    bounds = stage_layer_bounds(num_layers, pp)
    stages: List[Dict[str, Any]] = []
    for s, (lo, hi) in enumerate(bounds):
        stage: Dict[str, Any] = {
            "layers": jax.tree_util.tree_map(
                lambda x, lo=lo, hi=hi: x[lo:hi], params["layers"]
            )
        }
        if s == 0:
            stage["embed"] = params["embed"]
        if s == pp - 1:
            stage["final_norm"] = params["final_norm"]
            if "lm_head" in params:
                stage["lm_head"] = params["lm_head"]
            elif "embed" not in stage:
                # Tied embeddings: the LM head is embed.T.
                stage["embed"] = params["embed"]
        stages.append(stage)
    return stages


def make_stage_meshes(
    pp: int, tp: int, devices: Optional[Sequence] = None
) -> List[Mesh]:
    """One tp-mesh per pipeline stage over consecutive device groups.

    Consecutive groups keep each stage's all-reduce on an ICI neighbourhood
    and put the (tiny) stage-boundary activation transfer on the single
    link between neighbours.
    """
    devices = list(devices if devices is not None else jax.devices())
    if pp * tp > len(devices):
        raise ValueError(
            f"pipeline_parallel_size {pp} × tensor_parallel_size {tp} "
            f"> device count ({len(devices)})"
        )
    return [
        make_mesh(tp=tp, devices=devices[s * tp : (s + 1) * tp])
        for s in range(pp)
    ]


def stage_param_shardings(mesh: Mesh, stage_params: Dict[str, Any]):
    """TP shardings for one stage's partial pytree (reuses the full-model
    rules from :mod:`sharding`, keyed by which parts the stage holds)."""
    full = param_shardings(mesh, stage_params)
    return {k: full[k] for k in stage_params}


def shard_stage_params(
    stage_params: List[Dict[str, Any]], meshes: List[Mesh]
) -> List[Dict[str, Any]]:
    """Place each stage's parameters onto its stage mesh."""
    out = []
    for params, mesh in zip(stage_params, meshes):
        specs = stage_param_shardings(mesh, params)
        out.append(
            jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, s), params, specs
            )
        )
    return out


def replicated_on(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
