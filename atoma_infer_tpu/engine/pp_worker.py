"""Pipeline-parallel model worker: per-stage jitted programs chained by
async dispatch.

The reference has no pipeline parallelism (SURVEY.md §2.6); this is the
TPU-native extension that keeps tensor-parallel all-reduces on a small ICI
neighbourhood for meshes wider than the all-reduce sweet spot (70B INT8 on
v5e-16: TP-8×PP-2 projects ~91% scaling vs TP-16's ~84% —
benchmarks/multihost_70b_plan.py).

Design (how PP serves without bubbles and without microbatch weight
re-reads):

- Each stage s owns a contiguous layer slice (parallel/pipeline.py), its
  own tp-mesh, its own KV cache engine for those layers, and one jitted
  program: stage 0 = embed + layers, middle = layers, last = layers +
  LM head + sampling. Within a stage the existing TP machinery applies
  unchanged (sharded params, shard_map attention).
- ``dispatch()`` chains the stage programs through ``jax.device_put`` of
  the [T, H] activations onto the next stage's mesh (a few hundred KB —
  one ICI/DCN hop between neighbouring device groups). Everything is
  asynchronously dispatched; nothing blocks until ``PendingStep.complete()``
  fetches the sampled tokens.
- The engine (llm_engine.py) partitions requests into ``pp`` cohorts, one
  scheduler each (sharing one block manager), and keeps one dispatched
  step per cohort in flight. While stage 1 computes cohort A's layers,
  stage 0 is already computing cohort B — the pipeline fills with cohorts
  instead of microbatches, so each stage reads its weights once per step
  it computes (decode stays weight-bandwidth-bound, not re-read-bound).

Correctness note: cohort k+1's stage-s program consumes the cache arrays
produced by cohort k's stage-s program (functional donation chain), so XLA's
data dependencies serialize per-stage work in dispatch order while different
stages run concurrently — exactly the pipeline schedule, no host sync.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import CacheConfig, SchedulerConfig
from ..parallel.pipeline import stage_layer_bounds
from .sampler import sample
from .worker import ModelWorker

logger = logging.getLogger(__name__)


class PipelinedModelWorker(ModelWorker):
    """ModelWorker over ``pp`` pipeline stages (each tensor-parallel)."""

    def __init__(
        self,
        model,                      # full-config model (shared math)
        stage_params: List[Any],    # per-stage param pytrees (sharded)
        cache_engines: List,        # per-stage CacheEngine (layer slices)
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        stage_meshes: List,         # per-stage tp meshes (len == pp)
    ):
        assert len(stage_params) == len(cache_engines) == len(stage_meshes)
        self.pp = len(stage_params)
        self.stage_params = stage_params
        self.cache_engines = cache_engines
        self.stage_meshes = stage_meshes
        # Single-stage plumbing the base class expects: cache_engine is used
        # only by the default _cache_execute/_invoke, both overridden here.
        super().__init__(
            model,
            stage_params[0],
            cache_engines[0],
            scheduler_config,
            cache_config,
        )
        tp = stage_meshes[0].shape.get("tp", 1) if stage_meshes[0] else 1
        self._tp = tp
        # Replicated-input shardings per stage (activations, positions,
        # metadata ride replicated; TP sharding happens inside the stage).
        self._rep = [
            NamedSharding(m, P()) if m is not None else None
            for m in stage_meshes
        ]
        self._stage_fns = [self._make_stage_fn(s) for s in range(self.pp)]

    # ---------------------------------------------------------------- stages
    def _make_stage_fn(self, s: int):
        """Build + jit stage s's program. The stage mesh is a trace-time
        constant (closure), so each stage compiles for its own device set."""
        first = s == 0
        last = s == self.pp - 1
        # Stage's first-layer index in the full model: families with
        # per-layer behavior (gemma2's alternating window) need it.
        lo = stage_layer_bounds(self.model.config.num_layers, self.pp)[s][0]
        mesh = self.stage_meshes[s]
        tp_mesh = mesh if (mesh is not None and self._tp > 1) else None
        model = self.model

        if first and not last:

            def stage_fn(params, kv_cache, kv_scales, token_ids, positions, meta):
                h = model.embed_tokens(params, token_ids)
                out = model.forward_hidden(
                    params, h, positions, kv_cache, meta,
                    kv_scales=kv_scales, mesh=tp_mesh, layer_offset=lo,
                )
                if kv_scales is not None:
                    h, kv_cache, kv_scales = out
                else:
                    h, kv_cache = out
                return kv_cache, kv_scales, h

            return jax.jit(stage_fn, donate_argnames=("kv_cache", "kv_scales"))

        if not first and not last:

            def stage_fn(params, kv_cache, kv_scales, hidden, positions, meta):
                out = model.forward_hidden(
                    params, hidden, positions, kv_cache, meta,
                    kv_scales=kv_scales, mesh=tp_mesh, layer_offset=lo,
                )
                if kv_scales is not None:
                    hidden, kv_cache, kv_scales = out
                else:
                    hidden, kv_cache = out
                return kv_cache, kv_scales, hidden

            return jax.jit(stage_fn, donate_argnames=("kv_cache", "kv_scales"))

        # Last stage: layers + last-token gather + LM head + sampling (the
        # single-stage worker's tail, ref: worker.rs:169-188).
        def last_fn(
            params,
            kv_cache,
            kv_scales,
            x,                      # hidden [T, H] (pp>1) or token ids (pp==1)
            positions,
            meta,
            selected_token_indices,
            sampling,
            step,
            *,
            needs_sampling: bool,
            needs_penalties: bool,
            needs_typical: bool,
            top_n: int,
        ):
            hidden = model.embed_tokens(params, x) if first else x
            out = model.forward_hidden(
                params, hidden, positions, kv_cache, meta,
                kv_scales=kv_scales, mesh=tp_mesh, layer_offset=lo,
            )
            if kv_scales is not None:
                hidden, kv_cache, kv_scales = out
            else:
                hidden, kv_cache = out
            sel = hidden[selected_token_indices]
            logits = model.compute_logits(params, sel)
            tokens, logprobs, top_tokens = sample(
                logits,
                temperature=sampling["temperature"],
                top_k=sampling["top_k"],
                top_p=sampling["top_p"],
                typical_p=sampling["typical_p"],
                do_sample=sampling["do_sample"],
                seeds=sampling["seeds"],
                repetition_penalty=sampling["repetition_penalty"],
                frequency_penalty=sampling["frequency_penalty"],
                recent_tokens=sampling["recent_tokens"],
                step=step,
                needs_sampling=needs_sampling,
                needs_penalties=needs_penalties,
                needs_typical=needs_typical,
                top_n=top_n,
            )
            return kv_cache, kv_scales, tokens, logprobs, top_tokens

        return jax.jit(
            last_fn,
            static_argnames=(
                "needs_sampling", "needs_penalties", "needs_typical", "top_n",
            ),
            donate_argnames=("kv_cache", "kv_scales"),
        )

    # ------------------------------------------------------------- overrides
    def _cache_execute(self, request) -> None:
        """Swaps/copies apply to every stage's layer slice (block ids are
        global across layers, so each stage executes the same mapping)."""
        for ce in self.cache_engines:
            ce.execute(
                request.blocks_to_swap_in,
                request.blocks_to_swap_out,
                request.blocks_to_copy,
            )

    def _put(self, x, s: int):
        """Place a host/replicated array onto stage s (replicated)."""
        if self._rep[s] is not None:
            return jax.device_put(x, self._rep[s])
        return x

    def _invoke(
        self, model_input, sampling_arrays, sample_steps, sampling, prev=None
    ):
        # ``prev`` (async-scheduling device-token feed) is unused: pipelined
        # engines overlap steps across cohorts instead (one in-flight step
        # per cohort), so the single-cohort async path never runs here.
        meta = model_input.attention_metadata(self.cache_config.block_size)
        positions = jnp.asarray(model_input.positions)

        x = jnp.asarray(model_input.token_ids)  # stage 0 input
        for s in range(self.pp):
            ce = self.cache_engines[s]
            meta_s = jax.tree_util.tree_map(lambda a: self._put(a, s), meta)
            pos_s = self._put(positions, s)
            x = self._put(x, s)
            if s < self.pp - 1:
                kv, kvs, x = self._stage_fns[s](
                    self.stage_params[s], ce.kv_cache, ce.kv_scales,
                    x, pos_s, meta_s,
                )
            else:
                sampling_s = {
                    k: self._put(v, s) for k, v in sampling_arrays.items()
                }
                kv, kvs, tokens, logprobs, top_out = self._stage_fns[s](
                    self.stage_params[s], ce.kv_cache, ce.kv_scales,
                    x, pos_s, meta_s,
                    self._put(
                        jnp.asarray(model_input.selected_token_indices), s
                    ),
                    sampling_s,
                    self._put(jnp.asarray(sample_steps), s),
                    needs_sampling=sampling.needs_sampling,
                    needs_penalties=sampling.needs_penalties,
                    needs_typical=sampling.needs_typical,
                    top_n=sampling.top_n,
                )
            ce.kv_cache = kv
            if kvs is not None:
                ce.kv_scales = kvs
        return tokens, logprobs, top_out
