"""Model worker: one jitted step = forward + logits + on-device sampling.

TPU-native ``ModelWorker`` (ref: backends/vllm/src/worker.rs:111-191 +
model_executor.rs ModelThread): where the reference spawns a blocking OS
thread per GPU and samples on rank 0, here a single jitted SPMD function runs
the whole step — cache maintenance, forward over the paged KV, last-token
gather, logits, and batched sampling — returning only the sampled token ids
and logprobs to the host (one small transfer per step, SURVEY.md §7 hard
part #3).

The KV cache is donated into the step function so XLA updates it in place.
Each distinct input bucket shape compiles once and is cached by jit.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CacheConfig, SchedulerConfig
from ..sequence import (
    ExecuteModelRequest,
    SequenceGroupOutput,
    SequenceOutput,
)
from .cache_engine import CacheEngine
from .input_prep import prepare_model_input
from .sampler import PENALTY_WINDOW, SamplingTensors, sample
from ..server import metrics
from ..utils.tracing import instrument, span

logger = logging.getLogger(__name__)


@jax.jit
def _pack_outputs(tokens, logprobs):
    """Fuse the two per-step output arrays into ONE int32 buffer so the host
    pays a single device→host transfer per step (remote-TPU round trips are
    the dominant per-step cost — tools/engine_step_probe.py)."""
    return jnp.concatenate(
        [
            tokens.reshape(-1),
            jax.lax.bitcast_convert_type(
                logprobs.astype(jnp.float32), jnp.int32
            ).reshape(-1),
        ]
    )


class PendingStep:
    """A dispatched-but-unfetched model step.

    Holds device arrays (JAX dispatch is async) plus the metadata needed to
    package outputs. The sampled tokens + logprobs are packed into one int32
    device array whose device→host copy is enqueued immediately
    (``copy_to_host_async``) so the tunnel round-trip overlaps the next
    step's host work; ``complete()`` blocks on the single small transfer and
    builds the per-group outputs. The pipelined engine keeps one of these
    per cohort in flight so pipeline stages overlap across cohorts.
    """

    def __init__(
        self,
        metadata,
        tokens,
        packed,
        top_out,
        t0: float,
        spec_draft=None,
        spec_k=None,
    ):
        self._metadata = metadata
        self._tokens = tokens          # device array, kept for the feed path
        self._shape = tokens.shape
        self._packed = packed          # [2·rows] int32 (tokens ++ logprob bits)
        self._top_out = top_out
        self._t0 = t0
        self._spec_draft = spec_draft  # [S, K] host drafts (-1 pad) | None
        self._spec_k = spec_k          # [S] draft counts | None
        try:
            packed.copy_to_host_async()
            if top_out is not None:
                top_out[0].copy_to_host_async()
                top_out[1].copy_to_host_async()
        except AttributeError:
            pass

    @property
    def tokens_device(self):
        """The sampled-token device array ([S] int32, non-spec layout) —
        the async-scheduling feed for the NEXT dispatched step."""
        return self._tokens

    def complete(self) -> Dict[str, SequenceGroupOutput]:
        with span("worker.fetch"):
            packed_np = np.asarray(self._packed)
            top_np = None
            if self._top_out is not None:
                top_np = (
                    np.asarray(self._top_out[0]),
                    np.asarray(self._top_out[1]),
                )
        n = packed_np.shape[0] // 2
        tokens_np = packed_np[:n].reshape(self._shape)
        logprobs_np = packed_np[n:].view(np.float32).reshape(self._shape)
        spec = self._spec_k is not None  # [S, K+1] layout this step
        top_ids_np = top_lps_np = None
        if top_np is not None:
            top_ids_np, top_lps_np = top_np
            if spec:
                # Verification layout [S, K+1, n]: row 0 is the real
                # last-token distribution.
                top_ids_np = top_ids_np[:, 0]
                top_lps_np = top_lps_np[:, 0]
        elapsed = time.monotonic() - self._t0

        # Package per-group outputs (ref: model_executor.rs:339-354).
        outputs: Dict[str, SequenceGroupOutput] = {}
        i = 0
        for meta in self._metadata:
            seq_outputs: Dict[int, SequenceOutput] = {}
            advance = None
            for seq_id in meta.seq_data:
                top_tokens = None
                if top_ids_np is not None and meta.top_n_tokens > 0:
                    n = min(meta.top_n_tokens, top_ids_np.shape[1])
                    top_tokens = [
                        (int(top_ids_np[i, j]), float(top_lps_np[i, j]))
                        for j in range(n)
                    ]
                extra = None
                if spec:
                    first = int(tokens_np[i, 0])
                    first_lp = float(logprobs_np[i, 0])
                    k_i = int(self._spec_k[i])
                    if k_i:
                        # Greedy acceptance: the model's token at draft
                        # position j must equal the draft; the first
                        # mismatch position contributes the bonus token
                        # (exactly reproduces non-speculative greedy).
                        m = 0
                        while (
                            m < k_i
                            and int(tokens_np[i, m])
                            == int(self._spec_draft[i, m])
                        ):
                            m += 1
                        extra = [
                            (int(tokens_np[i, j]), float(logprobs_np[i, j]))
                            for j in range(1, m + 1)
                        ]
                        metrics.SPEC_PROPOSED.inc(k_i)
                        metrics.SPEC_ACCEPTED.inc(m)
                        advance = 1 + m
                else:
                    first = int(tokens_np[i])
                    first_lp = float(logprobs_np[i])
                seq_outputs[seq_id] = SequenceOutput(
                    parent_seq_id=seq_id,
                    output_token=first,
                    logprob=first_lp,
                    is_new_token=meta.do_sample,
                    top_tokens=top_tokens,
                    extra_tokens=extra or None,
                )
                i += 1
            outputs[meta.request_id] = SequenceGroupOutput(
                outputs=seq_outputs,
                time_to_generate=elapsed,
                num_computed_advance=advance,
            )
        return outputs


class ModelWorker:
    """Executes scheduled batches against the model + paged KV cache."""

    def __init__(
        self,
        model,                  # models.llama.Llama-compatible
        params,
        cache_engine: CacheEngine,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
    ):
        self.model = model
        self.params = params
        self.cache_engine = cache_engine
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.max_pages_per_seq = max(
            1,
            -(-scheduler_config.max_model_len // cache_config.block_size),
        )
        self._step_counter = 0
        # (signature, SamplingTensors, device arrays, zero-steps device
        # array) — steady decode reschedules the same batch every step, so
        # the per-sequence sampling parameters (and their device transfer)
        # are reused until the batch composition changes. Penalty batches
        # never cache (recent_tokens changes every step).
        self._sampling_cache = None
        self._step_fn = jax.jit(
            self._step,
            static_argnames=(
                "T",
                "S",
                "P",
                "decode_only",
                "needs_sampling",
                "needs_penalties",
                "needs_typical",
                "top_n",
                "spec",
                "feed",
            ),
            donate_argnames=("kv_cache", "kv_scales"),
        )

    # ------------------------------------------------------------- jitted step
    def _step(
        self,
        params,
        kv_cache,
        kv_scales,              # None | L × [pages, bs, 128] bf16 scale pages
        packed,                 # [N] int32 — ALL per-step metadata in ONE
                                # host→device transfer (layout below)
        sampling,               # dict of device arrays (cached across steps)
        prev_tokens=None,       # [S_prev] device tokens of the prior step
        spec_rows=None,         # [S, K+1] verify rows (spec steps only)
        *,
        T: int,                 # token-axis bucket
        S: int,                 # sequence-axis bucket
        P: int,                 # block-table width bucket
        decode_only: bool,
        needs_sampling: bool,
        needs_penalties: bool,
        needs_typical: bool,
        top_n: int,
        spec: bool = False,     # static: speculative-verification layout
        feed: bool = False,     # static: async scheduling's device-token feed
    ):
        from ..ops.attention import AttentionMetadata

        # Unpack the fused metadata buffer (static offsets per bucket —
        # XLA fuses the slices away; the point is ONE transfer per step
        # instead of ~10 small ones, each paying per-transfer overhead on
        # remote TPU runtimes).
        off = 0

        def take(n):
            nonlocal off
            part = packed[off : off + n]
            off += n
            return part

        token_ids = take(T)
        positions = take(T)
        slot_mapping = take(T)
        block_tables = take(S * P).reshape(S, P)
        seq_lens = take(S)
        query_start_loc = take(S + 1)
        step = take(S)
        num_seqs = take(1)[0]
        selected_token_indices = spec_rows if spec else take(S)
        prev_map = take(T) if feed else None
        attn_meta = AttentionMetadata(
            slot_mapping=slot_mapping,
            block_tables=block_tables,
            seq_lens=seq_lens,
            query_start_loc=query_start_loc,
            num_seqs=num_seqs,
            block_size=self.cache_config.block_size,
            decode_only=decode_only,
        )
        if feed:
            # Async scheduling (engine step N+1 dispatched before step N's
            # tokens reach the host): rows continuing a sequence sampled last
            # step read their input token straight from the previous step's
            # device-resident output — the host placeholder is never used, so
            # the two dispatches chain without a host round-trip.
            gathered = prev_tokens[
                jnp.clip(prev_map, 0, prev_tokens.shape[0] - 1)
            ]
            token_ids = jnp.where(prev_map >= 0, gathered, token_ids)
        if kv_scales is not None:
            hidden, kv_cache, kv_scales = self.model.forward(
                params, token_ids, positions, kv_cache, attn_meta,
                kv_scales=kv_scales,
            )
        else:
            hidden, kv_cache = self.model.forward(
                params, token_ids, positions, kv_cache, attn_meta
            )
        if spec:
            # Speculative verification: selected_token_indices is [S, K+1]
            # verify rows (engine/spec_decode.py); sample every row with the
            # owning sequence's parameters, return [S, K+1] tokens.
            S, K1 = selected_token_indices.shape
            sel = hidden[selected_token_indices.reshape(-1)]
            rep = lambda x: jnp.repeat(x, K1, axis=0)  # noqa: E731
            sampling = {k: rep(v) for k, v in sampling.items()}
            step = rep(step)
        else:
            # Last-token rows only, before the LM head (ref: llama.rs:474-477).
            sel = hidden[selected_token_indices]
        logits = self.model.compute_logits(params, sel)  # [rows, V] f32
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
        if spec:
            tokens = tokens.reshape(S, K1)
            logprobs = logprobs.reshape(S, K1)
            if top_tokens is not None:
                top_tokens = tuple(
                    t.reshape(S, K1, -1) for t in top_tokens
                )
        return kv_cache, kv_scales, tokens, logprobs, top_tokens

    # ------------------------------------------------------------------ public
    def _cache_execute(self, request: ExecuteModelRequest) -> None:
        self.cache_engine.execute(
            request.blocks_to_swap_in,
            request.blocks_to_swap_out,
            request.blocks_to_copy,
        )

    @instrument("worker.execute_model")
    def execute_model(
        self, request: ExecuteModelRequest
    ) -> Dict[str, SequenceGroupOutput]:
        """One engine step (ref: worker.rs:111-191): swap/copy cache blocks,
        prepare inputs, forward+sample, package outputs per group."""
        pending = self.dispatch(request)
        return pending.complete() if pending is not None else {}

    @instrument("worker.dispatch")
    def dispatch(
        self, request: ExecuteModelRequest, feed=None
    ) -> Optional[PendingStep]:
        """Dispatch one step without fetching results (JAX queues the work
        and returns immediately); ``PendingStep.complete()`` blocks on the
        sampled tokens. Cache-maintenance swaps/copies execute first, in the
        reference's order (worker.rs:111-160).

        ``feed`` — async-scheduling device-token feed: a
        ``(prev_tokens_device, {seq_id: prev_row})`` pair from the still
        in-flight previous step. Decode rows of those sequences read their
        input token from ``prev_tokens_device`` on device instead of the
        host placeholder (see LlmEngine async stepping)."""
        t0 = time.monotonic()
        self._cache_execute(request)
        if not request.sequence_groups_metadata:
            return None

        with span("worker.input_prep"):
            model_input = prepare_model_input(
                request.sequence_groups_metadata,
                block_size=self.cache_config.block_size,
                max_num_batched_tokens=(
                    self.scheduler_config.max_num_batched_tokens
                ),
                max_num_seqs=self.scheduler_config.max_num_sequences,
                max_pages_per_seq=self.max_pages_per_seq,
                sliding_window=self.cache_config.sliding_window,
                num_spec_tokens=getattr(
                    self.scheduler_config, "num_speculative_tokens", 0
                ),
            )
        S = model_input.seq_lens.shape[0]

        import dataclasses as _dc

        with span("worker.sampling_build"):
            # Batch signature: same groups, same seq counts, same flags at
            # the same bucket → identical sampling tensors (parameters are
            # fixed at admission; best_of candidate seeds derive from the
            # group params deterministically).
            sig = (
                S,
                tuple(
                    (
                        meta.request_id,
                        len(meta.seq_data),
                        meta.top_n_tokens,
                        meta.do_sample,
                    )
                    for meta in request.sequence_groups_metadata
                ),
            )
            cached = self._sampling_cache
            if (
                cached is not None
                and cached[0] == sig
                and not cached[1].needs_penalties
            ):
                sampling, sampling_arrays, zero_steps = cached[1:]
                if sampling.needs_sampling:
                    sample_steps = np.zeros(S, dtype=np.int32)
                    i = 0
                    for meta in request.sequence_groups_metadata:
                        for seq_data in meta.seq_data.values():
                            sample_steps[i] = seq_data.get_output_len()
                            i += 1
                else:
                    sample_steps = zero_steps  # greedy: fold value unused
            else:
                params_list = []
                recent = []
                top_n_list = []
                sample_steps = np.zeros(S, dtype=np.int32)
                i = 0
                for meta in request.sequence_groups_metadata:
                    for idx, (seq_id, seq_data) in enumerate(
                        meta.seq_data.items()
                    ):
                        p = meta.next_token_chooser_params
                        if idx > 0:
                            # Distinct sampling streams per best_of candidate.
                            p = _dc.replace(p, seed=p.seed + idx)
                        params_list.append(p)
                        recent.append(
                            seq_data.get_token_ids()[-PENALTY_WINDOW:]
                        )
                        top_n_list.append(meta.top_n_tokens)
                        # PRNG fold value: the sequence's own position, so
                        # sampling replays identically across preemption/swap
                        # reschedules.
                        sample_steps[i] = seq_data.get_output_len()
                        i += 1
                sampling = SamplingTensors.build(
                    params_list, recent, S, top_n_list
                )
                with span("worker.transfers"):
                    sampling_arrays = {
                        "temperature": jnp.asarray(sampling.temperature),
                        "top_k": jnp.asarray(sampling.top_k),
                        "top_p": jnp.asarray(sampling.top_p),
                        "typical_p": jnp.asarray(sampling.typical_p),
                        "do_sample": jnp.asarray(
                            sampling.do_sample & model_input.sample_mask
                        ),
                        "seeds": jnp.asarray(sampling.seeds),
                        "repetition_penalty": jnp.asarray(
                            sampling.repetition_penalty
                        ),
                        "frequency_penalty": jnp.asarray(
                            sampling.frequency_penalty
                        ),
                        "recent_tokens": jnp.asarray(sampling.recent_tokens),
                    }
                self._sampling_cache = (
                    sig,
                    sampling,
                    sampling_arrays,
                    np.zeros(S, dtype=np.int32),
                )

        prev = None
        if feed is not None:
            prev_tokens, rows_by_seq = feed
            qsl = model_input.query_start_loc
            prev_map = np.full(
                model_input.token_ids.shape[0], -1, dtype=np.int32
            )
            n_overrides = 0
            for i, seq_id in enumerate(model_input.seq_ids):
                row = rows_by_seq.get(seq_id)
                # Decode rows only (one input token — the placeholder).
                if row is not None and qsl[i + 1] - qsl[i] == 1:
                    prev_map[qsl[i]] = row
                    n_overrides += 1
            if n_overrides == 0 and model_input.num_prefills > 0:
                # A prefill wave with nothing to override compiles the same
                # program as a no-feed prefill — don't fork a feed=True
                # variant just to apply an empty map.
                prev = None
            else:
                if prev_tokens is None:
                    # Null feed (async engine's program-shape keeper): the
                    # map is all −1 so the values are never read — this
                    # keeps a sync-fallback or post-idle decode step on the
                    # SAME compiled program as steady async decode.
                    prev_tokens = jnp.zeros(
                        (model_input.seq_lens.shape[0],), jnp.int32
                    )
                prev = (prev_tokens, prev_map)

        with span("worker.invoke"):
            tokens, logprobs, top_out = self._invoke(
                model_input, sampling_arrays, sample_steps, sampling,
                prev=prev,
            )
            packed = _pack_outputs(tokens, logprobs)
        self._step_counter += 1
        return PendingStep(
            request.sequence_groups_metadata,
            tokens,
            packed,
            top_out,
            t0,
            spec_draft=model_input.spec_draft,
            spec_k=model_input.spec_k,
        )

    def _invoke(
        self, model_input, sampling_arrays, sample_steps, sampling, prev=None
    ):
        """Run the jitted step; update the cache-engine buffer refs; return
        the (device-array) sampled tokens/logprobs/top-n. Overridden by the
        pipelined worker to chain per-stage programs."""
        spec = model_input.spec_rows is not None
        feed = prev is not None
        T = model_input.token_ids.shape[0]
        S, P = model_input.block_tables.shape
        with span("worker.meta_transfer"):
            parts = [
                model_input.token_ids,
                model_input.positions,
                model_input.slot_mapping,
                model_input.block_tables.ravel(),
                model_input.seq_lens,
                model_input.query_start_loc,
                np.asarray(sample_steps, dtype=np.int32),
                np.asarray([model_input.num_seqs], dtype=np.int32),
            ]
            if not spec:
                parts.append(model_input.selected_token_indices)
            if feed:
                prev_tokens, prev_map = prev
                parts.append(prev_map)
            else:
                prev_tokens = None
            packed = jnp.asarray(np.concatenate(parts))
            spec_rows = jnp.asarray(model_input.spec_rows) if spec else None
        with span("worker.step_call"):
            kv_cache, kv_scales, tokens, logprobs, top_out = self._step_fn(
                self.params,
                self.cache_engine.kv_cache,
                self.cache_engine.kv_scales,
                packed,
                sampling_arrays,
                prev_tokens,
                spec_rows,
                T=T,
                S=S,
                P=P,
                decode_only=(
                    model_input.num_prefills == 0
                    and model_input.spec_rows is None
                ),
                needs_sampling=sampling.needs_sampling,
                needs_penalties=sampling.needs_penalties,
                needs_typical=sampling.needs_typical,
                top_n=sampling.top_n,
                spec=spec,
                feed=feed,
            )
        self.cache_engine.kv_cache = kv_cache
        if kv_scales is not None:
            self.cache_engine.kv_scales = kv_scales
        return tokens, logprobs, top_out
