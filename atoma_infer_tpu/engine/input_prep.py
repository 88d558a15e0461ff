"""Scheduler output → padded device arrays (the worker's input prep).

TPU-native analog of the reference's ``prepare_input_tensors``
(ref: backends/vllm/src/worker.rs:224-460): flattens the batch in
prefill-then-decode order, computes per-token slot mappings
(``block_number·block_size + offset``, pad −1, worker.rs:373-401), padded
block tables, and cumulative ``query_start_loc`` (worker.rs:405-450), plus the
last-token row indices for sampling (``compute_selected_token_indices``,
worker.rs:688-698).

The XLA-specific addition the CUDA reference does not need: every array is
padded to a small set of **bucket shapes** so each engine step hits an
already-compiled executable (SURVEY.md §7 hard part #2). Buckets are powers
of two for the token axis, the sequence axis, and the block-table width.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..ops.attention import AttentionMetadata
from ..ops.kv_cache import PAD_SLOT_ID
from ..sequence import SequenceGroupMetadata


# Diagnostic: how many distinct (T, S, P) bucket shapes — i.e. distinct
# compiled programs — a serving session actually dispatches, and how often.
# Program-shape churn is a first-order cost through remote runtimes
# (per-process executable loads, resident-set thrash).
SHAPE_COUNTS: dict = {}


def _record_shape(T: int, S: int, P: int, kind: str) -> None:
    key = (kind, T, S, P)
    SHAPE_COUNTS[key] = SHAPE_COUNTS.get(key, 0) + 1


def bucket(
    n: int,
    minimum: int = 8,
    maximum: Optional[int] = None,
    dense: bool = False,
) -> int:
    """Round up to the next power of two (≥ minimum), capped at maximum.

    ``dense`` adds 3·2^k rungs (…, 96, 192, 384, …) between the powers of
    two. Used for the PURE-DECODE sequence bucket only: at large decode
    batches the 8B step is MXU-compute-bound, so power-of-two padding
    wastes up to 33% of the step's FLOPs on dead rows (384 seqs padded to
    512 measured 63 ms/step where ~47 ms is the real work). Mixed
    prefill+decode steps keep the sparse ladder — their shape CHURN is the
    dominant cost through remote runtimes (executable loads), not padding."""
    b = minimum
    while b < n:
        b *= 2
    if dense and b > minimum:
        alt = 3 * b // 4
        if alt >= n and alt % 8 == 0:
            b = alt
    if maximum is not None:
        b = min(b, max(maximum, minimum))
    return b


@dataclasses.dataclass
class ModelInput:
    """Host-side batch arrays ready for ``device_put`` (ref: worker.rs
    ``ModelInput``). All shapes are bucketed."""

    token_ids: np.ndarray        # [T] int32
    positions: np.ndarray        # [T] int32
    slot_mapping: np.ndarray     # [T] int32 (PAD_SLOT_ID padding)
    block_tables: np.ndarray     # [S, P] int32
    seq_lens: np.ndarray         # [S] int32 (0 beyond num_seqs)
    query_start_loc: np.ndarray  # [S+1] int32
    num_seqs: np.ndarray         # [] int32
    # Sampling side:
    selected_token_indices: np.ndarray  # [S] int32 — last-token row per seq
    sample_mask: np.ndarray      # [S] bool — do_sample per scheduled seq
    seq_ids: List[int]           # actual seq ids, scheduler order
    request_ids: List[str]       # owning request per scheduled seq
    num_prefills: int
    # Speculative decoding (engine/spec_decode.py) — present only when at
    # least one scheduled sequence carries drafts this step:
    spec_rows: Optional[np.ndarray] = None   # [S, K+1] int32 verify rows
    spec_draft: Optional[np.ndarray] = None  # [S, K] int32 drafts (-1 pad)
    spec_k: Optional[np.ndarray] = None      # [S] int32 draft count (0=off)

    def attention_metadata(self, block_size: int) -> AttentionMetadata:
        import jax.numpy as jnp

        return AttentionMetadata(
            slot_mapping=jnp.asarray(self.slot_mapping),
            block_tables=jnp.asarray(self.block_tables),
            seq_lens=jnp.asarray(self.seq_lens),
            query_start_loc=jnp.asarray(self.query_start_loc),
            num_seqs=jnp.asarray(self.num_seqs),
            block_size=block_size,
            # Static per-bucket flag: pure decode steps take the fused
            # KV-write attention kernel (one query token per sequence).
            # Speculative-verification steps carry (1+k)-token chunks, so
            # they must use the general ragged kernel instead.
            decode_only=self.num_prefills == 0 and self.spec_rows is None,
        )


def _prepare_decode_fast(
    metadata_list: List[SequenceGroupMetadata],
    *,
    block_size: int,
    max_pages_per_seq: int,
    sliding_window: Optional[int] = None,
) -> Optional[ModelInput]:
    """Vectorized pure-decode batch build (one token per sequence, no
    drafts): the per-token Python loops of the general path cost ~1.5 ms at
    256 sequences — every step of a long decode. Numpy-vectorizes the slot
    arithmetic and paddings; falls back to the general path for anything
    else."""
    if sliding_window is not None:
        # Sliding-window slot mapping indexes tables modulo their per-seq
        # length; the general path handles it.
        return None
    seq_ids: List[int] = []
    request_ids: List[str] = []
    datas = []
    tables_list = []
    for meta in metadata_list:
        if meta.is_prompt or meta.spec_token_ids:
            return None
        for seq_id, seq_data in meta.seq_data.items():
            seq_ids.append(seq_id)
            request_ids.append(meta.request_id)
            datas.append(seq_data)
            tables_list.append(meta.block_tables[seq_id])

    num_seqs = len(datas)
    if num_seqs == 0:
        return None
    S = bucket(num_seqs, minimum=8, dense=True)
    T = S  # one token per sequence

    tok = np.zeros(T, dtype=np.int32)
    pos = np.zeros(T, dtype=np.int32)
    sl = np.zeros(S, dtype=np.int32)
    for i, d in enumerate(datas):
        tok[i] = d.get_last_token_id()
        # Decode contract: everything but the newest token is computed
        # (kv_len = computed + 1; prompt-recompute rows arrive as prompt
        # metas and are excluded above).
        sl[i] = d.get_num_computed_tokens() + 1
    pos[:num_seqs] = sl[:num_seqs] - 1

    max_pages = max((len(t) for t in tables_list), default=1)
    P = bucket(max(max_pages, 1), minimum=8, maximum=max_pages_per_seq)
    tables = np.zeros((S, P), dtype=np.int32)
    for i, t in enumerate(tables_list):
        tables[i, : min(len(t), P)] = t[:P]
    _record_shape(T, S, P, "decode")

    idx = np.arange(num_seqs)
    page = tables[idx, pos[:num_seqs] // block_size]
    slots = np.full(T, PAD_SLOT_ID, dtype=np.int32)
    slots[:num_seqs] = page * block_size + pos[:num_seqs] % block_size

    qsl = np.zeros(S + 1, dtype=np.int32)
    qsl[1 : num_seqs + 1] = np.arange(1, num_seqs + 1)
    qsl[num_seqs + 1 :] = num_seqs
    sel = np.zeros(S, dtype=np.int32)
    sel[:num_seqs] = np.arange(num_seqs)
    smask = np.zeros(S, dtype=bool)
    smask[:num_seqs] = True
    return ModelInput(
        token_ids=tok,
        positions=pos,
        slot_mapping=slots,
        block_tables=tables,
        seq_lens=sl,
        query_start_loc=qsl,
        num_seqs=np.asarray(num_seqs, dtype=np.int32),
        selected_token_indices=sel,
        sample_mask=smask,
        seq_ids=seq_ids,
        request_ids=request_ids,
        num_prefills=0,
    )


def prepare_model_input(
    metadata_list: List[SequenceGroupMetadata],
    *,
    block_size: int,
    max_num_batched_tokens: int,
    max_num_seqs: int,
    max_pages_per_seq: int,
    sliding_window: Optional[int] = None,
    num_spec_tokens: int = 0,
) -> ModelInput:
    """Flatten one step's scheduled groups into bucketed batch arrays.

    Layout contract: prefill chunks first, then decode tokens, sequences
    back-to-back (ref: flash_attention.rs:156-174 + scheduler ordering).
    """
    fast = _prepare_decode_fast(
        metadata_list,
        block_size=block_size,
        max_pages_per_seq=max_pages_per_seq,
        sliding_window=sliding_window,
    )
    if fast is not None:
        return fast

    token_ids: List[int] = []
    positions: List[int] = []
    slot_mapping: List[int] = []
    per_seq_tables: List[List[int]] = []
    seq_lens: List[int] = []
    q_lens: List[int] = []
    sample_mask: List[bool] = []
    seq_ids: List[int] = []
    request_ids: List[str] = []
    num_prefills = 0

    spec_lists: List[List[int]] = []

    for meta in metadata_list:
        if meta.is_prompt:
            num_prefills += 1
        for seq_id, seq_data in meta.seq_data.items():
            table = meta.block_tables[seq_id]
            computed = seq_data.get_num_computed_tokens()
            if meta.is_prompt:
                chunk = meta.token_chunk_size
            else:
                chunk = 1
            all_tokens = seq_data.get_token_ids()
            new_tokens = all_tokens[computed : computed + chunk]
            drafts = (
                list(meta.spec_token_ids)
                if (not meta.is_prompt and meta.spec_token_ids)
                else []
            )
            if drafts:
                # Verify chunk: [last_token] + drafted tokens, one ragged
                # chunk (same kernel path as chunked prefill).
                new_tokens = list(new_tokens) + drafts
            spec_lists.append(drafts)
            kv_len = computed + len(new_tokens)

            token_ids.extend(new_tokens)
            positions.extend(range(computed, kv_len))
            # Sliding-window slot reuse happens at the block-manager level
            # (blocks modulo window); the mapping here is linear in the
            # table (ref: worker.rs:373-401). Long prefill runs use the
            # native fill when available.
            if kv_len - computed >= 64:
                from ..native.block_manager import fill_slot_mapping_native

                filled = fill_slot_mapping_native(
                    np.asarray(table, dtype=np.int32),
                    block_size,
                    computed,
                    kv_len,
                )
            else:
                filled = None
            if filled is not None:
                slot_mapping.extend(filled.tolist())
            else:
                for pos in range(computed, kv_len):
                    page = table[(pos // block_size) % max(len(table), 1)]
                    slot_mapping.append(page * block_size + pos % block_size)

            per_seq_tables.append(list(table))
            seq_lens.append(kv_len)
            q_lens.append(len(new_tokens))
            sample_mask.append(meta.do_sample)
            seq_ids.append(seq_id)
            request_ids.append(meta.request_id)

    num_tokens = len(token_ids)
    num_seqs = len(seq_lens)
    T = bucket(max(num_tokens, 1), minimum=8, maximum=None)
    S = bucket(max(num_seqs, 1), minimum=8, maximum=None)
    if any(spec_lists):
        # Speculative verify steps carry up to S·(1+K) tokens — the next
        # power of two over-pads by up to ~60% of pure matmul compute.
        # S·(1+K) is a natural exact bucket (S is already a power of two,
        # so it stays a multiple of 8) and there is one per (S, K) pair,
        # so the compile-cache cost matches the non-speculative buckets.
        t_spec = S * (1 + max(1, num_spec_tokens))
        if num_tokens <= t_spec < T:
            T = t_spec
    # Table-width minimum of 8: a smaller floor makes the decode program
    # recompile mid-serve the moment any context crosses 4 pages (128 tokens
    # at block 32) — a whole-program compile landing in the serving path for
    # a few lanes of padding saved.
    max_pages = max((len(t) for t in per_seq_tables), default=1)
    P = bucket(max(max_pages, 1), minimum=8, maximum=max_pages_per_seq)
    _record_shape(T, S, P, "mixed")

    tok = np.zeros(T, dtype=np.int32)
    tok[:num_tokens] = token_ids
    pos = np.zeros(T, dtype=np.int32)
    pos[:num_tokens] = positions
    slots = np.full(T, PAD_SLOT_ID, dtype=np.int32)
    slots[:num_tokens] = slot_mapping

    tables = np.zeros((S, P), dtype=np.int32)
    for i, t in enumerate(per_seq_tables):
        tables[i, : min(len(t), P)] = t[:P]

    sl = np.zeros(S, dtype=np.int32)
    sl[:num_seqs] = seq_lens
    qsl = np.zeros(S + 1, dtype=np.int32)
    qsl[1 : num_seqs + 1] = np.cumsum(q_lens)
    qsl[num_seqs + 1 :] = qsl[num_seqs]

    # Last-token row per sequence (ref: worker.rs:688-698); padding seqs point
    # at row 0 (their sampled tokens are discarded).
    sel = np.zeros(S, dtype=np.int32)
    sel[:num_seqs] = qsl[1 : num_seqs + 1] - 1
    smask = np.zeros(S, dtype=bool)
    smask[:num_seqs] = sample_mask

    # Speculative verification arrays (only when any seq drafted): rows to
    # sample at per seq — its (1+k) chunk rows, last row replicated to K+1
    # so the gather shape is static per bucket.
    spec_rows = spec_draft = spec_k = None
    if any(spec_lists):
        K = max(1, num_spec_tokens)
        spec_rows = np.zeros((S, K + 1), dtype=np.int32)
        spec_draft = np.full((S, K), -1, dtype=np.int32)
        spec_k = np.zeros(S, dtype=np.int32)
        for i in range(num_seqs):
            start = qsl[i]
            q_len = qsl[i + 1] - start
            j = np.arange(K + 1)
            k_i = min(len(spec_lists[i]), K)
            if k_i:
                # Drafted seq: its (1+k) verify rows, last replicated.
                spec_rows[i] = start + np.minimum(j, q_len - 1)
                spec_draft[i, :k_i] = spec_lists[i][:k_i]
                spec_k[i] = k_i
            else:
                # Undrafted seq sharing the step (plain decode, or a
                # chunked-prefill chunk): sample its LAST row only — row 0
                # of the gather is the token the engine appends.
                spec_rows[i] = start + q_len - 1

    return ModelInput(
        token_ids=tok,
        positions=pos,
        slot_mapping=slots,
        block_tables=tables,
        seq_lens=sl,
        query_start_loc=qsl,
        num_seqs=np.asarray(num_seqs, dtype=np.int32),
        selected_token_indices=sel,
        sample_mask=smask,
        seq_ids=seq_ids,
        request_ids=request_ids,
        num_prefills=num_prefills,
        spec_rows=spec_rows,
        spec_draft=spec_draft,
        spec_k=spec_k,
    )
