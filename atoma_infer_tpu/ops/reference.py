"""Pure-JAX (XLA) ragged paged attention — the numerics oracle.

Functionally equivalent to the reference's attention stack
(ref: models/src/flash_attention.rs:322-464 — prefill ``flash_attn_varlen``
+ decode ``flash_attn_kv_cache`` over block tables), expressed as one unified
masked-attention formulation over the paged cache. New K/V must already be
written to the cache (see ops/kv_cache.write_kv_cache) before calling —
mirroring the reference's reshape_and_cache-then-attend order
(flash_attention.rs:360-361).

Batch layout contract (ref: flash_attention.rs:156-174): the token axis packs
sequences back-to-back — prefill chunks first, then decode tokens — delimited
by ``query_start_loc`` (cu_seqlens_q analog). Each query token attends
causally to its sequence's cache prefix.

Fully jittable with static shapes; used as the CPU fallback and as the test
oracle for the Pallas kernels. Materializes the gathered KV
(O(T · pages · block_size)), so the Pallas path is the production one.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def ragged_paged_attention_xla(
    q: jnp.ndarray,             # [T, num_q_heads, head_dim]
    k_cache: jnp.ndarray,       # [num_slots, num_kv_heads, head_dim]
    v_cache: jnp.ndarray,       # [num_slots, num_kv_heads, head_dim]
    block_tables: jnp.ndarray,  # [S, max_pages] int32 (garbage ok beyond len)
    seq_lens: jnp.ndarray,      # [S] int32 — kv length incl. this step's tokens
    query_start_loc: jnp.ndarray,  # [S+1] int32 cumulative query lengths
    *,
    scale: float,
    block_size: int,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,  # [num_slots] per-slot dequant scales
    v_scale: Optional[jnp.ndarray] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,  # [Hq] f32 per-q-head slopes
) -> jnp.ndarray:
    """Masked paged attention over the whole ragged batch. Returns [T, Hq, D]."""
    num_tokens, num_q_heads, head_dim = q.shape
    num_seqs = seq_lens.shape[0]
    max_pages = block_tables.shape[1]
    num_kv_heads = k_cache.shape[1]
    group = num_q_heads // num_kv_heads
    ctx = max_pages * block_size

    token_ids = jnp.arange(num_tokens, dtype=jnp.int32)
    # Which sequence owns each token: q_start[s] <= i < q_start[s+1].
    token_seq = (
        jnp.searchsorted(query_start_loc, token_ids, side="right") - 1
    )
    token_seq = jnp.clip(token_seq, 0, num_seqs - 1)
    q_lens = query_start_loc[1:] - query_start_loc[:-1]  # [S]
    q_offset = token_ids - query_start_loc[token_seq]
    # Absolute position of each query token within its sequence.
    abs_pos = seq_lens[token_seq] - q_lens[token_seq] + q_offset

    # Gather each token's sequence KV rows: [T, ctx].
    offsets = jnp.arange(block_size, dtype=jnp.int32)
    seq_rows = (
        block_tables[:, :, None] * block_size + offsets[None, None, :]
    ).reshape(num_seqs, ctx)
    tok_rows = seq_rows[token_seq]                      # [T, ctx]
    k = k_cache[tok_rows]                               # [T, ctx, Hk, D]
    v = v_cache[tok_rows]
    if k_scale is not None:
        k = k.astype(jnp.float32) * k_scale[tok_rows][..., None, None]
    if v_scale is not None:
        v = v.astype(jnp.float32) * v_scale[tok_rows][..., None, None]

    qf = q.astype(jnp.float32).reshape(num_tokens, num_kv_heads, group, head_dim)
    scores = jnp.einsum(
        "tkgd,tjkd->tkgj", qf, k.astype(jnp.float32)
    ) * scale                                           # [T, Hk, G, ctx]

    if soft_cap is not None:
        scores = soft_cap * jnp.tanh(scores / soft_cap)

    kv_pos = jnp.arange(ctx, dtype=jnp.int32)
    if alibi_slopes is not None:
        # ALiBi (ref: csrc/kernels/alibi.h; flash_attention.rs:175-196):
        # score += slope_h · (kv_pos − q_pos); ≤ 0 under the causal mask.
        dist = (kv_pos[None, :] - abs_pos[:, None]).astype(jnp.float32)
        sl = alibi_slopes.astype(jnp.float32).reshape(num_kv_heads, group)
        scores = scores + sl[None, :, :, None] * dist[:, None, None, :]
    causal = kv_pos[None, :] <= abs_pos[:, None]        # [T, ctx]
    valid = kv_pos[None, :] < seq_lens[token_seq][:, None]
    mask = causal & valid
    if sliding_window is not None:
        mask &= kv_pos[None, :] > abs_pos[:, None] - sliding_window
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)

    probs = jnp.exp(
        scores - jnp.max(scores, axis=-1, keepdims=True)
    )
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum("tkgj,tjkd->tkgd", probs, v.astype(jnp.float32))
    return out.reshape(num_tokens, num_q_heads, head_dim).astype(q.dtype)


def ragged_paged_attention_xla_partial(
    q: jnp.ndarray,             # [T, num_q_heads, head_dim]
    k_cache: jnp.ndarray,       # [num_slots, num_kv_heads, head_dim]
    v_cache: jnp.ndarray,
    block_tables: jnp.ndarray,  # [S, max_pages] int32 (LOCAL page ids)
    seq_lens: jnp.ndarray,      # [S] int32
    query_start_loc: jnp.ndarray,  # [S+1] int32
    *,
    scale: float,
    block_size: int,
    page_valid: Optional[jnp.ndarray] = None,  # [S, max_pages] bool — pages
                                               # this shard owns; others are
                                               # masked out of the softmax
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,
) -> tuple:
    """PARTIAL paged attention for split-KV / context-parallel decode: the
    flash-attention accumulator triple over this shard's pages only.

    Returns ``(num [T,Hq,D] f32, m [T,Hq] f32, l [T,Hq] f32)`` where
    ``num = Σ exp(score − m)·v``, ``m`` the local score max, ``l`` the local
    exp-sum — combinable across shards by the standard LSE rule
    (parallel/context_parallel.py). The analog of the reference's split-KV
    partial accumulators + ``combine_attn_seqk_parallel``
    (ref: csrc/kernels/flash_fwd_kernel.h, csrc/src/lib.rs:2122-2199).

    A token whose pages all live elsewhere yields ``m = −1e30, l·c → 0``
    under the combine — finite, no NaN (every decode token owns at least
    its just-written slot somewhere, so the global sum is never empty).
    """
    num_tokens, num_q_heads, head_dim = q.shape
    num_seqs = seq_lens.shape[0]
    max_pages = block_tables.shape[1]
    num_kv_heads = k_cache.shape[1]
    group = num_q_heads // num_kv_heads
    ctx = max_pages * block_size

    token_ids = jnp.arange(num_tokens, dtype=jnp.int32)
    token_seq = (
        jnp.searchsorted(query_start_loc, token_ids, side="right") - 1
    )
    token_seq = jnp.clip(token_seq, 0, num_seqs - 1)
    q_lens = query_start_loc[1:] - query_start_loc[:-1]
    q_offset = token_ids - query_start_loc[token_seq]
    abs_pos = seq_lens[token_seq] - q_lens[token_seq] + q_offset

    offsets = jnp.arange(block_size, dtype=jnp.int32)
    seq_rows = (
        block_tables[:, :, None] * block_size + offsets[None, None, :]
    ).reshape(num_seqs, ctx)
    tok_rows = seq_rows[token_seq]
    k = k_cache[tok_rows]
    v = v_cache[tok_rows]
    if k_scale is not None:
        k = k.astype(jnp.float32) * k_scale[tok_rows][..., None, None]
    if v_scale is not None:
        v = v.astype(jnp.float32) * v_scale[tok_rows][..., None, None]

    qf = q.astype(jnp.float32).reshape(num_tokens, num_kv_heads, group, head_dim)
    scores = jnp.einsum(
        "tkgd,tjkd->tkgj", qf, k.astype(jnp.float32)
    ) * scale

    if soft_cap is not None:
        scores = soft_cap * jnp.tanh(scores / soft_cap)

    kv_pos = jnp.arange(ctx, dtype=jnp.int32)
    if alibi_slopes is not None:
        dist = (kv_pos[None, :] - abs_pos[:, None]).astype(jnp.float32)
        sl = alibi_slopes.astype(jnp.float32).reshape(num_kv_heads, group)
        scores = scores + sl[None, :, :, None] * dist[:, None, None, :]
    causal = kv_pos[None, :] <= abs_pos[:, None]
    valid = kv_pos[None, :] < seq_lens[token_seq][:, None]
    mask = causal & valid
    if sliding_window is not None:
        mask &= kv_pos[None, :] > abs_pos[:, None] - sliding_window
    if page_valid is not None:
        pv = jnp.repeat(page_valid[token_seq], block_size, axis=1)  # [T, ctx]
        mask &= pv
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)

    m = jnp.max(scores, axis=-1)                        # [T, Hk, G]
    probs = jnp.exp(scores - m[..., None])
    # Fully-masked rows: m = −1e30 makes every prob exp(0)=1; zero them so
    # num/l are exact zeros and the cross-shard combine is a no-op for them.
    live = m > -1e29
    probs = probs * live[..., None]
    l = jnp.sum(probs, axis=-1)                         # [T, Hk, G]
    num = jnp.einsum("tkgj,tjkd->tkgd", probs, v.astype(jnp.float32))
    return (
        num.reshape(num_tokens, num_q_heads, head_dim),
        m.reshape(num_tokens, num_q_heads),
        l.reshape(num_tokens, num_q_heads),
    )


def naive_full_attention(
    q: jnp.ndarray,  # [T, Hq, D] — one sequence, fully causal
    k: jnp.ndarray,  # [T, Hk, D]
    v: jnp.ndarray,
    *,
    scale: float,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Textbook causal attention on a single contiguous sequence — the oracle's
    oracle (analog of the reference's ``fa_acausal`` test oracle,
    csrc/tests/flash_attn_tests.rs:19-95)."""
    t, hq, d = q.shape
    hk = k.shape[1]
    g = hq // hk
    qf = q.astype(jnp.float32).reshape(t, hk, g, d)
    scores = jnp.einsum("tkgd,jkd->tkgj", qf, k.astype(jnp.float32)) * scale
    pos = jnp.arange(t)
    mask = pos[None, :] <= pos[:, None]
    if sliding_window is not None:
        mask &= pos[None, :] > pos[:, None] - sliding_window
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    probs = jnp.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    out = jnp.einsum("tkgj,jkd->tkgd", probs, v.astype(jnp.float32))
    return out.reshape(t, hq, d).astype(q.dtype)
