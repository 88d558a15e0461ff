"""Attention backend abstraction: metadata contract + kernel dispatch.

The analog of the reference's ``FlashAttention`` backend struct + metadata
(ref: models/src/flash_attention.rs:11-146,175-196): one metadata bundle
describes the ragged batch (block tables, sequence lengths, cumulative query
offsets, slot mapping), and ``ragged_paged_attention`` dispatches to the
Pallas TPU kernel or the pure-XLA fallback.

Unlike the reference's three-way kernel dispatch (fresh prefill / prefix
prefill / decode, flash_attention.rs:399-464), a single ragged kernel covers
all cases: every query token attends causally to its sequence's paged cache
prefix. Prefill, chunked prefill, prefix-cached prefill, and decode are all
the same computation at different query lengths.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp

from . import reference


@dataclasses.dataclass(frozen=True)
class AttentionMetadata:
    """Ragged-batch descriptor (ref: flash_attention.rs:11-146).

    Shapes (S = padded seq slots, T = padded token count, P = padded pages):
      slot_mapping    [T] int32 — destination KV slot per new token, -1 pad
                      (ref: worker.rs:373-401)
      block_tables    [S, P] int32 — physical pages per sequence
      seq_lens        [S] int32 — kv length incl. this step's tokens; 0 pad
      query_start_loc [S+1] int32 — cumulative query lengths
                      (ref: seq_start_loc/query_start_loc, worker.rs:405-450)
      num_seqs        [] int32 — actual sequence count (≤ S)
      block_size      static int — KV page size in tokens
    """

    slot_mapping: jnp.ndarray
    block_tables: jnp.ndarray
    seq_lens: jnp.ndarray
    query_start_loc: jnp.ndarray
    num_seqs: jnp.ndarray
    block_size: int = dataclasses.field(default=16, metadata=dict(static=True))
    # Static flag: every active sequence contributes exactly one query token
    # (a pure decode step) — enables the fused KV-write attention kernel.
    decode_only: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )


jax.tree_util.register_dataclass(
    AttentionMetadata,
    data_fields=[
        "slot_mapping",
        "block_tables",
        "seq_lens",
        "query_start_loc",
        "num_seqs",
    ],
    meta_fields=["block_size", "decode_only"],
)


def alibi_slopes(num_heads: int) -> jnp.ndarray:
    """Standard ALiBi slope schedule (Press et al.; the values the
    reference's models pass into its kernel via ``alibi_slopes``,
    ref: models/src/flash_attention.rs:175-196). Returns [num_heads] f32."""
    import math

    def pow2(n: int) -> list:
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start ** (i + 1) for i in range(n)]

    if math.log2(num_heads).is_integer():
        vals = pow2(num_heads)
    else:
        m = 2 ** int(math.floor(math.log2(num_heads)))
        vals = pow2(m) + pow2(2 * m)[0::2][: num_heads - m]
    return jnp.asarray(vals, jnp.float32)


# Kernel selection: "pallas" on real TPU, "xla" fallback elsewhere.
_BACKEND = os.environ.get("ATOMA_ATTENTION_BACKEND", "auto")


def _use_pallas() -> bool:
    if _BACKEND == "pallas":
        return True
    if _BACKEND == "xla":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _pallas_supported(q, kv_cache, meta: "AttentionMetadata") -> bool:
    """Mosaic DMA lane/sublane alignment constraints: merged head lanes must
    be 128 multiples and pages 8-row multiples (32 for int8 — its sublane
    tile — so the chunk-merge reshape stays a physical no-op). Tiny test
    models fall back to the XLA path."""
    T, Hq, D = q.shape
    row = kv_cache.shape[2]
    min_bs = 32 if jnp.dtype(kv_cache.dtype).itemsize == 1 else 8
    return (
        (Hq * D) % 128 == 0
        and row % 128 == 0
        and meta.block_size % min_bs == 0
        and T % 8 == 0
        # Mosaic has no fp8 vector ops on v5e, but e4m3 pages ride the
        # int8 byte machinery: bitcast at the kernel boundary + VPU
        # float-arithmetic byte decode (paged_attention._e4m3_decode).
        and kv_cache.dtype
        in (jnp.bfloat16, jnp.float32, jnp.int8, jnp.float8_e4m3fn)
    )


def _fused_supported(q, kv_cache, meta: "AttentionMetadata") -> bool:
    """Fused decode write+attend: pure-decode batch, Pallas-compatible
    shapes, and pages divisible into write-back windows (16 rows bf16,
    32 rows int8)."""
    wb = 32 if jnp.dtype(kv_cache.dtype).itemsize == 1 else 16
    return (
        meta.decode_only
        and _use_pallas()
        and _pallas_supported(q, kv_cache, meta)
        and meta.block_size % wb == 0
    )


def set_attention_backend(name: str) -> None:
    """Force "pallas" | "xla" | "auto" (tests and benchmarking)."""
    global _BACKEND
    assert name in ("pallas", "xla", "auto")
    _BACKEND = name


def ragged_paged_attention(
    q: jnp.ndarray,         # [T, num_q_heads, head_dim]
    kv_cache: jnp.ndarray,  # [num_pages, block_size, 2·Hk·D] (page-major)
    meta: AttentionMetadata,
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    kv_scales: Optional[jnp.ndarray] = None,  # [pages, bs, 128] bf16 pages
    alibi_slopes: Optional[jnp.ndarray] = None,  # [Hq] f32
) -> jnp.ndarray:
    """Unified prefill+decode attention over the paged cache → [T, Hq, D]."""
    if _use_pallas() and _pallas_supported(q, kv_cache, meta):
        from .paged_attention import ragged_paged_attention_pallas

        return ragged_paged_attention_pallas(
            q,
            kv_cache,
            meta,
            scale=scale,
            sliding_window=sliding_window,
            soft_cap=soft_cap,
            kv_scales=kv_scales,
            alibi_slopes=alibi_slopes,
        )
    # XLA fallback: split the page-major rows into logical K/V views (free
    # on CPU; the Pallas path above never materializes this).
    from .kv_cache import kv_cache_view, scales_flat

    D = q.shape[2]
    Hk = kv_cache.shape[2] // (2 * D)
    k_view, v_view = kv_cache_view(kv_cache, Hk, D)
    k_scale = v_scale = None
    if kv_scales is not None:
        k_scale, v_scale = scales_flat(kv_scales)
    return reference.ragged_paged_attention_xla(
        q,
        k_view,
        v_view,
        meta.block_tables,
        meta.seq_lens,
        meta.query_start_loc,
        scale=scale,
        block_size=meta.block_size,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        k_scale=k_scale,
        v_scale=v_scale,
        alibi_slopes=alibi_slopes,
    )


def _meta_specs(meta: AttentionMetadata, spec) -> AttentionMetadata:
    """AttentionMetadata pytree with every array leaf given ``spec``."""
    return AttentionMetadata(
        slot_mapping=spec,
        block_tables=spec,
        seq_lens=spec,
        query_start_loc=spec,
        num_seqs=spec,
        block_size=meta.block_size,
        decode_only=meta.decode_only,
    )


def paged_attention_layer(
    q: jnp.ndarray,         # [T, Hq, D] (rope already applied)
    kv_cache: jnp.ndarray,  # [num_pages, block_size, 2·Hk·D]
    kv_scales,              # None | [num_pages, bs, 128] bf16 scale pages
    k_new: jnp.ndarray,     # [T, Hk, D] (rope already applied)
    v_new: jnp.ndarray,
    meta: AttentionMetadata,
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,  # [Hq] f32
    mesh=None,
    page_map=None,
) -> tuple:
    """One layer's attention block: write this step's K/V into the paged
    cache, then attend over it (ref write-then-attend order:
    flash_attention.rs:360-361). Returns (attn [T, Hq, D], kv_cache,
    kv_scales).

    Tensor parallelism: with a mesh whose ``tp`` axis > 1, the block runs
    under ``shard_map`` — q/k/v sharded over heads, the page-major cache
    sharded over its head-interleaved row dim — so each shard writes and
    attends over its own kv heads with ZERO collectives (the reference's
    analog: per-rank FlashAttention over kv_heads/world_size,
    worker.rs:584-591). The Pallas kernels run per shard. INT8 KV scales
    are computed over ALL heads before sharding so every shard quantizes
    identically to the single-device path.
    """
    from .kv_cache import (
        kv_quant_scales,
        write_kv_cache,
        write_kv_cache_quant,
    )

    tp = 1
    if mesh is not None:
        from ..parallel.mesh import TP_AXIS

        tp = mesh.shape.get(TP_AXIS, 1)

    if tp <= 1:
        if kv_scales is None and _fused_supported(q, kv_cache, meta):
            from .paged_attention import ragged_paged_attention_fused

            attn, kv_cache = ragged_paged_attention_fused(
                q,
                kv_cache,
                k_new,
                v_new,
                meta,
                scale=scale,
                sliding_window=sliding_window,
                soft_cap=soft_cap,
                alibi_slopes=alibi_slopes,
            )
            return attn, kv_cache, None
        if kv_scales is not None:
            if _fused_supported(q, kv_cache, meta):
                from .paged_attention import ragged_paged_attention_fused_quant

                return ragged_paged_attention_fused_quant(
                    q,
                    kv_cache,
                    kv_scales,
                    k_new,
                    v_new,
                    meta,
                    scale=scale,
                    sliding_window=sliding_window,
                    soft_cap=soft_cap,
                    alibi_slopes=alibi_slopes,
                )
            kv_cache, kv_scales = write_kv_cache_quant(
                kv_cache, kv_scales, k_new, v_new, meta.slot_mapping
            )
        else:
            kv_cache = write_kv_cache(
                kv_cache, k_new, v_new, meta.slot_mapping, page_map=page_map
            )
        attn = ragged_paged_attention(
            q,
            kv_cache,
            meta,
            scale=scale,
            sliding_window=sliding_window,
            soft_cap=soft_cap,
            kv_scales=kv_scales,
            alibi_slopes=alibi_slopes,
        )
        return attn, kv_cache, kv_scales

    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import TP_AXIS

    heads = P(None, TP_AXIS, None)   # [T, H, D] sharded over heads
    rows = P(None, None, TP_AXIS)    # cache row dim (head-interleaved K|V)
    rep = P()
    m_spec = _meta_specs(meta, rep)

    # ALiBi slopes shard over q heads like q itself (head h·G+g stays with
    # its kv-head shard); passed positionally only when enabled so the
    # disabled case stays structurally identical to round 1.
    sl_extra = () if alibi_slopes is None else (alibi_slopes,)
    sl_specs = () if alibi_slopes is None else (P(TP_AXIS),)

    if kv_scales is None:

        def inner(q, kv_c, k_new, v_new, meta, *sl):
            slopes = sl[0] if sl else None
            if _fused_supported(q, kv_c, meta):
                from .paged_attention import ragged_paged_attention_fused

                return ragged_paged_attention_fused(
                    q,
                    kv_c,
                    k_new,
                    v_new,
                    meta,
                    scale=scale,
                    sliding_window=sliding_window,
                    soft_cap=soft_cap,
                    alibi_slopes=slopes,
                )
            kv_c = write_kv_cache(kv_c, k_new, v_new, meta.slot_mapping)
            attn = ragged_paged_attention(
                q,
                kv_c,
                meta,
                scale=scale,
                sliding_window=sliding_window,
                soft_cap=soft_cap,
                alibi_slopes=slopes,
            )
            return attn, kv_c

        attn, kv_cache = jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(heads, rows, heads, heads, m_spec) + sl_specs,
            out_specs=(heads, rows),
            check_vma=False,
        )(q, kv_cache, k_new, v_new, meta, *sl_extra)
        return attn, kv_cache, None

    # INT8 KV: absmax over the FULL head dim (auto-partitioned by XLA),
    # then per-shard quantize + write + attend with replicated scales.
    scales_t = kv_quant_scales(k_new, v_new)  # [T, 2]

    def inner_q(q, kv_c, sc_c, k_new, v_new, scales_t, meta, *sl):
        slopes = sl[0] if sl else None
        if _fused_supported(q, kv_c, meta):
            from .paged_attention import ragged_paged_attention_fused_quant

            return ragged_paged_attention_fused_quant(
                q,
                kv_c,
                sc_c,
                k_new,
                v_new,
                meta,
                scale=scale,
                sliding_window=sliding_window,
                soft_cap=soft_cap,
                scales_new=scales_t,
                alibi_slopes=slopes,
            )
        kv_c, sc_c = write_kv_cache_quant(
            kv_c, sc_c, k_new, v_new, meta.slot_mapping, scales=scales_t
        )
        attn = ragged_paged_attention(
            q,
            kv_c,
            meta,
            scale=scale,
            sliding_window=sliding_window,
            soft_cap=soft_cap,
            kv_scales=sc_c,
            alibi_slopes=slopes,
        )
        return attn, kv_c, sc_c

    attn, kv_cache, kv_scales = jax.shard_map(
        inner_q,
        mesh=mesh,
        in_specs=(heads, rows, rep, heads, heads, rep, m_spec) + sl_specs,
        out_specs=(heads, rows, rep),
        check_vma=False,
    )(q, kv_cache, kv_scales, k_new, v_new, scales_t, meta, *sl_extra)
    return attn, kv_cache, kv_scales
