"""Context-parallel (split-KV) decode attention with LSE combine.

The reference parallelizes long-context decode by splitting the KV axis
across SMs with an occupancy heuristic and recombining partial softmax
accumulators (ref: csrc/src/lib.rs:2122-2199 ``num_splits_heuristic``,
csrc/kernels/flash_fwd_kernel.h ``compute_attn_1rowblock_splitkv`` +
``combine_attn_seqk_parallel``). On a v5e chip that split buys nothing —
there is ONE TensorCore, the kernel grid is sequential, and the sequential
chunk pipeline already reads KV at 616 GB/s @32k context (tools/attn_bench).

The TPU-native analog is therefore ACROSS chips: shard the page-major KV
cache over the mesh axis by page index, let every chip run the attention
over its local pages only, and combine the per-chip flash accumulators
``(num, m, l)`` with the standard log-sum-exp rule via ``pmax``/``psum``
over ICI. Decode latency for one long sequence then scales with chip count
— the same property the reference's split-KV buys within one GPU — and,
unlike KV-head sharding, it needs no head replication when the mesh is
wider than the kv-head count (models/llama.py kv_repeat's ×repeat memory
cost disappears; q is replicated instead, a few hundred KB at decode).

Sharding contract:
  - kv_cache [P, bs, row] sharded P(axis) over its PAGE dim — shard s owns
    the contiguous page range [s·P/n, (s+1)·P/n);
  - q / k_new / v_new / metadata replicated (block tables carry GLOBAL
    page ids; each shard masks to the pages it owns);
  - output replicated (every shard ends with the full combined result).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.attention import AttentionMetadata, _meta_specs
from ..ops.kv_cache import kv_cache_view, write_kv_cache
from ..ops.reference import ragged_paged_attention_xla_partial
from .mesh import TP_AXIS


def combine_partials(num, m, l, axis: str):
    """LSE-combine flash accumulators across a mesh axis.

    ``out = Σ_s exp(m_s − m*)·num_s / Σ_s exp(m_s − m*)·l_s`` with
    ``m* = max_s m_s`` (ref: combine_attn_seqk_parallel's rescale-and-sum).
    """
    m_g = jax.lax.pmax(m, axis)                       # [T, Hq]
    c = jnp.exp(m - m_g)                              # dead shards → 0
    num_g = jax.lax.psum(num * c[..., None], axis)
    l_g = jax.lax.psum(l * c, axis)
    return num_g / jnp.maximum(l_g, 1e-30)[..., None]


def cp_decode_attention_layer(
    q: jnp.ndarray,         # [T, Hq, D] (rope applied) — replicated
    kv_cache: jnp.ndarray,  # [P, bs, 2·Hk·D] — page dim sharded over axis
    k_new: jnp.ndarray,     # [T, Hk, D] — replicated
    v_new: jnp.ndarray,
    meta: AttentionMetadata,  # replicated; block tables hold GLOBAL pages
    mesh,
    *,
    scale: float,
    axis: str = TP_AXIS,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,
):
    """One layer's write+attend with the KV pages sharded over ``axis``.

    Each shard scatters the slots it owns (others pad to −1 and drop),
    computes partial attention over its local pages, and the partials are
    LSE-combined over ICI. Returns ``(attn [T,Hq,D] replicated, kv_cache
    page-sharded)``.
    """
    n = mesh.shape[axis]
    num_pages = kv_cache.shape[0]
    assert num_pages % n == 0, (num_pages, n)
    pages_local = num_pages // n
    bs = meta.block_size
    D = q.shape[2]
    Hk = kv_cache.shape[2] // (2 * D)

    def inner(q, kv_c, k_new, v_new, meta):
        s = jax.lax.axis_index(axis)
        lo = s * pages_local

        # Write only the slots whose page this shard owns.
        slot = meta.slot_mapping
        page = slot // bs                       # −1 pads stay negative
        owned = (slot >= 0) & (page >= lo) & (page < lo + pages_local)
        local_slot = jnp.where(owned, slot - lo * bs, -1)
        kv_c = write_kv_cache(kv_c, k_new, v_new, local_slot)

        # Attend over local pages; global table ids → local, rest masked.
        bt = meta.block_tables
        mine = (bt >= lo) & (bt < lo + pages_local)
        local_bt = jnp.where(mine, bt - lo, 0)
        k_view, v_view = kv_cache_view(kv_c, Hk, D)
        num, m, l = ragged_paged_attention_xla_partial(
            q,
            k_view,
            v_view,
            local_bt,
            meta.seq_lens,
            meta.query_start_loc,
            scale=scale,
            block_size=bs,
            page_valid=mine,
            sliding_window=sliding_window,
            soft_cap=soft_cap,
            alibi_slopes=alibi_slopes,
        )
        out = combine_partials(num, m, l, axis).astype(q.dtype)
        return out, kv_c

    rep = P()
    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(rep, P(axis), rep, rep, _meta_specs(meta, rep)),
        out_specs=(rep, P(axis)),
        check_vma=False,
    )(q, kv_cache, k_new, v_new, meta)
