"""Pallas KV-cache write (reshape_and_cache) — page read-modify-write.

Replaces the XLA scatter for the per-step cache write
(ref: csrc/kernels/cache_manager.cu:140-185 ``reshape_and_cache_flash``).
XLA's scatter costs ~100x roofline on TPU, and Mosaic DMA cannot address
single cache rows (arbitrary-offset row slices violate sublane tiling), so
the kernel works at PAGE granularity: for every page touched this step, DMA
the page into VMEM, overwrite the written rows from the staged new-KV rows
(VMEM stores may hit arbitrary rows), and DMA the page back.

Write amplification is 2*block_size/rows-written per page - decode pays
~2*bs x on ~4KB rows (tens of us per layer), prefill amortizes to ~2x.

The (page -> token rows) map is computed inside jit from slot_mapping:
dedup pages by sort, rank tokens into their page's slot, scatter token
indices into a [max_pages, block_size] source map (-1 = keep existing row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kv_cache import kv_rows


def _build_page_map(slot_mapping: jnp.ndarray, block_size: int):
    """Returns (page_ids [T], src_idx [T, block_size]): page_ids lists
    distinct written pages (-1 pad); src_idx[w, r] is the token whose row
    lands at (page_ids[w], r), or -1 to keep the existing row."""
    T = slot_mapping.shape[0]
    page = jnp.where(slot_mapping >= 0, slot_mapping // block_size, -1)
    off = jnp.where(slot_mapping >= 0, slot_mapping % block_size, 0)

    order = jnp.argsort(page)               # -1 pads sort first
    sorted_pages = page[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_pages[1:] != sorted_pages[:-1]]
    ) & (sorted_pages >= 0)
    # Rank of each distinct page, in sorted order.
    rank_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1  # [T]
    page_ids = jnp.full((T,), -1, jnp.int32).at[
        jnp.where(first, rank_sorted, T)
    ].set(sorted_pages, mode="drop")

    # Each token's page rank: scatter rank back through the sort order.
    rank_of_token = jnp.zeros((T,), jnp.int32).at[order].set(rank_sorted)
    valid = slot_mapping >= 0
    w = jnp.where(valid, rank_of_token, T)
    src_idx = jnp.full((T, block_size), -1, jnp.int32).at[w, off].set(
        jnp.arange(T, dtype=jnp.int32), mode="drop"
    )
    return page_ids, src_idx


def _kernel(
    # scalar prefetch
    page_ids_ref,   # [W]
    # inputs
    kvn_ref,        # [T, R] VMEM - staged new rows
    src_idx_ref,    # [8, block_size] SMEM — an 8-page window of the
                    # source-row map holding THIS page's row (SMEM is ~1MB
                    # total on v5e, a full [T, bs] map at T=2048 overflows
                    # it; Mosaic block windows need sublane dims % 8)
    cache_in,       # [num_pages, bs, R] HBM (aliased)
    cache_out,
    # scratch
    page_vmem,      # [2, bs, R]
    sems,           # DMA [2]
    *,
    block_size: int,
):
    w = pl.program_id(0)
    page = page_ids_ref[w]
    active = page >= 0
    page_c = jnp.maximum(page, 0)
    buf = w % 2

    SUB = 16  # bf16 sublane tile: dynamic row reads must be 16-aligned

    @pl.when(active)
    def _():
        load = pltpu.make_async_copy(
            cache_out.at[page_c], page_vmem.at[buf], sems.at[buf]
        )
        load.start()
        load.wait()
        for r in range(block_size):
            src = src_idx_ref[w % 8, r]

            @pl.when(src >= 0)
            def _():
                # Mosaic cannot address a single dynamic VMEM row; read an
                # aligned SUB-row window and mask-select the row.
                src_c = jnp.maximum(src, 0)
                base = pl.multiple_of((src_c // SUB) * SUB, SUB)
                window = kvn_ref[pl.ds(base, SUB), :]  # [SUB, R]
                rid = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)
                row = jnp.sum(
                    jnp.where(
                        rid == src_c % SUB,
                        window.astype(jnp.float32),
                        0.0,
                    ),
                    axis=0,
                )
                page_vmem[buf, r, :] = row.astype(page_vmem.dtype)

        store = pltpu.make_async_copy(
            page_vmem.at[buf], cache_out.at[page_c], sems.at[buf]
        )
        store.start()
        store.wait()


def write_kv_cache_pallas(
    kv_cache: jnp.ndarray,  # [num_pages, block_size, R]
    k_new: jnp.ndarray,     # [T, Hk, D]
    v_new: jnp.ndarray,
    slot_mapping: jnp.ndarray,  # [T] int32, -1 padding
    page_map=None,          # optional precomputed (page_ids, src_idx) —
                            # identical across layers, build once per step
) -> jnp.ndarray:
    num_pages, bs, R = kv_cache.shape
    T = k_new.shape[0]
    kvn = kv_rows(k_new, v_new, kv_cache.dtype)
    # FP8 pages ride the kernel as raw bytes (Mosaic has no fp8 vector
    # ops on v5e): bitcast in, bitcast the aliased result back out.
    fp8 = kv_cache.dtype == jnp.float8_e4m3fn
    if fp8:
        kv_cache = jax.lax.bitcast_convert_type(kv_cache, jnp.int8)
        kvn = jax.lax.bitcast_convert_type(kvn, jnp.int8)
    # Pad rows to the sublane tile so aligned window reads stay in bounds.
    pad = (-T) % 16
    if pad:
        kvn = jnp.pad(kvn, ((0, pad), (0, 0)))
    if page_map is None:
        page_map = _build_page_map(slot_mapping, bs)
    page_ids, src_idx = page_map
    page_ids = jnp.clip(page_ids, -1, num_pages - 1)
    # Pad the worklist to the SMEM window height (8); pad entries are
    # inactive (page -1).
    pad_w = (-page_ids.shape[0]) % 8
    if pad_w:
        page_ids = jnp.pad(page_ids, (0, pad_w), constant_values=-1)
        src_idx = jnp.pad(src_idx, ((0, pad_w), (0, 0)), constant_values=-1)
    W = page_ids.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, block_size=bs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(W,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # kvn
                # The row map windowed through SMEM 8 pages at a time.
                pl.BlockSpec(
                    (8, bs),
                    lambda w, *_: (w // 8, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),      # cache
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, bs, R), kv_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
    )(page_ids, kvn, src_idx, kv_cache)
    if fp8:
        out = jax.lax.bitcast_convert_type(out, jnp.float8_e4m3fn)
    return out
