"""Paged KV-cache storage ops: scatter-write, block copy, host swap.

TPU-native replacements for the reference's cache kernels
(ref: csrc/kernels/cache_manager.cu): ``write_kv_cache`` replaces
``reshape_and_cache_flash_kernel`` (:140-185), ``copy_blocks`` replaces
``copy_blocks_kernel`` (:15-37), and host swap uses device gathers instead of
cudaMemcpy H2D/D2H (csrc/src/cache_manager.rs:18-128).

Cache layout (PAGE-major, K/V fused): ``[num_pages, block_size, 2·Hk·D]``
per layer — chosen so that on TPU:
- every kernel DMA moves whole pages via leading-dim indexing (``.at[page]``),
  which Mosaic always allows (arbitrary-offset row slices are not);
- the minor dim 2·Hk·D is a 128 multiple → no tile padding (the "obvious"
  ``[slots, 2, Hk, D]`` layout pads head_dim 64→128, doubling HBM and making
  every kernel-boundary reshape an 80MB copy — measured as the dominant cost
  of a decode step);
- K and V of a token share one row, interleaved per head
  (``[K_h0 | V_h0 | K_h1 | V_h1 | …]``): one DMA per page fetches both, and
  tensor-parallel sharding of the row dim keeps each head's K AND V on the
  same shard.

A flat slot index (``page·block_size + offset``, the reference's slot_mapping
contract, worker.rs:373-401) addresses (row, offset) pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Padding value in slot mappings and copy pairs (ref: worker.rs:13
# ``PAD_SLOT_ID=-1``). Converted to a guaranteed out-of-bounds index before
# scatters so XLA drops the write.
PAD_SLOT_ID = -1
_OOB = jnp.iinfo(jnp.int32).max

# INT8-KV dequant scales are stored as "scale pages": [num_pages, block_size,
# SCALE_LANES] bf16 with the K scale in lane 0, the V scale in lane 1 and the
# rest zero. One full lane tile per row is the SMALLEST layout Mosaic can DMA
# (page slices must be lane-aligned to 128 — a [pages, bs, 2] array cannot
# ride the attention kernel's chunk DMAs; verified on hardware, see
# CLAUDE.md). bf16 halves the padding cost; its 8-bit mantissa (0.2%
# rounding) is negligible against int8's quantization noise, and
# quantization itself uses the bf16-rounded scale so dequant is consistent.
SCALE_LANES = 128
SCALE_DTYPE = jnp.bfloat16


def alloc_kv_scales(num_pages: int, block_size: int) -> jnp.ndarray:
    """Zero-initialized scale pages for an int8 KV cache layer."""
    return jnp.zeros((num_pages, block_size, SCALE_LANES), SCALE_DTYPE)


def scales_flat(kv_scales: jnp.ndarray):
    """Scale pages → (k_scale [slots], v_scale [slots]) f32 views for the
    XLA fallback/oracle paths."""
    num_pages, bs, _ = kv_scales.shape
    flat = kv_scales.reshape(num_pages * bs, SCALE_LANES).astype(jnp.float32)
    return flat[:, 0], flat[:, 1]


def _dropped_pad(indices: jnp.ndarray) -> jnp.ndarray:
    """Map PAD_SLOT_ID to an out-of-bounds index so mode='drop' discards it."""
    return jnp.where(indices < 0, _OOB, indices)


def kv_rows(k_new: jnp.ndarray, v_new: jnp.ndarray, dtype) -> jnp.ndarray:
    """[T, Hk, D] K and V → fused rows [T, 2·Hk·D], head-interleaved
    (``[K_h0 | V_h0 | K_h1 | V_h1 | …]``). FP8 (e4m3fn) rows are clipped
    to ±448 first: XLA's overflow convert yields NaN bytes, which the
    in-kernel byte decoder has no representation for."""
    T, hk, d = k_new.shape
    stacked = jnp.stack([k_new, v_new], axis=2)  # [T, Hk, 2, D]
    if dtype == jnp.float8_e4m3fn:
        stacked = jnp.clip(stacked.astype(jnp.float32), -448.0, 448.0)
    return stacked.reshape(T, 2 * hk * d).astype(dtype)


def kv_cache_view(kv_cache: jnp.ndarray, num_kv_heads: int, head_dim: int):
    """Page-major cache → (k [slots, Hk, D], v [slots, Hk, D]) logical views
    for the XLA fallback path (free on CPU; the Pallas kernels never call
    this)."""
    num_pages, bs, row = kv_cache.shape
    flat = kv_cache.reshape(
        num_pages * bs, num_kv_heads, 2, head_dim
    )
    return flat[:, :, 0], flat[:, :, 1]


def write_kv_cache(
    kv_cache: jnp.ndarray,  # [num_pages, block_size, 2·Hk·D]
    k_new: jnp.ndarray,     # [num_tokens, Hk, D]
    v_new: jnp.ndarray,
    slot_mapping: jnp.ndarray,  # [num_tokens] int32, PAD_SLOT_ID for padding
    page_map=None,          # optional precomputed Pallas page map
) -> jnp.ndarray:
    """Scatter this step's K/V rows into their assigned slots.

    On TPU this dispatches to the Pallas page read-modify-write kernel
    (ops/kv_write.py); elsewhere it is a single XLA scatter over
    (page, offset) indices.
    """
    bs = kv_cache.shape[1]
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        on_tpu = False
    # The Pallas RMW kernel stages ALL new rows in VMEM ([T, R] resident):
    # past ~12MB of staged rows (plus its page scratch) it exceeds Mosaic's
    # 16MB scoped-VMEM limit — an 8192-token chunked-prefill step at 1B row
    # width (1024 lanes bf16) measured 16.12M and failed to compile. Big
    # prefill chunks take the XLA scatter instead: the ~100×-roofline
    # scatter tax matters on the per-step DECODE path, not on a
    # once-per-chunk bulk write of thousands of contiguous rows.
    T = k_new.shape[0]
    row_bytes = kv_cache.shape[2] * jnp.dtype(kv_cache.dtype).itemsize
    if (
        on_tpu
        and kv_cache.shape[2] % 128 == 0
        and T * row_bytes <= 12 * 1024 * 1024
    ):
        from .kv_write import write_kv_cache_pallas

        return write_kv_cache_pallas(
            kv_cache, k_new, v_new, slot_mapping, page_map=page_map
        )
    rows = kv_rows(k_new, v_new, kv_cache.dtype)
    slots = _dropped_pad(slot_mapping)
    return kv_cache.at[slots // bs, slots % bs].set(
        rows, mode="drop", indices_are_sorted=False
    )


def kv_quant_scales(k_new: jnp.ndarray, v_new: jnp.ndarray) -> jnp.ndarray:
    """Per-(token, K/V) symmetric absmax INT8 scales over ALL kv heads
    → [T, 2] f32. Computed over the full (unsharded) heads so
    tensor-parallel shards quantize identically. Rounded through bf16 —
    the stored scale-page precision — so quantization and every dequant
    path (Pallas kernel, XLA fallback, oracle) use the identical scale."""
    kv_new = jnp.stack([k_new, v_new], axis=2).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(kv_new), axis=(1, 3))          # [T, 2]
    s = jnp.maximum(absmax / 127.0, 1e-8)
    return s.astype(SCALE_DTYPE).astype(jnp.float32)


def quantize_kv_rows(
    k_new: jnp.ndarray,   # [T, Hk, D] float
    v_new: jnp.ndarray,
    scale_t: jnp.ndarray,  # [T, 2] f32 per-(token, K/V) scales
) -> jnp.ndarray:
    """Fused int8 rows [T, 2·Hk·D] quantized with an explicit
    reciprocal-multiply. Every write path (XLA scatter, fused Pallas
    kernel staging) MUST use this one function: ``x / s`` vs
    ``x * (1/s)`` differ by 1 ulp, which flips ``round`` at .5
    boundaries — enough to make two paths' caches diverge by ±1 LSB."""
    rows_f = kv_rows(k_new, v_new, jnp.float32)            # [T, 2·Hk·D]
    D = k_new.shape[2]
    lane = jnp.arange(rows_f.shape[1], dtype=jnp.int32)
    is_k = (lane // D) % 2 == 0                            # [K_h | V_h]
    inv = 1.0 / scale_t                                    # [T, 2]
    inv_row = jnp.where(is_k[None, :], inv[:, 0:1], inv[:, 1:2])
    return jnp.clip(jnp.round(rows_f * inv_row), -127, 127).astype(jnp.int8)


def write_kv_cache_quant(
    kv_cache: jnp.ndarray,   # [num_pages, block_size, 2·Hk·D] int8
    kv_scales: jnp.ndarray,  # [num_pages, block_size, SCALE_LANES] bf16
    k_new: jnp.ndarray,      # [T, Hk, D] float
    v_new: jnp.ndarray,
    slot_mapping: jnp.ndarray,
    scales: jnp.ndarray = None,  # [T, 2] precomputed (TP path)
):
    """INT8 KV write: per-(token, K/V) symmetric absmax quantization
    (BASELINE config #3 — the reference has no KV quantization)."""
    bs = kv_cache.shape[1]
    scale = kv_quant_scales(k_new, v_new) if scales is None else scales
    rows = quantize_kv_rows(k_new, v_new, scale)
    slots = _dropped_pad(slot_mapping)
    kv_cache = kv_cache.at[slots // bs, slots % bs].set(rows, mode="drop")
    sc_rows = jnp.pad(
        scale.astype(kv_scales.dtype), ((0, 0), (0, SCALE_LANES - 2))
    )
    kv_scales = kv_scales.at[slots // bs, slots % bs].set(
        sc_rows, mode="drop"
    )
    return kv_cache, kv_scales


def copy_blocks(
    kv_cache: jnp.ndarray,  # [num_layers, num_pages, block_size, row]
    copy_pairs: jnp.ndarray,  # [max_pairs, 2] int32 (src, dst), -1 pad
) -> jnp.ndarray:
    """Copy-on-write page duplication across all layers
    (ref: cache_manager.cu:15-37 grid=(layers, pairs))."""
    src = jnp.maximum(copy_pairs[:, 0], 0)
    dst = _dropped_pad(copy_pairs[:, 1])
    return kv_cache.at[:, dst].set(kv_cache[:, src], mode="drop")


def gather_blocks(cache: jnp.ndarray, block_ids) -> jnp.ndarray:
    """Pull whole pages off the device (host-swap-out read side):
    [L, pages, ...] → [L, len(ids), ...]."""
    return cache[:, jnp.asarray(block_ids, dtype=jnp.int32)]


def scatter_blocks(cache: jnp.ndarray, block_ids, data: jnp.ndarray):
    """Write whole pages into the device cache (host-swap-in write side)."""
    ids = jnp.asarray(block_ids, dtype=jnp.int32)
    return cache.at[:, ids].set(data.astype(cache.dtype))


def copy_blocks_layer(cache: jnp.ndarray, copy_pairs: jnp.ndarray):
    """Single-layer CoW page duplication ([pages, bs, row])."""
    src = jnp.maximum(copy_pairs[:, 0], 0)
    dst = _dropped_pad(copy_pairs[:, 1])
    return cache.at[dst].set(cache[src], mode="drop")


def gather_blocks_layer(cache: jnp.ndarray, block_ids) -> jnp.ndarray:
    return cache[jnp.asarray(block_ids, dtype=jnp.int32)]


def scatter_blocks_layer(cache: jnp.ndarray, block_ids, data: jnp.ndarray):
    ids = jnp.asarray(block_ids, dtype=jnp.int32)
    return cache.at[ids].set(data.astype(cache.dtype))


# Jitted entry points (donated caches → in-place updates on TPU).
copy_blocks_jit = jax.jit(copy_blocks, donate_argnums=(0,))
scatter_blocks_jit = jax.jit(scatter_blocks, donate_argnums=(0,))
gather_blocks_jit = jax.jit(gather_blocks)
copy_blocks_layer_jit = jax.jit(copy_blocks_layer, donate_argnums=(0,))
scatter_blocks_layer_jit = jax.jit(scatter_blocks_layer, donate_argnums=(0,))
gather_blocks_layer_jit = jax.jit(gather_blocks_layer)
