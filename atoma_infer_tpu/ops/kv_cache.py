"""Paged KV-cache storage ops: scatter-write, block copy, host swap.

TPU-native replacements for the reference's cache kernels
(ref: csrc/kernels/cache_manager.cu): ``write_kv_cache`` replaces
``reshape_and_cache_flash_kernel`` (:140-185), ``copy_blocks`` replaces
``copy_blocks_kernel`` (:15-37), and host swap uses ``jax.device_put`` of
block slices instead of cudaMemcpy H2D/D2H (csrc/src/cache_manager.rs:18-128).

Cache layout (slot-major, K/V fused): ``[num_blocks * block_size, 2, Hk, D]``
per layer — page ``p`` occupies rows ``[p·block_size, (p+1)·block_size)``;
index 0/1 of axis 1 selects K/V. Fusing K and V into one array halves the
number of DMA descriptors the paged-attention kernel issues per page (the
kernel's bottleneck at small pages) and makes the cache write a single XLA
scatter. A flat slot index (``block_number·block_size + offset``, the
reference's slot_mapping contract, worker.rs:373-401) addresses a row
directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Padding value in slot mappings and copy pairs (ref: worker.rs:13
# ``PAD_SLOT_ID=-1``). Converted to a guaranteed out-of-bounds index before
# scatters so XLA drops the write.
PAD_SLOT_ID = -1
_OOB = jnp.iinfo(jnp.int32).max


def _dropped_pad(indices: jnp.ndarray) -> jnp.ndarray:
    """Map PAD_SLOT_ID to an out-of-bounds index so mode='drop' discards it."""
    return jnp.where(indices < 0, _OOB, indices)


def write_kv_cache(
    kv_cache: jnp.ndarray,  # [num_slots, 2, num_kv_heads, head_dim]
    k_new: jnp.ndarray,     # [num_tokens, num_kv_heads, head_dim]
    v_new: jnp.ndarray,
    slot_mapping: jnp.ndarray,  # [num_tokens] int32, PAD_SLOT_ID for padding
) -> jnp.ndarray:
    """Scatter this step's K/V rows into their assigned slots.

    On TPU this dispatches to the Pallas per-row DMA kernel (ops/kv_write.py)
    — XLA's scatter lowering costs ~100× roofline there; elsewhere it is a
    single XLA scatter.
    """
    row_lanes = 2 * kv_cache.shape[2] * kv_cache.shape[3]
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        on_tpu = False
    if on_tpu and row_lanes % 128 == 0:
        from .kv_write import write_kv_cache_pallas

        return write_kv_cache_pallas(kv_cache, k_new, v_new, slot_mapping)
    slots = _dropped_pad(slot_mapping)
    kv_new = jnp.stack([k_new, v_new], axis=1).astype(kv_cache.dtype)
    return kv_cache.at[slots].set(kv_new, mode="drop", indices_are_sorted=False)


def copy_blocks(
    kv_cache: jnp.ndarray,  # [num_layers, num_slots, 2, Hk, D]
    copy_pairs: jnp.ndarray,  # [max_pairs, 2] int32 (src_block, dst_block), -1 pad
    block_size: int,
) -> jnp.ndarray:
    """Copy-on-write block duplication across all layers on device.

    Gathers source block rows and scatters them to destination rows in one
    fused op (ref: cache_manager.cu:15-37 grid=(layers, pairs)).
    """
    offsets = jnp.arange(block_size, dtype=jnp.int32)
    src_rows = (copy_pairs[:, 0:1] * block_size + offsets[None, :]).reshape(-1)
    dst_rows = (copy_pairs[:, 1:2] * block_size + offsets[None, :]).reshape(-1)
    # Source gather: clamp pad rows to 0 (their scatter is dropped anyway).
    src_rows = jnp.maximum(src_rows, 0)
    dst_rows = _dropped_pad(
        jnp.where(copy_pairs[:, 1:2].repeat(block_size, 1).reshape(-1) < 0,
                  -1, dst_rows)
    )
    return kv_cache.at[:, dst_rows].set(kv_cache[:, src_rows], mode="drop")


def gather_blocks(cache: jnp.ndarray, block_ids, block_size: int) -> jnp.ndarray:
    """Pull whole blocks off the device (host-swap-out read side).

    ``cache``: [num_layers, num_slots, ...]; returns
    [num_layers, len(block_ids)·block_size, ...].
    """
    block_ids = jnp.asarray(block_ids, dtype=jnp.int32)
    offsets = jnp.arange(block_size, dtype=jnp.int32)
    rows = (block_ids[:, None] * block_size + offsets[None, :]).reshape(-1)
    return cache[:, rows]


def scatter_blocks(
    cache: jnp.ndarray, block_ids, data: jnp.ndarray, block_size: int
) -> jnp.ndarray:
    """Write whole blocks into the device cache (host-swap-in write side)."""
    block_ids = jnp.asarray(block_ids, dtype=jnp.int32)
    offsets = jnp.arange(block_size, dtype=jnp.int32)
    rows = (block_ids[:, None] * block_size + offsets[None, :]).reshape(-1)
    return cache.at[:, rows].set(data.astype(cache.dtype))


# Jitted entry points (donated caches → in-place updates on TPU).
copy_blocks_jit = jax.jit(
    copy_blocks, static_argnames=("block_size",), donate_argnums=(0,)
)
scatter_blocks_jit = jax.jit(
    scatter_blocks, static_argnames=("block_size",), donate_argnums=(0,)
)
gather_blocks_jit = jax.jit(gather_blocks, static_argnames=("block_size",))


def write_kv_cache_quant(
    kv_cache: jnp.ndarray,   # [num_slots, 2, Hk, D] int8
    kv_scales: jnp.ndarray,  # [num_slots, 2] f32
    k_new: jnp.ndarray,      # [T, Hk, D] float
    v_new: jnp.ndarray,
    slot_mapping: jnp.ndarray,
):
    """INT8 KV write: per-(token, K/V) symmetric absmax quantization
    (BASELINE config #3 — the reference has no KV quantization)."""
    kv_new = jnp.stack([k_new, v_new], axis=1).astype(jnp.float32)  # [T,2,H,D]
    absmax = jnp.max(jnp.abs(kv_new), axis=(2, 3))                  # [T,2]
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(
        jnp.round(kv_new / scale[:, :, None, None]), -127, 127
    ).astype(jnp.int8)
    slots = _dropped_pad(slot_mapping)
    kv_cache = kv_cache.at[slots].set(q, mode="drop")
    kv_scales = kv_scales.at[slots].set(scale.astype(kv_scales.dtype), mode="drop")
    return kv_cache, kv_scales
