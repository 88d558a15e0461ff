"""Paged KV-cache storage ops: scatter-write, block copy, host swap.

TPU-native replacements for the reference's cache kernels
(ref: csrc/kernels/cache_manager.cu): ``write_kv_cache`` replaces
``reshape_and_cache_flash_kernel`` (:140-185), ``copy_blocks`` replaces
``copy_blocks_kernel`` (:15-37), and host swap uses ``jax.device_put`` of
block slices instead of cudaMemcpy H2D/D2H (csrc/src/cache_manager.rs:18-128).

Cache layout (slot-major): ``[num_blocks * block_size, num_kv_heads, head_dim]``
per layer — page ``p`` occupies rows ``[p·block_size, (p+1)·block_size)``.
A flat slot index (``block_number·block_size + offset``, the reference's
slot_mapping contract, worker.rs:373-401) addresses a row directly, making the
cache write a single XLA scatter that fuses with the surrounding ops.
"""

from __future__ import annotations

from typing import Tuple

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
    k_cache: jnp.ndarray,  # [num_slots, num_kv_heads, head_dim]
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,    # [num_tokens, num_kv_heads, head_dim]
    v_new: jnp.ndarray,
    slot_mapping: jnp.ndarray,  # [num_tokens] int32, PAD_SLOT_ID for padding
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter this step's K/V rows into their assigned slots."""
    slots = _dropped_pad(slot_mapping)
    k_cache = k_cache.at[slots].set(
        k_new.astype(k_cache.dtype), mode="drop", indices_are_sorted=False
    )
    v_cache = v_cache.at[slots].set(
        v_new.astype(v_cache.dtype), mode="drop", indices_are_sorted=False
    )
    return k_cache, v_cache


def copy_blocks(
    k_cache: jnp.ndarray,  # [num_layers, num_slots, num_kv_heads, head_dim]
    v_cache: jnp.ndarray,
    copy_pairs: jnp.ndarray,  # [max_pairs, 2] int32 (src_block, dst_block), -1 pad
    block_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Copy-on-write block duplication across all layers on device.

    Gathers source block rows and scatters them to destination rows in one
    fused op per cache (ref: cache_manager.cu:15-37 grid=(layers, pairs)).
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
    k_cache = k_cache.at[:, dst_rows].set(k_cache[:, src_rows], mode="drop")
    v_cache = v_cache.at[:, dst_rows].set(v_cache[:, src_rows], mode="drop")
    return k_cache, v_cache


def gather_blocks(cache: jnp.ndarray, block_ids, block_size: int) -> jnp.ndarray:
    """Pull whole blocks off the device (host-swap-out read side).

    ``cache``: [num_layers, num_slots, H, D]; returns
    [num_layers, len(block_ids)·block_size, H, D].
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
    copy_blocks, static_argnames=("block_size",), donate_argnums=(0, 1)
)
scatter_blocks_jit = jax.jit(
    scatter_blocks, static_argnames=("block_size",), donate_argnums=(0,)
)
gather_blocks_jit = jax.jit(gather_blocks, static_argnames=("block_size",))
