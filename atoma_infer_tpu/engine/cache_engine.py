"""Device KV-cache allocation + swap/copy execution.

TPU-native ``CacheEngine`` (ref: backends/vllm/src/worker.rs:486-642): owns
the fused paged KV buffer ``[L, num_slots, 2, Hk, D]`` in HBM and a host
(numpy) swap tier, and executes the scheduler's swap-in/swap-out/copy decisions
each step. The reference allocates per-layer tensors on GPU and CPU and
launches cudaMemcpy/CUDA kernels per layer (worker.rs:568-642); here the cache
is ONE donated array per device — copies are single fused gather/scatters
across all layers, and host swap moves whole blocks with ``jax.device_put`` /
``jax.device_get``.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kv_cache import (
    copy_blocks_jit,
    gather_blocks_jit,
    scatter_blocks_jit,
)

logger = logging.getLogger(__name__)


class CacheEngine:
    """Owns the paged KV storage on device + the host swap tier."""

    def __init__(
        self,
        *,
        num_layers: int,
        num_kv_heads: int,
        head_dim: int,
        block_size: int,
        num_device_blocks: int,
        num_host_blocks: int,
        dtype=jnp.bfloat16,
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        self.num_layers = num_layers
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.block_size = block_size
        self.num_device_blocks = num_device_blocks
        self.num_host_blocks = num_host_blocks
        self.dtype = dtype

        shape = (
            num_layers,
            num_device_blocks * block_size,
            2,
            num_kv_heads,
            head_dim,
        )
        kv = jnp.zeros(shape, dtype=dtype)
        if sharding is not None:
            kv = jax.device_put(kv, sharding)
        self.kv_cache = kv
        # INT8 KV mode: per-(slot, K/V) dequantization scales.
        self.kv_scales = (
            jnp.zeros(shape[:3], dtype=jnp.float32)
            if dtype == jnp.int8
            else None
        )
        # Host swap tier (ref: worker.rs cpu_cache); numpy, paged identically.
        host_dtype = (
            np.int8 if dtype == jnp.int8
            else np.float32 if dtype == jnp.float32
            else np.float16
        )
        self.host_cache = np.zeros(
            (
                num_layers,
                num_host_blocks * block_size,
                2,
                num_kv_heads,
                head_dim,
            ),
            dtype=host_dtype,
        ) if num_host_blocks > 0 else None
        self.host_scales = (
            np.zeros((num_layers, num_host_blocks * block_size, 2), np.float32)
            if num_host_blocks > 0 and dtype == jnp.int8
            else None
        )

    @property
    def num_slots(self) -> int:
        return self.num_device_blocks * self.block_size

    # ------------------------------------------------------------------ swaps
    def swap_out(self, mapping: List[Tuple[int, int]]) -> None:
        """Device→host block copies (ref: worker.rs:600-614).

        ``mapping`` is (device_block, host_block) pairs from the scheduler.
        """
        if not mapping or self.host_cache is None:
            return
        dev_ids = [src for src, _ in mapping]
        data = np.asarray(
            gather_blocks_jit(self.kv_cache, dev_ids, self.block_size)
        )
        sdata = (
            np.asarray(
                gather_blocks_jit(self.kv_scales, dev_ids, self.block_size)
            )
            if self.kv_scales is not None
            else None
        )
        for i, (_, dst) in enumerate(mapping):
            rows = slice(dst * self.block_size, (dst + 1) * self.block_size)
            src_rows = slice(i * self.block_size, (i + 1) * self.block_size)
            self.host_cache[:, rows] = data[:, src_rows]
            if sdata is not None:
                self.host_scales[:, rows] = sdata[:, src_rows]

    def swap_in(self, mapping: List[Tuple[int, int]]) -> None:
        """Host→device block copies (ref: worker.rs:616-630).

        ``mapping`` is (host_block, device_block) pairs.
        """
        if not mapping or self.host_cache is None:
            return
        chunks = []
        schunks = []
        for src, _ in mapping:
            rows = slice(src * self.block_size, (src + 1) * self.block_size)
            chunks.append(self.host_cache[:, rows])
            if self.host_scales is not None:
                schunks.append(self.host_scales[:, rows])
        data = jnp.asarray(
            np.concatenate(chunks, axis=1), dtype=self.dtype
        )
        dev_ids = [dst for _, dst in mapping]
        self.kv_cache = scatter_blocks_jit(
            self.kv_cache, dev_ids, data, self.block_size
        )
        if schunks:
            self.kv_scales = scatter_blocks_jit(
                self.kv_scales,
                dev_ids,
                jnp.asarray(np.concatenate(schunks, axis=1)),
                self.block_size,
            )

    def copy(self, pairs: List[Tuple[int, int]], max_pairs_bucket: int = 16) -> None:
        """Copy-on-write block duplication (ref: worker.rs:632-642).

        Pairs are padded to a small bucket so the jitted copy hits a cached
        executable.
        """
        if not pairs:
            return
        n = max_pairs_bucket
        while n < len(pairs):
            n *= 2
        padded = np.full((n, 2), -1, dtype=np.int32)
        padded[: len(pairs)] = pairs
        self.kv_cache = copy_blocks_jit(
            self.kv_cache, jnp.asarray(padded), self.block_size
        )
        if self.kv_scales is not None:
            self.kv_scales = copy_blocks_jit(
                self.kv_scales, jnp.asarray(padded), self.block_size
            )

    @property
    def quantized(self) -> bool:
        return self.kv_scales is not None

    def execute(
        self,
        blocks_to_swap_in: List[Tuple[int, int]],
        blocks_to_swap_out: List[Tuple[int, int]],
        blocks_to_copy: List[Tuple[int, int]],
    ) -> None:
        """One step's cache maintenance, in the reference's order
        (worker.rs:111-160: swap first, then CoW copies)."""
        self.swap_out(blocks_to_swap_out)
        self.swap_in(blocks_to_swap_in)
        self.copy(blocks_to_copy)
