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
import ml_dtypes
import numpy as np

from ..utils.tracing import instrument
from ..ops.kv_cache import (
    SCALE_LANES,
    copy_blocks_layer_jit,
    gather_blocks_layer_jit,
    scatter_blocks_layer_jit,
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

        row = 2 * num_kv_heads * head_dim
        # Per-layer arrays (NOT one stacked array): the model's unrolled
        # layer loop touches each layer's cache by static identity so XLA
        # keeps every buffer donated and in place — a stacked array would be
        # sliced/re-stacked with full copies each step.
        def layer_array():
            kv = jnp.zeros((num_device_blocks, block_size, row), dtype=dtype)
            return jax.device_put(kv, sharding) if sharding is not None else kv

        self.kv_cache = tuple(layer_array() for _ in range(num_layers))
        # INT8 KV mode: per-(slot, K/V) dequantization scales — replicated
        # across TP shards (every shard quantizes with the same scales).
        scales_sharding = None
        if sharding is not None and isinstance(
            sharding, jax.sharding.NamedSharding
        ):
            scales_sharding = jax.sharding.NamedSharding(
                sharding.mesh, jax.sharding.PartitionSpec()
            )

        def scales_array():
            from ..ops.kv_cache import alloc_kv_scales

            s = alloc_kv_scales(num_device_blocks, block_size)
            return (
                jax.device_put(s, scales_sharding)
                if scales_sharding is not None
                else s
            )

        self.kv_scales = (
            tuple(scales_array() for _ in range(num_layers))
            if dtype == jnp.int8
            else None
        )
        # Host swap tier (ref: worker.rs cpu_cache); numpy, paged identically.
        # The host dtype MATCHES the device dtype (ml_dtypes covers bf16 and
        # fp8) so a swap round trip is bit-exact — a float16 host tier would
        # silently round bf16 values and overflow past 65504.
        host_dtype = (
            np.int8 if dtype == jnp.int8
            else np.float32 if dtype == jnp.float32
            else ml_dtypes.float8_e4m3fn if dtype == jnp.float8_e4m3fn
            else ml_dtypes.bfloat16
        )
        self.host_cache = np.zeros(
            (num_layers, num_host_blocks, block_size, row),
            dtype=host_dtype,
        ) if num_host_blocks > 0 else None
        self.host_scales = (
            np.zeros(
                (num_layers, num_host_blocks, block_size, SCALE_LANES),
                ml_dtypes.bfloat16,
            )
            if num_host_blocks > 0 and dtype == jnp.int8
            else None
        )

    @property
    def num_slots(self) -> int:
        return self.num_device_blocks * self.block_size

    # ------------------------------------------------------------------ swaps
    @staticmethod
    def _bucket_ids(ids: List[int]) -> np.ndarray:
        """Pad an id list to the next power of two (repeating the first id)
        so the jitted gather/scatter hits a small set of compiled shapes.
        Duplicate ids are safe: gathers read repeats, scatters rewrite the
        same block with identical data."""
        n = 1
        while n < len(ids):
            n *= 2
        out = np.full((n,), ids[0], dtype=np.int32)
        out[: len(ids)] = ids
        return out

    @instrument("cache.swap_out")
    def swap_out(self, mapping: List[Tuple[int, int]]) -> None:
        """Device→host block copies (ref: worker.rs:600-614).

        ``mapping`` is (device_block, host_block) pairs from the scheduler.
        All layers' gathers are DISPATCHED first (they queue on the device
        and overlap), then fetched; host rows land with one vectorized
        assignment per layer — no per-layer sync, no per-block python loop
        (SURVEY.md §7 hard part #6: overlap swap with decode).
        """
        if not mapping or self.host_cache is None:
            return
        n = len(mapping)
        dev_ids = jnp.asarray(self._bucket_ids([src for src, _ in mapping]))
        dst_ids = np.asarray([dst for _, dst in mapping], dtype=np.int64)
        gathered = [
            gather_blocks_layer_jit(self.kv_cache[layer], dev_ids)
            for layer in range(self.num_layers)
        ]
        sgathered = (
            [
                gather_blocks_layer_jit(self.kv_scales[layer], dev_ids)
                for layer in range(self.num_layers)
            ]
            if self.kv_scales is not None
            else None
        )
        for layer in range(self.num_layers):
            self.host_cache[layer, dst_ids] = np.asarray(gathered[layer])[:n]
            if sgathered is not None:
                self.host_scales[layer, dst_ids] = np.asarray(
                    sgathered[layer]
                )[:n]

    @instrument("cache.swap_in")
    def swap_in(self, mapping: List[Tuple[int, int]]) -> None:
        """Host→device block copies (ref: worker.rs:616-630).

        ``mapping`` is (host_block, device_block) pairs. Host rows are read
        with one fancy-index per layer; all device scatters are dispatched
        asynchronously (donated buffers update in place) so the transfers
        pipeline instead of serializing per layer.
        """
        if not mapping or self.host_cache is None:
            return
        src_ids = np.asarray([src for src, _ in mapping], dtype=np.int64)
        dev_ids_b = self._bucket_ids([dst for _, dst in mapping])
        pad = len(dev_ids_b) - len(mapping)
        dev_ids = jnp.asarray(dev_ids_b)
        new_cache = []
        new_scales = []
        for layer in range(self.num_layers):
            data_np = self.host_cache[layer, src_ids]
            if pad:
                data_np = np.concatenate(
                    [data_np, np.repeat(data_np[:1], pad, axis=0)]
                )
            data = jnp.asarray(data_np, dtype=self.dtype)
            new_cache.append(
                scatter_blocks_layer_jit(self.kv_cache[layer], dev_ids, data)
            )
            if self.host_scales is not None:
                sdata_np = self.host_scales[layer, src_ids]
                if pad:
                    sdata_np = np.concatenate(
                        [sdata_np, np.repeat(sdata_np[:1], pad, axis=0)]
                    )
                new_scales.append(
                    scatter_blocks_layer_jit(
                        self.kv_scales[layer], dev_ids, jnp.asarray(sdata_np)
                    )
                )
        self.kv_cache = tuple(new_cache)
        if new_scales:
            self.kv_scales = tuple(new_scales)

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
        padded[: len(pairs)] = np.asarray(pairs, dtype=np.int32)
        pj = jnp.asarray(padded)
        self.kv_cache = tuple(
            copy_blocks_layer_jit(c, pj) for c in self.kv_cache
        )
        if self.kv_scales is not None:
            self.kv_scales = tuple(
                copy_blocks_layer_jit(s, pj) for s in self.kv_scales
            )

    def swap_blocks_to(
        self, dst: "CacheEngine", mapping: List[Tuple[int, int]]
    ) -> None:
        """Device-to-device block copy into ANOTHER cache engine's buffers
        (ref: csrc/src/cache_manager.rs:18-128 — swap_blocks with both
        tensors resident on device; there it moves blocks between GPUs,
        here between cache tiers/stages, e.g. pipeline-stage migration).
        Same-engine moves are :meth:`copy`."""
        if not mapping:
            return
        src_ids = jnp.asarray([s for s, _ in mapping], jnp.int32)
        dst_ids = jnp.asarray([d for _, d in mapping], jnp.int32)
        dst.kv_cache = tuple(
            scatter_blocks_layer_jit(
                d_layer, dst_ids, gather_blocks_layer_jit(s_layer, src_ids)
            )
            for s_layer, d_layer in zip(self.kv_cache, dst.kv_cache)
        )
        if self.kv_scales is not None and dst.kv_scales is not None:
            dst.kv_scales = tuple(
                scatter_blocks_layer_jit(
                    d_layer,
                    dst_ids,
                    gather_blocks_layer_jit(s_layer, src_ids),
                )
                for s_layer, d_layer in zip(self.kv_scales, dst.kv_scales)
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
