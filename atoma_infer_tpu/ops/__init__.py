"""Compute ops: Pallas TPU kernels + pure-JAX reference oracles.

This package is the TPU-native replacement for the reference's ``csrc`` crate
(CUDA FlashAttention-2 + cache kernels, SURVEY.md §2.4):

- ``attention``      — dispatch between Pallas kernels and the XLA fallback
- ``reference``      — jittable pure-JAX paged attention (numerics oracle)
- ``paged_attention``— Pallas ragged paged-attention kernel (prefill + decode)
- ``kv_cache``       — KV scatter (reshape_and_cache), copy_blocks, swap
- ``rope``           — rotary embeddings incl. Llama-3 frequency scaling
- ``quant``          — INT8/INT4 weight-only matmul + quantized KV kernels
"""
