"""Rotary position embeddings with Llama-3 frequency scaling.

Ref: models/src/llama.rs:141-200 — cos/sin cache precomputed to
``max_position_embeddings`` with llama3 low/high-frequency smoothing
(:155-187). Applied here by gathering rows at flat token positions, matching
the reference's ``index_select`` application (:218-251) — idiomatic for the
flattened ``[num_tokens, heads, head_dim]`` batch layout.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeScalingConfig:
    """Llama-3 rope scaling parameters (ref: llama.rs:22-83 config deser)."""

    factor: float = 8.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192
    rope_type: str = "llama3"


def compute_inv_freq(
    head_dim: int,
    rope_theta: float,
    scaling: Optional[RopeScalingConfig] = None,
) -> jnp.ndarray:
    """Base inverse frequencies, optionally llama3-smoothed
    (ref: llama.rs:155-187)."""
    inv_freq = 1.0 / (
        rope_theta
        ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if scaling is None or scaling.rope_type != "llama3":
        return inv_freq
    low_freq_wavelen = (
        scaling.original_max_position_embeddings / scaling.low_freq_factor
    )
    high_freq_wavelen = (
        scaling.original_max_position_embeddings / scaling.high_freq_factor
    )
    wavelen = 2.0 * math.pi / inv_freq
    # Low-frequency bands are divided by the factor; high-frequency bands are
    # kept; the middle is smoothly interpolated (llama3 smoothing).
    smooth = (
        scaling.original_max_position_embeddings / wavelen
        - scaling.low_freq_factor
    ) / (scaling.high_freq_factor - scaling.low_freq_factor)
    smoothed = (1.0 - smooth) * inv_freq / scaling.factor + smooth * inv_freq
    return jnp.where(
        wavelen > low_freq_wavelen,
        inv_freq / scaling.factor,
        jnp.where(wavelen < high_freq_wavelen, inv_freq, smoothed),
    )


def compute_cos_sin_cache(
    head_dim: int,
    max_positions: int,
    rope_theta: float,
    scaling: Optional[RopeScalingConfig] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute ``[max_positions, head_dim//2]`` cos/sin tables in f32
    (ref: llama.rs:141-200)."""
    inv_freq = compute_inv_freq(head_dim, rope_theta, scaling)
    t = jnp.arange(max_positions, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [max_positions, head_dim//2]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    cos_cache: jnp.ndarray,
    sin_cache: jnp.ndarray,
) -> jnp.ndarray:
    """Rotate ``x: [num_tokens, num_heads, head_dim]`` by per-token positions.

    Uses the HF Llama "rotate_half" convention: the head dim is split into
    two halves (x1, x2) and rotated as (x1·cos − x2·sin, x2·cos + x1·sin),
    with cos/sin indexed per flat token position (ref: llama.rs:218-251).
    """
    cos = cos_cache[positions][:, None, :]  # [T, 1, D/2]
    sin = sin_cache[positions][:, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.astype(x.dtype)
