"""Llama-family model (Llama 2/3.x) — functional JAX with paged KV.

Ref: models/src/llama.rs — HF-config deserialization incl. Llama-3 rope
scaling (:22-83), rope cos/sin cache precomputed to max_position_embeddings
(:141-200), forward over a flattened ``[num_tokens]`` batch with per-layer
paged KV and last-token selection before the LM head (:456-478).

TPU-native design departures from the reference:
- the layer loop is unrolled over per-layer paged-cache arrays (a scan with
  the cache as xs/ys makes XLA copy + relayout the whole cache every layer —
  see forward()'s docstring);
- attention is a single ragged paged-attention op handling prefill chunks and
  decodes in one batch (the reference dispatches between three CUDA kernels,
  flash_attention.rs:399-464);
- parameters carry optional weight-only quantization (int8/int4 + scales) —
  beyond the reference, required by BASELINE.json configs #3-5.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.rope import RopeScalingConfig, apply_rope, compute_cos_sin_cache
from ..ops.attention import (
    AttentionMetadata,
    alibi_slopes,
    paged_attention_layer,
)
from ..ops.quant import QuantizedLinear, quantized_matmul

# forward_hidden(mesh=...) sentinel: None is a meaningful value (no TP), so
# "not passed" needs its own marker.
_UNSET = object()


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Model hyperparameters (ref: llama.rs:22-124 LlamaConfig/Config)."""

    vocab_size: int = 128256
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 64
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    rope_scaling: Optional[RopeScalingConfig] = None
    max_position_embeddings: int = 131072
    tie_word_embeddings: bool = True
    eos_token_ids: Tuple[int, ...] = (128001, 128008, 128009)
    bos_token_id: int = 128000
    sliding_window: Optional[int] = None
    # ALiBi positional bias instead of rope (ref kernel support:
    # csrc/kernels/alibi.h, flash_attention.rs:175-196).
    use_alibi: bool = False
    # Additive q/k/v projection biases (Qwen2-style; HF `attention_bias`).
    attention_bias: bool = False
    architecture: str = "llama"

    @classmethod
    def from_hf_dict(cls, d: Dict[str, Any]) -> "LlamaConfig":
        """Build from an HF ``config.json`` dict (ref: llama.rs:22-83)."""
        scaling = None
        rs = d.get("rope_scaling")
        if rs and rs.get("rope_type", rs.get("type")) == "llama3":
            scaling = RopeScalingConfig(
                factor=rs.get("factor", 8.0),
                low_freq_factor=rs.get("low_freq_factor", 1.0),
                high_freq_factor=rs.get("high_freq_factor", 4.0),
                original_max_position_embeddings=rs.get(
                    "original_max_position_embeddings", 8192
                ),
            )
        eos = d.get("eos_token_id", 2)
        eos_ids = tuple(eos) if isinstance(eos, (list, tuple)) else (eos,)
        n_heads = d["num_attention_heads"]
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=n_heads,
            num_key_value_heads=d.get("num_key_value_heads", n_heads),
            head_dim=d.get("head_dim", d["hidden_size"] // n_heads),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            rope_theta=d.get("rope_theta", 10000.0),
            rope_scaling=scaling,
            max_position_embeddings=d.get("max_position_embeddings", 4096),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            eos_token_ids=eos_ids,
            bos_token_id=d.get("bos_token_id", 1),
            use_alibi=bool(d.get("alibi", d.get("use_alibi", False))),
            attention_bias=bool(d.get("attention_bias", False)),
            architecture=d.get("model_type", "llama"),
        )

    # Accessors the cache engine needs (ref: model_executor.rs:116-140
    # ``Config`` trait).
    @property
    def num_layers(self) -> int:
        return self.num_hidden_layers

    @property
    def num_kv_heads(self) -> int:
        return self.num_key_value_heads

    @property
    def q_heads_per_kv_head(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm in f32 (ref: llama.rs rms_norm usage :402-405)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def _linear(x: jnp.ndarray, w) -> jnp.ndarray:
    """Matmul against a dense or quantized weight."""
    if isinstance(w, QuantizedLinear):
        return quantized_matmul(x, w)
    return jnp.dot(x, w)


def _layer_params(layers, i: int):
    """Layer i's parameter slice. Quantized tensors are NOT sliced — they
    become layer VIEWS (static ``layer`` index) so the matmul kernel reads
    the stacked int8 array directly; slicing would make XLA materialize a
    full per-layer weight copy in HBM before every Pallas call (custom
    calls cannot consume slice fusions — measured ~400MB/layer of extra
    traffic and 3.1GB of temps on the 8B decode step). Dense weights slice
    as before (XLA fuses those slices into the consuming dots)."""
    import dataclasses

    out = {}
    for key, value in layers.items():
        if isinstance(value, QuantizedLinear):
            out[key] = dataclasses.replace(value, layer=i)
        else:
            out[key] = value[i]
    return out


class Llama:
    """Llama forward pass over the paged KV cache (ref: llama.rs:456-478)."""

    def __init__(self, config: LlamaConfig, dtype=jnp.bfloat16, mesh=None):
        self.config = config
        self.dtype = dtype
        # Tensor-parallel mesh (axis "tp" shards heads); None = single shard
        # (ref: llama_nccl.rs:144-181 — here set by LlmService.start).
        self.mesh = mesh
        cos, sin = compute_cos_sin_cache(
            config.head_dim,
            config.max_position_embeddings,
            config.rope_theta,
            config.rope_scaling,
        )
        self.rope_cos = cos
        self.rope_sin = sin
        self.alibi = (
            alibi_slopes(config.num_attention_heads)
            if config.use_alibi
            else None
        )

    @property
    def kv_repeat(self) -> int:
        """KV-head replication factor for tensor parallelism wider than the
        kv-head count (e.g. 70B GQA-8 on a 16-chip mesh): each kv head is
        written to ``tp // Hk`` consecutive shards so every q-head shard
        attends locally with zero collectives. Costs ×repeat KV memory —
        the standard GQA trade (the reference caps tp at kv_heads instead,
        worker.rs:584-591)."""
        if self.mesh is None:
            return 1
        from ..parallel.mesh import TP_AXIS

        tp = self.mesh.shape.get(TP_AXIS, 1)
        return max(1, tp // self.config.num_key_value_heads)

    @property
    def effective_kv_heads(self) -> int:
        return self.config.num_key_value_heads * self.kv_repeat

    # -- parameter construction -------------------------------------------------
    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        """Random-init parameters (tests/benchmarks; real serving loads
        safetensors via models/weights.py)."""
        cfg = self.config
        k = iter(jax.random.split(rng, 16))
        h, i, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
        hq, hk, L = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.num_layers

        def init(key, shape, fan_in):
            return (
                jax.random.normal(key, shape, dtype=jnp.float32) * fan_in**-0.5
            ).astype(self.dtype)

        params = {
            "embed": init(next(k), (cfg.vocab_size, h), h),
            "layers": {
                "input_norm": jnp.ones((L, h), dtype=self.dtype),
                "q_proj": init(next(k), (L, h, hq * d), h),
                "k_proj": init(next(k), (L, h, hk * d), h),
                "v_proj": init(next(k), (L, h, hk * d), h),
                "o_proj": init(next(k), (L, hq * d, h), hq * d),
                "post_norm": jnp.ones((L, h), dtype=self.dtype),
                "gate_proj": init(next(k), (L, h, i), h),
                "up_proj": init(next(k), (L, h, i), h),
                "down_proj": init(next(k), (L, i, h), i),
            },
            "final_norm": jnp.ones((h,), dtype=self.dtype),
        }
        if cfg.attention_bias:
            params["layers"]["q_bias"] = init(next(k), (L, hq * d), h)
            params["layers"]["k_bias"] = init(next(k), (L, hk * d), h)
            params["layers"]["v_bias"] = init(next(k), (L, hk * d), h)
        if not cfg.tie_word_embeddings:
            params["lm_head"] = init(next(k), (h, cfg.vocab_size), h)
        return params

    # -- forward ------------------------------------------------------------------
    def embed_tokens(
        self, params: Dict[str, Any], token_ids: jnp.ndarray
    ) -> jnp.ndarray:
        """Token embedding lookup (pipeline stage 0's entry step)."""
        return params["embed"][token_ids].astype(self.dtype)

    def forward(
        self,
        params: Dict[str, Any],
        token_ids: jnp.ndarray,   # [T] int32 flattened batch
        positions: jnp.ndarray,   # [T] int32 per-token positions
        kv_cache,                 # tuple of L × [num_pages, bs, 2·Hk·D]
                                  # page-major, or one stacked [L, ...] array
        attn_meta: AttentionMetadata,
        kv_scales=None,           # tuple of L × [pages, bs, 128] bf16 pages
    ):
        """Returns (hidden [T, H], updated kv_cache) — plus updated
        kv_scales when the cache is INT8-quantized."""
        h = self.embed_tokens(params, token_ids)
        return self.forward_hidden(
            params, h, positions, kv_cache, attn_meta, kv_scales=kv_scales
        )

    def _prep_forward(self, params, kv_cache, kv_scales, attn_meta, mesh):
        """Shared forward prologue: layer count, one-time page map for the
        Pallas cache write (depends only on slot_mapping — reused across all
        layers), and per-layer cache/scale tuples (stacked arrays accepted
        for convenience and split here)."""
        num_layers = params["layers"]["input_norm"].shape[0]
        quantized_kv = kv_scales is not None

        page_map = None
        if not quantized_kv and mesh is None:
            try:
                on_tpu = jax.default_backend() not in ("cpu",)
            except Exception:  # pragma: no cover
                on_tpu = False
            if on_tpu:
                from ..ops.kv_write import _build_page_map

                bs0 = (
                    kv_cache[0].shape[1]
                    if isinstance(kv_cache, (tuple, list))
                    else kv_cache.shape[2]
                )
                page_map = _build_page_map(attn_meta.slot_mapping, bs0)

        stacked_in = not isinstance(kv_cache, (tuple, list))
        if stacked_in:
            kv_cache = tuple(kv_cache[i] for i in range(num_layers))
            if quantized_kv and not isinstance(kv_scales, (tuple, list)):
                kv_scales = tuple(kv_scales[i] for i in range(num_layers))
        return num_layers, page_map, stacked_in, kv_cache, kv_scales

    @staticmethod
    def _pack_forward(h, new_kv, new_scales, stacked_in, quantized_kv):
        """Shared forward epilogue: re-stack per-layer outputs when the
        caller passed a stacked cache."""
        if quantized_kv:
            if stacked_in:
                return h, jnp.stack(new_kv), jnp.stack(new_scales)
            return h, tuple(new_kv), tuple(new_scales)
        if stacked_in:
            return h, jnp.stack(new_kv)
        return h, tuple(new_kv)

    def forward_hidden(
        self,
        params: Dict[str, Any],
        h: jnp.ndarray,           # [T, H] hidden states (post-embed or from
                                  # the previous pipeline stage)
        positions: jnp.ndarray,   # [T] int32 per-token positions
        kv_cache,                 # tuple of n × [num_pages, bs, 2·Hk·D]
        attn_meta: AttentionMetadata,
        kv_scales=None,
        mesh=_UNSET,              # TP mesh override (pipeline stages pass
                                  # their own; default: self.mesh)
        layer_offset: int = 0,    # index of params' first layer within the
                                  # full model (pipeline stages pass their
                                  # bound; families with per-layer behavior
                                  # — gemma2's alternating window — use it)
    ):
        """Transformer layers over the hidden states. Runs however many
        layers ``params["layers"]`` holds — the full model, or one pipeline
        stage's contiguous slice (parallel/pipeline.py split_params).

        The layer loop is UNROLLED over per-layer cache arrays: scanning with
        the cache as scan xs/ys makes XLA materialize an 80MB-per-layer cache
        copy with a layout transpose each step (measured ~7ms/layer on v5e —
        the dominant cost of a decode step). Per-layer arrays touched by
        static python indexing keep the cache buffers donated and in place.
        A stacked array input is accepted for convenience (tests) and split
        here.
        """
        cfg = self.config
        if mesh is _UNSET:
            mesh = self.mesh
        del layer_offset  # llama layers are positionally uniform

        cos, sin = self.rope_cos, self.rope_sin
        scale = cfg.head_dim**-0.5
        quantized_kv = kv_scales is not None
        num_layers, page_map, stacked_in, kv_cache, kv_scales = (
            self._prep_forward(params, kv_cache, kv_scales, attn_meta, mesh)
        )

        def layer_fn(hidden, lp, kv_c, sc_c):
            # Attention block (ref: llama.rs:218-320).
            normed = rms_norm(hidden, lp["input_norm"], cfg.rms_norm_eps)
            q = _linear(normed, lp["q_proj"])
            kk = _linear(normed, lp["k_proj"])
            vv = _linear(normed, lp["v_proj"])
            if "q_bias" in lp:
                # Qwen2-style additive qkv biases (HF `attention_bias`).
                q = q + lp["q_bias"].astype(q.dtype)
                kk = kk + lp["k_bias"].astype(kk.dtype)
                vv = vv + lp["v_bias"].astype(vv.dtype)
            q = q.reshape(-1, cfg.num_attention_heads, cfg.head_dim)
            kk = kk.reshape(-1, cfg.num_key_value_heads, cfg.head_dim)
            vv = vv.reshape(-1, cfg.num_key_value_heads, cfg.head_dim)
            if self.alibi is None:
                q = apply_rope(q, positions, cos, sin)
                kk = apply_rope(kk, positions, cos, sin)
            if self.kv_repeat > 1:
                # TP wider than the kv-head count: tile each kv head across
                # its tp//Hk q-head shards (rope already applied; repeat
                # keeps head j's copies at tiled slots [j·r, (j+1)·r), which
                # is exactly where its q heads land under head sharding).
                kk = jnp.repeat(kk, self.kv_repeat, axis=1)
                vv = jnp.repeat(vv, self.kv_repeat, axis=1)
            # Write new KV into the paged cache, then attend over it
            # (ref: flash_attention.rs:360-361 order); TP shards heads
            # under shard_map when a mesh is set.
            attn, kv_c, sc_c = paged_attention_layer(
                q,
                kv_c,
                sc_c if quantized_kv else None,
                kk,
                vv,
                attn_meta,
                scale=scale,
                sliding_window=cfg.sliding_window,
                alibi_slopes=self.alibi,
                mesh=mesh,
                page_map=page_map,
            )
            attn = attn.reshape(-1, cfg.num_attention_heads * cfg.head_dim)
            hidden = hidden + _linear(attn, lp["o_proj"])
            # MLP block (ref: llama.rs:362-366); overridable — mixtral swaps
            # in the sparse-MoE block.
            normed = rms_norm(hidden, lp["post_norm"], cfg.rms_norm_eps)
            hidden = hidden + self._mlp_block(normed, lp)
            return hidden, kv_c, sc_c

        new_kv = []
        new_scales = []
        for i in range(num_layers):
            lp = _layer_params(params["layers"], i)
            h, kv_c, sc_c = layer_fn(
                h,
                lp,
                kv_cache[i],
                kv_scales[i] if quantized_kv else None,
            )
            new_kv.append(kv_c)
            new_scales.append(sc_c)

        return self._pack_forward(h, new_kv, new_scales, stacked_in, quantized_kv)

    def _mlp_block(self, normed: jnp.ndarray, lp: Dict[str, Any]) -> jnp.ndarray:
        """SwiGLU feed-forward on the post-norm activations."""
        gate = _linear(normed, lp["gate_proj"])
        up = _linear(normed, lp["up_proj"])
        return _linear(jax.nn.silu(gate) * up, lp["down_proj"])

    def compute_logits(
        self,
        params: Dict[str, Any],
        hidden: jnp.ndarray,  # [S, H] — already gathered at last-token rows
    ) -> jnp.ndarray:
        """Final norm + LM head on the selected rows only, logits in f32
        (ref: llama.rs:474-477 index_select → lm_head → f32)."""
        cfg = self.config
        hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
        if cfg.tie_word_embeddings and "lm_head" not in params:
            logits = jnp.dot(
                hidden, params["embed"].T, preferred_element_type=jnp.float32
            )
        else:
            w = params["lm_head"]
            if isinstance(w, QuantizedLinear):
                logits = quantized_matmul(hidden, w).astype(jnp.float32)
            else:
                logits = jnp.dot(
                    hidden, w, preferred_element_type=jnp.float32
                )
        return logits

    # -- cache shape contract ---------------------------------------------------
    def kv_cache_shape(
        self, num_blocks: int, block_size: int
    ) -> Tuple[int, int, int, int]:
        """Fused page-major K/V cache shape [L, pages, bs, 2·Hk·D] — the
        TPU-native analog of the reference's per-layer
        ``[2, blocks, block_size, kv_heads, dim]`` contract
        (flash_attention.rs:239-246). Page-major rows keep every kernel DMA
        whole-page and the minor dim unpadded (see ops/kv_cache.py)."""
        cfg = self.config
        return (
            cfg.num_layers,
            num_blocks,
            block_size,
            2 * self.effective_kv_heads * cfg.head_dim,
        )
