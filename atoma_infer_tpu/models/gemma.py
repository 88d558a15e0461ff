"""Gemma-2 model family (beyond reference parity).

The reference's models crate ships Llama/Mistral/Phi3 only (SURVEY.md §2.3);
Gemma-2 exercises kernel features the other families don't combine:
attention-logit softcapping + ALTERNATING local/global sliding window
(both already first-class in the unified Pallas kernel —
ops/paged_attention.py soft_cap / per-call sliding_window), plus the
architectural deltas HF Gemma2 carries:

- zero-centered RMSNorm: ``x̂ · (1 + w)`` computed in f32;
- four norms per layer (pre/post attention, pre/post feed-forward) with the
  post-norms applied to the sublayer OUTPUT before the residual add;
- GeGLU MLP (tanh-approximate gelu gate instead of silu);
- embedding scaled by ``sqrt(hidden)``; attention scale from
  ``query_pre_attn_scalar`` instead of ``head_dim``;
- final-logit softcapping after the (tied) LM head.

The per-layer sliding window is a static python-loop property, so each
layer's attention compiles with its own window — no dynamic masks. The
engine-level ``sliding_window`` config stays None: odd (global) layers need
the full context, so the block manager must never trim pages.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import AttentionMetadata, paged_attention_layer
from ..ops.quant import QuantizedLinear, quantized_matmul
from .llama import Llama, LlamaConfig, _linear, _UNSET


@dataclasses.dataclass(frozen=True)
class GemmaConfig(LlamaConfig):
    """Gemma-2 hyperparameters (HF ``Gemma2Config`` fields)."""

    # tanh caps on attention logits (pre-mask) and final logits.
    attn_logit_softcapping: Optional[float] = 50.0
    final_logit_softcapping: Optional[float] = 30.0
    # Attention scale is query_pre_attn_scalar**-0.5, not head_dim**-0.5.
    query_pre_attn_scalar: float = 256.0
    # Local window for the sliding layers; every ``sliding_window_pattern``-th
    # layer is global (gemma2: pattern 2 → even layers local, odd global).
    local_sliding_window: Optional[int] = 4096
    sliding_window_pattern: int = 2

    @classmethod
    def from_hf_dict(cls, d: Dict[str, Any]) -> "GemmaConfig":
        base = LlamaConfig.from_hf_dict(d)
        base_kw = {
            f.name: getattr(base, f.name)
            for f in dataclasses.fields(LlamaConfig)
        }
        # Gemma ties embeddings unless the config says otherwise, and its
        # engine-level window must stay None (see module docstring).
        base_kw["tie_word_embeddings"] = d.get("tie_word_embeddings", True)
        base_kw["sliding_window"] = None
        base_kw["bos_token_id"] = d.get("bos_token_id", 2)
        eos = d.get("eos_token_id", 1)
        base_kw["eos_token_ids"] = (
            tuple(eos) if isinstance(eos, (list, tuple)) else (eos,)
        )
        return cls(
            **base_kw,
            attn_logit_softcapping=d.get("attn_logit_softcapping"),
            final_logit_softcapping=d.get("final_logit_softcapping"),
            query_pre_attn_scalar=float(d.get("query_pre_attn_scalar", 256)),
            local_sliding_window=d.get("sliding_window", 4096),
            sliding_window_pattern=int(d.get("sliding_window_pattern", 2)),
        )

    def layer_sliding_window(self, layer_idx: int) -> Optional[int]:
        """Static per-layer window: gemma2 alternates local/global — layer i
        is local unless ``(i+1) % pattern == 0`` (HF ``is_sliding``)."""
        if self.local_sliding_window is None:
            return None
        if (layer_idx + 1) % self.sliding_window_pattern == 0:
            return None
        return self.local_sliding_window


def gemma_rms_norm(
    x: jnp.ndarray, weight: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """Zero-centered RMSNorm in f32: ``x̂ · (1 + w)`` (HF Gemma2RMSNorm)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)


def _softcap(logits: jnp.ndarray, cap: Optional[float]) -> jnp.ndarray:
    if cap is None:
        return logits
    return jnp.tanh(logits / cap) * cap


class Gemma2(Llama):
    """Gemma-2 forward over the shared paged-KV machinery."""

    config_cls = GemmaConfig

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        """Gemma norms are zero-centered (effective scale 1 + w → init 0)
        and each layer carries pre/post feed-forward norms."""
        params = super().init_params(rng)
        cfg = self.config
        L, h = cfg.num_layers, cfg.hidden_size
        zeros = jnp.zeros((L, h), dtype=self.dtype)
        params["layers"]["input_norm"] = zeros
        params["layers"]["post_norm"] = zeros
        params["layers"]["pre_ffw_norm"] = zeros
        params["layers"]["post_ffw_norm"] = zeros
        params["final_norm"] = jnp.zeros((h,), dtype=self.dtype)
        return params

    def embed_tokens(
        self, params: Dict[str, Any], token_ids: jnp.ndarray
    ) -> jnp.ndarray:
        """Embedding lookup scaled by sqrt(hidden) — the normalizer is cast
        to the activation dtype first, matching HF exactly."""
        h = params["embed"][token_ids].astype(self.dtype)
        normalizer = jnp.asarray(self.config.hidden_size**0.5, self.dtype)
        return h * normalizer

    def forward_hidden(
        self,
        params: Dict[str, Any],
        h: jnp.ndarray,
        positions: jnp.ndarray,
        kv_cache,
        attn_meta: AttentionMetadata,
        kv_scales=None,
        mesh=_UNSET,
        layer_offset: int = 0,
    ):
        cfg = self.config
        if mesh is _UNSET:
            mesh = self.mesh

        cos, sin = self.rope_cos, self.rope_sin
        scale = cfg.query_pre_attn_scalar**-0.5
        quantized_kv = kv_scales is not None
        num_layers, page_map, stacked_in, kv_cache, kv_scales = (
            self._prep_forward(params, kv_cache, kv_scales, attn_meta, mesh)
        )

        from ..ops.rope import apply_rope

        def layer_fn(hidden, lp, kv_c, sc_c, window):
            residual = hidden
            normed = gemma_rms_norm(hidden, lp["input_norm"], cfg.rms_norm_eps)
            q = _linear(normed, lp["q_proj"])
            kk = _linear(normed, lp["k_proj"])
            vv = _linear(normed, lp["v_proj"])
            q = q.reshape(-1, cfg.num_attention_heads, cfg.head_dim)
            kk = kk.reshape(-1, cfg.num_key_value_heads, cfg.head_dim)
            vv = vv.reshape(-1, cfg.num_key_value_heads, cfg.head_dim)
            q = apply_rope(q, positions, cos, sin)
            kk = apply_rope(kk, positions, cos, sin)
            if self.kv_repeat > 1:
                kk = jnp.repeat(kk, self.kv_repeat, axis=1)
                vv = jnp.repeat(vv, self.kv_repeat, axis=1)
            attn, kv_c, sc_c = paged_attention_layer(
                q,
                kv_c,
                sc_c if quantized_kv else None,
                kk,
                vv,
                attn_meta,
                scale=scale,
                sliding_window=window,
                soft_cap=cfg.attn_logit_softcapping,
                mesh=mesh,
                page_map=page_map,
            )
            attn = attn.reshape(-1, cfg.num_attention_heads * cfg.head_dim)
            attn = _linear(attn, lp["o_proj"])
            # Post-attention norm on the sublayer OUTPUT, then residual.
            hidden = residual + gemma_rms_norm(
                attn, lp["post_norm"], cfg.rms_norm_eps
            )
            residual = hidden
            normed = gemma_rms_norm(
                hidden, lp["pre_ffw_norm"], cfg.rms_norm_eps
            )
            gate = _linear(normed, lp["gate_proj"])
            up = _linear(normed, lp["up_proj"])
            mlp = _linear(
                jax.nn.gelu(gate, approximate=True) * up, lp["down_proj"]
            )
            hidden = residual + gemma_rms_norm(
                mlp, lp["post_ffw_norm"], cfg.rms_norm_eps
            )
            return hidden, kv_c, sc_c

        new_kv = []
        new_scales = []
        for i in range(num_layers):
            lp = jax.tree_util.tree_map(lambda x: x[i], params["layers"])
            window = cfg.layer_sliding_window(layer_offset + i)
            h, kv_c, sc_c = layer_fn(
                h,
                lp,
                kv_cache[i],
                kv_scales[i] if quantized_kv else None,
                window,
            )
            new_kv.append(kv_c)
            new_scales.append(sc_c)

        return self._pack_forward(h, new_kv, new_scales, stacked_in, quantized_kv)

    def compute_logits(
        self, params: Dict[str, Any], hidden: jnp.ndarray
    ) -> jnp.ndarray:
        cfg = self.config
        hidden = gemma_rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
        if cfg.tie_word_embeddings and "lm_head" not in params:
            logits = jnp.dot(
                hidden, params["embed"].T, preferred_element_type=jnp.float32
            )
        else:
            w = params["lm_head"]
            if isinstance(w, QuantizedLinear):
                logits = quantized_matmul(hidden, w).astype(jnp.float32)
            else:
                logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)
        return _softcap(logits, cfg.final_logit_softcapping)
