"""Safetensors → JAX pytree weight loading (+ quantize-on-load).

Ref: models/src/llama.rs:480-499 — the reference mmaps safetensors via
Candle's VarBuilder; here tensors stream through numpy into stacked JAX
arrays (layers stacked on axis 0 for ``lax.scan``), optionally quantizing
each linear to INT8/INT4 as it loads so peak host memory stays ~1× weights.

Handles both single-file ``model.safetensors`` and sharded
``model.safetensors.index.json`` checkpoints (ref: the reference's small-model
single-file list vs index-json logic, backends/vllm/src/models/llama.rs:20-24).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.quant import quantize_weight
from .llama import LlamaConfig

logger = logging.getLogger(__name__)


def _weight_files(model_dir: str) -> List[str]:
    index = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        return sorted(
            {os.path.join(model_dir, fn) for fn in weight_map.values()}
        )
    single = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(single):
        return [single]
    raise FileNotFoundError(f"no safetensors checkpoint found in {model_dir}")


def load_hf_config(model_dir: str) -> LlamaConfig:
    """Parse config.json into the right family config (llama/mistral/phi3)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        d = json.load(f)
    model_type = d.get("model_type", "llama")
    if model_type == "mistral":
        from .mistral import MistralConfig

        return MistralConfig.from_hf_dict(d)
    if model_type == "phi3":
        from .phi3 import Phi3Config

        return Phi3Config.from_hf_dict(d)
    if model_type == "qwen2":
        from .qwen2 import Qwen2Config

        return Qwen2Config.from_hf_dict(d)
    if model_type == "gemma2":
        from .gemma import GemmaConfig

        return GemmaConfig.from_hf_dict(d)
    if model_type == "mixtral":
        from .mixtral import MixtralConfig

        return MixtralConfig.from_hf_dict(d)
    return LlamaConfig.from_hf_dict(d)


# HF parameter name → (pytree key, transpose?) for per-layer tensors.
_LAYER_MAP = {
    "input_layernorm.weight": ("input_norm", False),
    "self_attn.q_proj.weight": ("q_proj", True),
    "self_attn.k_proj.weight": ("k_proj", True),
    "self_attn.v_proj.weight": ("v_proj", True),
    "self_attn.o_proj.weight": ("o_proj", True),
    # Qwen2-style qkv biases (absent in llama/mistral checkpoints — bias
    # keys whose tensors never appear are dropped after loading).
    "self_attn.q_proj.bias": ("q_bias", False),
    "self_attn.k_proj.bias": ("k_bias", False),
    "self_attn.v_proj.bias": ("v_bias", False),
    "post_attention_layernorm.weight": ("post_norm", False),
    # Gemma2's extra feed-forward norms (absent in the other families).
    "pre_feedforward_layernorm.weight": ("pre_ffw_norm", False),
    "post_feedforward_layernorm.weight": ("post_ffw_norm", False),
    "mlp.gate_proj.weight": ("gate_proj", True),
    "mlp.up_proj.weight": ("up_proj", True),
    "mlp.down_proj.weight": ("down_proj", True),
}

_OPTIONAL_KEYS = frozenset(
    {"q_bias", "k_bias", "v_bias", "pre_ffw_norm", "post_ffw_norm"}
)

_QUANTIZED_KEYS = frozenset(
    {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"}
)


def load_llama_params(
    model_dir: str,
    config: LlamaConfig,
    dtype=jnp.bfloat16,
    quantization: Optional[str] = None,  # None | "int8" | "int4"
) -> Dict[str, Any]:
    """Load and stack Llama weights; optionally quantize linears on load."""
    from safetensors import safe_open

    L = config.num_layers
    per_layer: Dict[str, List[Optional[np.ndarray]]] = {
        key: [None] * L for key, _ in _LAYER_MAP.values()
    }
    top: Dict[str, Any] = {}
    # Mixtral MoE tensors: router [L,H,E] + per-expert SwiGLU stacks
    # [L,E,...] (models/mixtral.py layout; experts stay at model dtype —
    # weight-only quantization currently covers the attention projections).
    E = int(getattr(config, "num_local_experts", 0) or 0)
    moe_router: List[Optional[np.ndarray]] = [None] * L
    moe_experts: Dict[str, List[List[Optional[np.ndarray]]]] = {
        w: [[None] * E for _ in range(L)] for w in ("w1", "w2", "w3")
    }

    def take_moe(idx: int, param: str, arr: np.ndarray) -> bool:
        """Route a ``block_sparse_moe.*`` tensor; True if consumed."""
        if not param.startswith("block_sparse_moe."):
            return False
        rest = param[len("block_sparse_moe.") :]
        if rest == "gate.weight":
            moe_router[idx] = arr.T          # [E,H] → [H,E]
        elif rest.startswith("experts."):
            eidx_str, wname = rest[len("experts.") :].split(".", 1)
            wname = wname.removesuffix(".weight")
            if wname not in moe_experts:
                logger.warning("skipping unknown expert tensor %s", rest)
                return True
            # HF Linear stores [out,in]; all three transpose to [in,out].
            moe_experts[wname][idx][int(eidx_str)] = arr.T
        else:
            logger.warning("skipping unknown moe tensor %s", rest)
        return True

    def tensors_from(f):
        """Yield (name, array), splitting phi3's fused qkv/gate_up tensors
        into llama-format pieces (ref: phi3.rs fused checkpoint layout)."""
        from .phi3 import split_phi3_tensor

        for name in f.keys():
            arr = f.get_tensor(name)
            if name.endswith(("qkv_proj.weight", "gate_up_proj.weight")):
                yield from split_phi3_tensor(
                    name,
                    arr,
                    config.num_attention_heads,
                    config.num_key_value_heads,
                    config.head_dim,
                )
            else:
                yield name, arr

    for path in _weight_files(model_dir):
        with safe_open(path, framework="numpy") as f:
            for name, arr in tensors_from(f):
                if name == "model.embed_tokens.weight":
                    top["embed"] = arr
                elif name == "model.norm.weight":
                    top["final_norm"] = arr
                elif name == "lm_head.weight":
                    top["lm_head"] = arr.T
                elif name.startswith("model.layers."):
                    rest = name[len("model.layers.") :]
                    idx_str, param = rest.split(".", 1)
                    if E and take_moe(int(idx_str), param, arr):
                        continue
                    mapped = _LAYER_MAP.get(param)
                    if mapped is None:
                        logger.warning("skipping unknown tensor %s", name)
                        continue
                    key, transpose = mapped
                    per_layer[key][int(idx_str)] = arr.T if transpose else arr
                else:
                    logger.warning("skipping unknown tensor %s", name)

    bits = {"int8": 8, "int4": 4}.get(quantization or "")
    layers: Dict[str, Any] = {}
    # MoE checkpoints replace the dense MLP with router+experts entirely.
    moe_replaced = (
        frozenset({"gate_proj", "up_proj", "down_proj"}) if E else frozenset()
    )
    for key, tensors in per_layer.items():
        missing = [i for i, t in enumerate(tensors) if t is None]
        if (
            key in _OPTIONAL_KEYS or key in moe_replaced
        ) and len(missing) == len(tensors):
            continue  # bias-free family (llama/mistral/phi3) / MoE
        if missing:
            raise ValueError(f"missing layer tensors for {key}: {missing}")
        stacked = np.stack(tensors)
        if bits and key in _QUANTIZED_KEYS:
            # Quantize layer-by-layer (vmapping the grouped absmax over the
            # stacked layer axis keeps it one device pass).
            import jax

            layers[key] = jax.vmap(lambda w: quantize_weight(w, bits))(
                jnp.asarray(stacked, dtype=jnp.float32)
            )
        else:
            layers[key] = jnp.asarray(stacked, dtype=dtype)

    if E:
        missing_r = [i for i, t in enumerate(moe_router) if t is None]
        if missing_r:
            raise ValueError(f"missing MoE router tensors: {missing_r}")
        layers["router"] = jnp.asarray(np.stack(moe_router), dtype=dtype)
        for wname, per_layer_experts in moe_experts.items():
            missing_e = [
                (i, j)
                for i, row in enumerate(per_layer_experts)
                for j, t in enumerate(row)
                if t is None
            ]
            if missing_e:
                raise ValueError(
                    f"missing MoE expert tensors for {wname}: {missing_e}"
                )
            layers[wname] = jnp.asarray(
                np.stack([np.stack(row) for row in per_layer_experts]),
                dtype=dtype,
            )

    params: Dict[str, Any] = {
        "embed": jnp.asarray(top["embed"], dtype=dtype),
        "layers": layers,
        "final_norm": jnp.asarray(top["final_norm"], dtype=dtype),
    }
    if "lm_head" in top:
        if bits:
            # The LM head is read whole every step (1GB bf16 at 8B): INT8
            # with PER-CHANNEL scales (one group = the full contraction):
            # the grouped XLA path would materialize a [S, groups, vocab]
            # f32 partial (~800MB at 8B) — single-group degenerates to
            # dot + column scale, which XLA fuses.
            lm = jnp.asarray(top["lm_head"], jnp.float32)
            params["lm_head"] = quantize_weight(
                lm, 8, group_size=lm.shape[0]
            )
        else:
            params["lm_head"] = jnp.asarray(top["lm_head"], dtype=dtype)
    elif not config.tie_word_embeddings:
        raise ValueError("checkpoint lacks lm_head but embeddings are not tied")
    return params
