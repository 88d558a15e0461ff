"""Qwen2 model family.

Llama-shaped with additive q/k/v projection biases and (for some sizes) a
sliding window; the paged-KV forward is shared with
:class:`~atoma_infer_tpu.models.llama.Llama`. The reference has no Qwen
support (its models crate ships Llama/Mistral/Phi3 only — SURVEY.md §2.3);
this family extends the framework beyond reference parity using the same
config-delta pattern as mistral.py/phi3.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

from .llama import Llama, LlamaConfig


class Qwen2Config(LlamaConfig):
    @classmethod
    def from_hf_dict(cls, d: Dict[str, Any]) -> "LlamaConfig":
        base = LlamaConfig.from_hf_dict(d)
        return dataclasses.replace(
            base,
            # HF Qwen2 has qkv biases unconditionally (its config carries no
            # attention_bias flag); honor an explicit flag if present.
            attention_bias=bool(d.get("attention_bias", True)),
            sliding_window=(
                d.get("sliding_window")
                if d.get("use_sliding_window", False)
                else None
            ),
            rope_scaling=None,
        )


class Qwen2(Llama):
    """Same paged-KV forward as Llama; qkv biases from config."""

    config_cls = Qwen2Config
