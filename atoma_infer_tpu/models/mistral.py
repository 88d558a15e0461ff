"""Mistral model (ref: models/src/mistral.rs).

Architecturally Llama with sliding-window attention and untied embeddings —
the forward pass is shared with :class:`~atoma_infer_tpu.models.llama.Llama`;
only config parsing differs (and the sliding window is honored by the
attention op). The reference implements Mistral but never registers it
(SURVEY.md §2.3); here it is a first-class registered family.
"""

from __future__ import annotations

from typing import Any, Dict

from .llama import Llama, LlamaConfig


class MistralConfig(LlamaConfig):
    @classmethod
    def from_hf_dict(cls, d: Dict[str, Any]) -> "LlamaConfig":
        base = LlamaConfig.from_hf_dict(d)
        import dataclasses

        return dataclasses.replace(
            base,
            sliding_window=d.get("sliding_window"),
            rope_scaling=None,
        )


class Mistral(Llama):
    """Same paged-KV forward as Llama; sliding window from config
    (ref: mistral.rs:12,366)."""

    config_cls = MistralConfig
