"""Phi-3 model (ref: models/src/phi3.rs).

Llama-shaped with fused qkv / gate_up projections in the HF checkpoint and
optional sliding window. The fused tensors are split at load time
(models/weights.py handles llama-format names; phi3 checkpoints are converted
by ``split_phi3_tensor``), after which the shared Llama forward applies.
The reference implements Phi3 but never registers it (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .llama import Llama, LlamaConfig


class Phi3Config(LlamaConfig):
    @classmethod
    def from_hf_dict(cls, d: Dict[str, Any]) -> "LlamaConfig":
        base = LlamaConfig.from_hf_dict(d)
        import dataclasses

        return dataclasses.replace(base, sliding_window=d.get("sliding_window"))


def split_phi3_tensor(
    name: str, arr: np.ndarray, num_q: int, num_kv: int, head_dim: int
) -> Tuple[Tuple[str, np.ndarray], ...]:
    """Split phi3's fused checkpoint tensors into llama-format pieces.

    ``qkv_proj.weight`` [(q+2kv)·d, hidden] → q/k/v projections;
    ``gate_up_proj.weight`` [2·inter, hidden] → gate/up projections.
    """
    if name.endswith("self_attn.qkv_proj.weight"):
        q_rows = num_q * head_dim
        kv_rows = num_kv * head_dim
        prefix = name[: -len("qkv_proj.weight")]
        return (
            (prefix + "q_proj.weight", arr[:q_rows]),
            (prefix + "k_proj.weight", arr[q_rows : q_rows + kv_rows]),
            (prefix + "v_proj.weight", arr[q_rows + kv_rows :]),
        )
    if name.endswith("mlp.gate_up_proj.weight"):
        inter = arr.shape[0] // 2
        prefix = name[: -len("gate_up_proj.weight")]
        return (
            (prefix + "gate_proj.weight", arr[:inter]),
            (prefix + "up_proj.weight", arr[inter:]),
        )
    return ((name, arr),)


class Phi3(Llama):
    """Same paged-KV forward as Llama (ref: phi3.rs:12,363)."""

    config_cls = Phi3Config
