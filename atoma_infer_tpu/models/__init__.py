"""Model implementations (ref: models/src/ — Llama, Mistral, Phi3).

All models share the flattened-batch + paged-KV forward contract
(ref: flash_attention.rs:156-174): tokens of all scheduled sequences are
packed into one ``[num_tokens]`` axis, prefills first then decodes, and
attention reads/writes the paged KV cache through block tables.
"""

from .registry import get_model_cls, list_models

__all__ = ["get_model_cls", "list_models"]
