"""Llama numerics vs HuggingFace transformers (torch CPU).

The P1 gate from SURVEY.md §7: logits must match HF before any kernel work.
Covers the safetensors loader, rope (incl. llama3 scaling), RMSNorm, SwiGLU,
GQA, paged-KV write+attend, and prefill/decode equivalence.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atoma_infer_tpu.models.llama import Llama, LlamaConfig
from atoma_infer_tpu.models.weights import load_hf_config, load_llama_params
from atoma_infer_tpu.ops.attention import AttentionMetadata

BLOCK_SIZE = 16

TINY_CFG = dict(
    architectures=["LlamaForCausalLM"],
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    max_position_embeddings=256,
    tie_word_embeddings=False,
    bos_token_id=0,
    eos_token_id=1,
)


@pytest.fixture(scope="module")
def tiny_hf_model(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(**{k: v for k, v in TINY_CFG.items() if k != "architectures"})
    model = LlamaForCausalLM(hf_cfg).eval().to(torch.float32)

    model_dir = tmp_path_factory.mktemp("tiny_llama")
    from safetensors.torch import save_file

    save_file(model.state_dict(), str(model_dir / "model.safetensors"))
    (model_dir / "config.json").write_text(json.dumps(TINY_CFG))
    return model, str(model_dir)


def make_meta(seq_lens, q_lens, tables, num_slots_pad=0):
    """Build AttentionMetadata with an identity-ish slot layout."""
    slot_mapping = []
    for s, (kv_len, q_len) in enumerate(zip(seq_lens, q_lens)):
        start = kv_len - q_len
        for i in range(q_len):
            pos = start + i
            page = tables[s][pos // BLOCK_SIZE]
            slot_mapping.append(page * BLOCK_SIZE + pos % BLOCK_SIZE)
    cu = np.concatenate([[0], np.cumsum(q_lens)]).astype(np.int32)
    max_pages = max(len(t) for t in tables)
    tables_arr = np.zeros((len(tables), max_pages), dtype=np.int32)
    for s, t in enumerate(tables):
        tables_arr[s, : len(t)] = t
    return AttentionMetadata(
        slot_mapping=jnp.asarray(slot_mapping, dtype=jnp.int32),
        block_tables=jnp.asarray(tables_arr),
        seq_lens=jnp.asarray(seq_lens, dtype=jnp.int32),
        query_start_loc=jnp.asarray(cu),
        num_seqs=jnp.asarray(len(seq_lens), dtype=jnp.int32),
        block_size=BLOCK_SIZE,
    )


def test_prefill_logits_match_hf(tiny_hf_model):
    import torch

    hf_model, model_dir = tiny_hf_model
    cfg = load_hf_config(model_dir)
    model = Llama(cfg, dtype=jnp.float32)
    params = load_llama_params(model_dir, cfg, dtype=jnp.float32)

    T = 21
    rng = np.random.RandomState(0)
    token_ids = rng.randint(0, TINY_CFG["vocab_size"], size=T)

    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(token_ids)[None]).logits[0].numpy()

    num_blocks = 8
    kv_cache = jnp.zeros(model.kv_cache_shape(num_blocks, BLOCK_SIZE),
                         dtype=jnp.float32)
    meta = make_meta([T], [T], [[3, 5]])  # non-contiguous pages on purpose
    hidden, kv_cache = model.forward(
        params,
        jnp.asarray(token_ids, dtype=jnp.int32),
        jnp.arange(T, dtype=jnp.int32),
        kv_cache,
        meta,
    )
    logits = model.compute_logits(params, hidden)  # all positions
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-4, rtol=2e-4)


def test_decode_matches_prefill(tiny_hf_model):
    """Prefill then token-by-token decode must reproduce the full-prompt
    logits (paged-KV decode correctness)."""
    _, model_dir = tiny_hf_model
    cfg = load_hf_config(model_dir)
    model = Llama(cfg, dtype=jnp.float32)
    params = load_llama_params(model_dir, cfg, dtype=jnp.float32)

    T = 13
    rng = np.random.RandomState(1)
    token_ids = rng.randint(0, TINY_CFG["vocab_size"], size=T)
    num_blocks = 8
    shape = model.kv_cache_shape(num_blocks, BLOCK_SIZE)

    # Full prefill in one go.
    kv1 = jnp.zeros(shape, jnp.float32)
    meta = make_meta([T], [T], [[2, 6]])
    hidden_full, _ = model.forward(
        params, jnp.asarray(token_ids, jnp.int32), jnp.arange(T, dtype=jnp.int32),
        kv1, meta,
    )
    logits_full = model.compute_logits(params, hidden_full)

    # Prefill the first 5, then decode the rest one token at a time.
    kv2 = jnp.zeros(shape, jnp.float32)
    meta_p = make_meta([5], [5], [[2, 6]])
    hidden, kv2 = model.forward(
        params, jnp.asarray(token_ids[:5], jnp.int32),
        jnp.arange(5, dtype=jnp.int32), kv2, meta_p,
    )
    last_logits = None
    for t in range(5, T):
        meta_d = make_meta([t + 1], [1], [[2, 6]])
        hidden, kv2 = model.forward(
            params, jnp.asarray(token_ids[t : t + 1], jnp.int32),
            jnp.asarray([t], dtype=jnp.int32), kv2, meta_d,
        )
        last_logits = model.compute_logits(params, hidden)
    np.testing.assert_allclose(
        np.asarray(last_logits[0]), np.asarray(logits_full[-1]),
        atol=2e-4, rtol=2e-4,
    )


def test_llama3_rope_scaling_matches_hf(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM
    from safetensors.torch import save_file

    cfg_dict = dict(TINY_CFG)
    cfg_dict["rope_scaling"] = {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 32,
    }
    cfg_dict["max_position_embeddings"] = 256
    torch.manual_seed(2)
    hf_cfg = HFConfig(**{k: v for k, v in cfg_dict.items() if k != "architectures"})
    hf_model = LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
    save_file(hf_model.state_dict(), str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps(cfg_dict))

    cfg = load_hf_config(str(tmp_path))
    assert cfg.rope_scaling is not None
    model = Llama(cfg, dtype=jnp.float32)
    params = load_llama_params(str(tmp_path), cfg, dtype=jnp.float32)

    T = 64  # long enough to hit scaled frequency bands
    rng = np.random.RandomState(3)
    token_ids = rng.randint(0, cfg_dict["vocab_size"], size=T)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(token_ids)[None]).logits[0].numpy()

    kv = jnp.zeros(model.kv_cache_shape(8, BLOCK_SIZE), jnp.float32)
    meta = make_meta([T], [T], [[0, 1, 2, 7]])
    hidden, _ = model.forward(
        params, jnp.asarray(token_ids, jnp.int32),
        jnp.arange(T, dtype=jnp.int32), kv, meta,
    )
    logits = model.compute_logits(params, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=3e-4, rtol=3e-4)
