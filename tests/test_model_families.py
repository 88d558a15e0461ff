"""Mistral and Phi-3 model-family tests vs HuggingFace numerics.

The reference implements these families but never registers them
(SURVEY.md §2.3); here they are first-class: config dispatch, fused-tensor
splitting (phi3), sliding-window attention (mistral), registry lookup.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atoma_infer_tpu.models.registry import get_model_cls, list_models
from atoma_infer_tpu.models.weights import load_hf_config, load_llama_params
from atoma_infer_tpu.ops.attention import AttentionMetadata

BLOCK_SIZE = 16


def make_meta(T, tables):
    slots = [
        tables[p // BLOCK_SIZE] * BLOCK_SIZE + p % BLOCK_SIZE for p in range(T)
    ]
    return AttentionMetadata(
        slot_mapping=jnp.asarray(slots, jnp.int32),
        block_tables=jnp.asarray([tables], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray(1, jnp.int32),
        block_size=BLOCK_SIZE,
    )


def run_ours(model_dir, T, token_ids):
    cfg = load_hf_config(model_dir)
    model_cls = get_model_cls(cfg.architecture)
    model = model_cls(cfg, dtype=jnp.float32)
    params = load_llama_params(model_dir, cfg, dtype=jnp.float32)
    kv = jnp.zeros(model.kv_cache_shape(8, BLOCK_SIZE), jnp.float32)
    hidden, _ = model.forward(
        params,
        jnp.asarray(token_ids, jnp.int32),
        jnp.arange(T, dtype=jnp.int32),
        kv,
        make_meta(T, [3, 1, 6, 0]),
    )
    return np.asarray(model.compute_logits(params, hidden))


class TestMistral:
    def test_logits_match_hf(self, tmp_path):
        torch = pytest.importorskip("torch")
        from safetensors.torch import save_file
        from transformers import MistralConfig as HFConfig
        from transformers import MistralForCausalLM

        cfg_dict = dict(
            model_type="mistral",
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
            sliding_window=24,
            tie_word_embeddings=False,
            bos_token_id=0,
            eos_token_id=1,
        )
        torch.manual_seed(1)
        hf_model = (
            MistralForCausalLM(HFConfig(**cfg_dict)).eval().to(torch.float32)
        )
        save_file(hf_model.state_dict(), str(tmp_path / "model.safetensors"))
        (tmp_path / "config.json").write_text(json.dumps(cfg_dict))

        T = 40  # > sliding_window to exercise the window mask
        rng = np.random.RandomState(0)
        token_ids = rng.randint(0, 128, T)
        with torch.no_grad():
            hf_logits = hf_model(torch.tensor(token_ids)[None]).logits[0].numpy()
        ours = run_ours(str(tmp_path), T, token_ids)
        np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-4)

    def test_config_dispatch(self, tmp_path):
        (tmp_path / "config.json").write_text(
            json.dumps(
                dict(
                    model_type="mistral",
                    vocab_size=128,
                    hidden_size=64,
                    intermediate_size=128,
                    num_hidden_layers=2,
                    num_attention_heads=4,
                    sliding_window=77,
                )
            )
        )
        cfg = load_hf_config(str(tmp_path))
        assert cfg.architecture == "mistral"
        assert cfg.sliding_window == 77


class TestPhi3:
    def test_logits_match_hf(self, tmp_path):
        torch = pytest.importorskip("torch")
        from safetensors.torch import save_file
        from transformers import Phi3Config as HFConfig
        from transformers import Phi3ForCausalLM

        cfg_dict = dict(
            model_type="phi3",
            vocab_size=128,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=4,
            rms_norm_eps=1e-5,
            rope_theta=10000.0,
            max_position_embeddings=256,
            tie_word_embeddings=False,
            bos_token_id=0,
            eos_token_id=1,
            pad_token_id=0,
        )
        torch.manual_seed(2)
        hf_model = (
            Phi3ForCausalLM(HFConfig(**cfg_dict)).eval().to(torch.float32)
        )
        save_file(hf_model.state_dict(), str(tmp_path / "model.safetensors"))
        (tmp_path / "config.json").write_text(json.dumps(cfg_dict))

        T = 21
        rng = np.random.RandomState(3)
        token_ids = rng.randint(0, 128, T)
        with torch.no_grad():
            hf_logits = hf_model(torch.tensor(token_ids)[None]).logits[0].numpy()
        ours = run_ours(str(tmp_path), T, token_ids)
        np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-4)


class TestRegistry:
    def test_families_registered(self):
        assert set(list_models()) == {
            "llama", "mistral", "mixtral", "phi3", "qwen2", "gemma2",
        }
        for name in list_models():
            assert get_model_cls(name) is not None
        with pytest.raises(ValueError):
            get_model_cls("gpt-neox")


class TestAlibi:
    def test_alibi_model_forward_matches_oracle_and_skips_rope(self):
        """use_alibi replaces rope with the linear-bias path end-to-end
        (ref kernel support: csrc/kernels/alibi.h). The model's attention
        must equal a hand-built alibi oracle and differ from the rope run."""
        import jax
        import jax.numpy as jnp

        from atoma_infer_tpu.models.llama import Llama, LlamaConfig
        from atoma_infer_tpu.ops.attention import AttentionMetadata

        base = dict(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=1,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            max_position_embeddings=128,
            tie_word_embeddings=True,
        )
        m_alibi = Llama(LlamaConfig(**base, use_alibi=True), dtype=jnp.float32)
        m_rope = Llama(LlamaConfig(**base), dtype=jnp.float32)
        assert m_alibi.alibi is not None and m_alibi.alibi.shape == (4,)
        params = m_alibi.init_params(jax.random.PRNGKey(0))

        T = 12
        L, P_, bs, row = m_alibi.kv_cache_shape(8, 16)
        meta = AttentionMetadata(
            slot_mapping=jnp.arange(T, dtype=jnp.int32),
            block_tables=jnp.asarray([[0, 1]], jnp.int32),
            seq_lens=jnp.asarray([T], jnp.int32),
            query_start_loc=jnp.asarray([0, T], jnp.int32),
            num_seqs=jnp.asarray(1, jnp.int32),
            block_size=16,
        )
        kv = tuple(jnp.zeros((P_, bs, row), jnp.float32) for _ in range(L))
        h_a, _ = m_alibi.forward(
            params, jnp.arange(T) % 256, jnp.arange(T), kv, meta
        )
        kv2 = tuple(jnp.zeros((P_, bs, row), jnp.float32) for _ in range(L))
        h_r, _ = m_rope.forward(
            params, jnp.arange(T) % 256, jnp.arange(T), kv2, meta
        )
        assert np.isfinite(np.asarray(h_a)).all()
        # Same weights, different positional scheme → different outputs.
        assert not np.allclose(np.asarray(h_a), np.asarray(h_r), atol=1e-5)

    def test_hf_config_alibi_flag(self):
        from atoma_infer_tpu.models.llama import LlamaConfig

        cfg = LlamaConfig.from_hf_dict(
            dict(
                vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=1, num_attention_heads=4, alibi=True,
            )
        )
        assert cfg.use_alibi


class TestQwen2:
    """Qwen2 (beyond-reference family): llama forward + additive qkv biases."""

    def test_logits_match_hf(self, tmp_path):
        torch = pytest.importorskip("torch")
        from safetensors.torch import save_file
        from transformers import Qwen2Config as HFConfig
        from transformers import Qwen2ForCausalLM

        cfg_dict = dict(
            model_type="qwen2",
            vocab_size=128,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            rms_norm_eps=1e-5,
            rope_theta=10000.0,
            max_position_embeddings=256,
            tie_word_embeddings=False,
            bos_token_id=0,
            eos_token_id=1,
        )
        torch.manual_seed(3)
        hf_model = (
            Qwen2ForCausalLM(HFConfig(**cfg_dict)).eval().to(torch.float32)
        )
        # Random (non-zero) qkv biases so the bias path is actually exercised.
        with torch.no_grad():
            for layer in hf_model.model.layers:
                for proj in ("q_proj", "k_proj", "v_proj"):
                    getattr(layer.self_attn, proj).bias.normal_(0.0, 0.5)
        save_file(hf_model.state_dict(), str(tmp_path / "model.safetensors"))
        (tmp_path / "config.json").write_text(json.dumps(cfg_dict))

        T = 24
        rng = np.random.RandomState(7)
        token_ids = rng.randint(0, 128, T)
        with torch.no_grad():
            hf_logits = hf_model(torch.tensor(token_ids)[None]).logits[0].numpy()
        ours = run_ours(str(tmp_path), T, token_ids)
        np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-4)

class TestGemma2:
    """Gemma2 (beyond-reference family): zero-centered norms ×4/layer,
    GeGLU, embed scaling, attn+final logit softcaps, ALTERNATING sliding
    window — the one family combining the kernel's soft_cap and per-layer
    window features."""

    CFG = dict(
        model_type="gemma2",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,  # 2 local + 2 global layers
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        max_position_embeddings=256,
        query_pre_attn_scalar=24,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        sliding_window=16,
        hidden_activation="gelu_pytorch_tanh",
        tie_word_embeddings=True,
        bos_token_id=2,
        eos_token_id=1,
        pad_token_id=0,
    )

    def test_logits_match_hf(self, tmp_path):
        torch = pytest.importorskip("torch")
        from safetensors.torch import save_file
        from transformers import Gemma2Config as HFConfig
        from transformers import Gemma2ForCausalLM

        hf_cfg = HFConfig(**self.CFG)
        hf_cfg._attn_implementation = "eager"  # softcap needs the eager path
        torch.manual_seed(5)
        hf_model = Gemma2ForCausalLM(hf_cfg).eval().to(torch.float32)
        state = {
            k: v for k, v in hf_model.state_dict().items()
            if k != "lm_head.weight"  # tied to embed_tokens
        }
        save_file(state, str(tmp_path / "model.safetensors"))
        (tmp_path / "config.json").write_text(json.dumps(self.CFG))

        T = 40  # > sliding_window so local layers actually mask
        rng = np.random.RandomState(11)
        token_ids = rng.randint(0, 128, T)
        with torch.no_grad():
            hf_logits = hf_model(torch.tensor(token_ids)[None]).logits[0].numpy()
        ours = run_ours(str(tmp_path), T, token_ids)
        np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-4)

    def test_config_dispatch_and_layer_windows(self, tmp_path):
        (tmp_path / "config.json").write_text(json.dumps(self.CFG))
        cfg = load_hf_config(str(tmp_path))
        assert cfg.architecture == "gemma2"
        # Engine-level window must stay None: global layers need every page.
        assert cfg.sliding_window is None
        assert cfg.attn_logit_softcapping == 50.0
        assert cfg.final_logit_softcapping == 30.0
        assert cfg.tie_word_embeddings
        # Alternating pattern: even layers local, odd global (HF is_sliding).
        assert [cfg.layer_sliding_window(i) for i in range(4)] == [
            16, None, 16, None,
        ]
        from atoma_infer_tpu.models.gemma import Gemma2

        assert get_model_cls("gemma2") is Gemma2
        assert get_model_cls("Gemma2ForCausalLM") is Gemma2


class TestMixtral:
    """Mixtral sparse MoE (beyond-reference: README Roadmap #6 unchecked,
    SURVEY §2.6 EP row NO). Dense-expert einsum formulation — see
    models/mixtral.py for the decode-bandwidth rationale."""

    CFG = dict(
        model_type="mixtral",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        max_position_embeddings=256,
        num_local_experts=4,
        num_experts_per_tok=2,
        sliding_window=None,
        tie_word_embeddings=False,
        bos_token_id=0,
        eos_token_id=1,
    )

    def test_logits_match_hf(self, tmp_path):
        torch = pytest.importorskip("torch")
        from safetensors.torch import save_file
        from transformers import MixtralConfig as HFConfig
        from transformers import MixtralForCausalLM

        torch.manual_seed(9)
        hf_model = (
            MixtralForCausalLM(HFConfig(**self.CFG)).eval().to(torch.float32)
        )
        save_file(hf_model.state_dict(), str(tmp_path / "model.safetensors"))
        (tmp_path / "config.json").write_text(json.dumps(self.CFG))

        T = 24
        rng = np.random.RandomState(13)
        token_ids = rng.randint(0, 128, T)
        with torch.no_grad():
            hf_logits = hf_model(torch.tensor(token_ids)[None]).logits[0].numpy()
        ours = run_ours(str(tmp_path), T, token_ids)
        np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-4)

    def test_config_dispatch(self, tmp_path):
        (tmp_path / "config.json").write_text(json.dumps(self.CFG))
        cfg = load_hf_config(str(tmp_path))
        assert cfg.architecture == "mixtral"
        assert cfg.num_local_experts == 4
        assert cfg.num_experts_per_tok == 2
        from atoma_infer_tpu.models.mixtral import Mixtral

        assert get_model_cls("mixtral") is Mixtral
        assert get_model_cls("MixtralForCausalLM") is Mixtral

    def test_expert_parallel_matches_single_device(self):
        """EP over the CPU mesh: expert axis sharded, outputs identical to
        the single-device forward (the MoE analog of test_parallel.py's TP
        equivalence)."""
        from atoma_infer_tpu.models.mixtral import Mixtral, MixtralConfig
        from atoma_infer_tpu.parallel import (
            kv_cache_sharding,
            make_mesh,
            param_shardings,
            shard_params,
        )

        TP = 4
        if len(jax.devices()) < TP:
            pytest.skip("needs >=4 virtual devices")
        cfg = MixtralConfig(
            vocab_size=128,
            hidden_size=64,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=8,
            num_key_value_heads=4,
            head_dim=16,
            max_position_embeddings=128,
            tie_word_embeddings=True,
            num_local_experts=8,
            num_experts_per_tok=2,
        )
        model = Mixtral(cfg, dtype=jnp.float32)
        params = model.init_params(jax.random.PRNGKey(2))

        T, S, bs = 16, 2, 16
        rng = np.random.RandomState(4)
        token_ids = jnp.asarray(rng.randint(0, 128, T), jnp.int32)
        q_per_seq = T // S
        positions = jnp.tile(jnp.arange(q_per_seq, dtype=jnp.int32), S)
        tables = jnp.asarray([[2 * s, 2 * s + 1] for s in range(S)], jnp.int32)
        slots = jnp.concatenate(
            [tables[s, 0] * bs + jnp.arange(q_per_seq) for s in range(S)]
        ).astype(jnp.int32)
        meta = AttentionMetadata(
            slot_mapping=slots,
            block_tables=tables,
            seq_lens=jnp.full((S,), q_per_seq, jnp.int32),
            query_start_loc=jnp.arange(0, T + 1, q_per_seq, dtype=jnp.int32),
            num_seqs=jnp.asarray(S, jnp.int32),
            block_size=bs,
        )
        kv_cache = jnp.zeros(
            (cfg.num_layers, 8, bs, 2 * cfg.num_kv_heads * cfg.head_dim),
            jnp.float32,
        )

        hidden_ref, _ = model.forward(
            params, token_ids, positions, kv_cache, meta
        )
        logits_ref = model.compute_logits(params, hidden_ref)

        mesh = make_mesh(tp=TP, devices=jax.devices()[:TP])
        specs = param_shardings(mesh, params)
        # Expert axis sharded when divisible (8 experts / 4 shards).
        assert specs["layers"]["w1"].spec == jax.sharding.PartitionSpec(
            None, "tp", None, None
        )
        assert specs["layers"]["router"].spec == jax.sharding.PartitionSpec()
        params_ep = shard_params(mesh, params)
        kv_ep = jax.device_put(kv_cache, kv_cache_sharding(mesh))

        @jax.jit
        def step(params, token_ids, positions, kv_cache, meta):
            hidden, kv_cache = model.forward(
                params, token_ids, positions, kv_cache, meta
            )
            return model.compute_logits(params, hidden), kv_cache

        with mesh:
            logits_ep, _ = step(params_ep, token_ids, positions, kv_ep, meta)
        np.testing.assert_allclose(
            np.asarray(logits_ep), np.asarray(logits_ref), atol=2e-4, rtol=2e-4
        )


class TestQwen2Registry:
    def test_registry_and_config(self, tmp_path):
        assert "qwen2" in list_models()
        (tmp_path / "config.json").write_text(
            json.dumps(
                dict(
                    model_type="qwen2",
                    vocab_size=128,
                    hidden_size=64,
                    intermediate_size=128,
                    num_hidden_layers=2,
                    num_attention_heads=4,
                    use_sliding_window=False,
                    sliding_window=999,
                )
            )
        )
        cfg = load_hf_config(str(tmp_path))
        assert cfg.architecture == "qwen2"
        assert cfg.attention_bias is True
        # use_sliding_window=False must disable the window.
        assert cfg.sliding_window is None
        from atoma_infer_tpu.models.qwen2 import Qwen2

        assert get_model_cls("qwen2") is Qwen2
        assert get_model_cls("Qwen2ForCausalLM") is Qwen2
