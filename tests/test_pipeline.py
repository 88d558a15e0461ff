"""Pipeline parallelism: stage split + pipelined serving.

The reference has no pipeline parallelism (SURVEY.md §2.6 — TP over NCCL is
its only strategy); PP here is the TPU-native scaling extension
(parallel/pipeline.py, engine/pp_worker.py). These tests pin:

1. parameter splitting + per-stage ``forward_hidden`` chains to exactly the
   full model forward (pure function level, no meshes);
2. the FULL serving stack with pipeline_parallel_size=2 (and ×tp=2) produces
   token-identical outputs to the single-device service on a CPU mesh;
3. cohort schedulers share one block pool without leaking blocks.
"""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atoma_infer_tpu.models.llama import Llama, LlamaConfig
from atoma_infer_tpu.ops.attention import AttentionMetadata
from atoma_infer_tpu.parallel.pipeline import (
    split_params,
    stage_layer_bounds,
)

from test_engine_tp import PROMPTS, generate_all, make_service


def tiny_model(num_layers=4, tie=True):
    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=num_layers,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        rope_theta=10000.0,
        rope_scaling=None,
        tie_word_embeddings=tie,
        eos_token_ids=(1,),
        bos_token_id=0,
    )
    model = Llama(cfg, dtype=jnp.float32)
    return model, model.init_params(jax.random.PRNGKey(7))


def decode_meta(num_seqs, block_size=16, pages=4):
    tables = jnp.arange(num_seqs * pages, dtype=jnp.int32).reshape(
        num_seqs, pages
    )
    seq_lens = jnp.full((num_seqs,), 3, jnp.int32)
    slots = tables[:, 0] * block_size + 2
    return AttentionMetadata(
        slot_mapping=slots,
        block_tables=tables,
        seq_lens=seq_lens,
        query_start_loc=jnp.arange(num_seqs + 1, dtype=jnp.int32),
        num_seqs=jnp.asarray(num_seqs, jnp.int32),
        block_size=block_size,
    )


class TestStageSplit:
    def test_bounds_cover_all_layers(self):
        assert stage_layer_bounds(7, 2) == [(0, 4), (4, 7)]
        assert stage_layer_bounds(8, 4) == [
            (0, 2), (2, 4), (4, 6), (6, 8),
        ]

    @pytest.mark.parametrize("tie", [True, False])
    def test_stage_chain_matches_full_forward(self, tie):
        model, params = tiny_model(num_layers=4, tie=tie)
        stages = split_params(params, 2)
        assert "embed" in stages[0]
        if tie:
            assert "embed" in stages[1] and "lm_head" not in stages[1]
        else:
            assert "lm_head" in stages[1]
        assert "final_norm" in stages[1] and "final_norm" not in stages[0]

        S, bs, pages = 3, 16, 4
        meta = decode_meta(S, bs, pages)
        tokens = jnp.asarray([5, 9, 250], jnp.int32)
        positions = jnp.asarray([2, 2, 2], jnp.int32)
        num_pages = S * pages
        row = 2 * model.config.num_kv_heads * model.config.head_dim

        def fresh_cache(n):
            return tuple(
                jnp.zeros((num_pages, bs, row), jnp.float32)
                for _ in range(n)
            )

        # Full model in one call.
        hidden_full, _ = model.forward(
            params, tokens, positions, fresh_cache(4), meta
        )
        logits_full = model.compute_logits(params, hidden_full)

        # Two chained stages.
        h = model.embed_tokens(stages[0], tokens)
        h, _ = model.forward_hidden(
            stages[0], h, positions, fresh_cache(2), meta
        )
        h, _ = model.forward_hidden(
            stages[1], h, positions, fresh_cache(2), meta
        )
        logits_pp = model.compute_logits(stages[1], h)

        np.testing.assert_allclose(
            np.asarray(logits_pp), np.asarray(logits_full), rtol=1e-5, atol=1e-5
        )

    def test_quantized_params_split(self):
        from atoma_infer_tpu.ops.quant import QuantizedTensor, quantize_weight

        model, params = tiny_model(num_layers=4)
        # Stacked [L, in, out] quantized layer, as weights.py builds them:
        # per-layer quantize, stack qweight/scales.
        per_layer = [
            quantize_weight(w, bits=8, group_size=32)
            for w in params["layers"]["gate_proj"]
        ]
        params["layers"]["gate_proj"] = QuantizedTensor(
            qweight=jnp.stack([q.qweight for q in per_layer]),
            scales=jnp.stack([q.scales for q in per_layer]),
            bits=8,
            group_size=32,
        )
        stages = split_params(params, 2)
        q0 = stages[0]["layers"]["gate_proj"]
        assert q0.qweight.shape[0] == 2 and q0.scales.shape[0] == 2
        assert q0.bits == 8


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
class TestServingPipelineParallel:
    def test_pp2_token_identical_to_single_device(self):
        base = asyncio.run(generate_all(make_service(tp=1), PROMPTS))
        pp = asyncio.run(
            generate_all(
                make_service(tp=1, pipeline_parallel_size=2), PROMPTS
            )
        )
        for r1, r2 in zip(base, pp):
            assert r1.outputs[0].token_ids == r2.outputs[0].token_ids
            assert r1.outputs[0].output_text == r2.outputs[0].output_text

    def test_pp2_tp2_token_identical(self):
        base = asyncio.run(generate_all(make_service(tp=1), PROMPTS[:2]))
        pp = asyncio.run(
            generate_all(
                make_service(tp=2, pipeline_parallel_size=2), PROMPTS[:2]
            )
        )
        for r1, r2 in zip(base, pp):
            assert r1.outputs[0].token_ids == r2.outputs[0].token_ids

    def test_pp2_int8_kv_matches(self):
        base = asyncio.run(
            generate_all(
                make_service(tp=1, kv_cache_dtype="int8"), PROMPTS[:2]
            )
        )
        pp = asyncio.run(
            generate_all(
                make_service(
                    tp=1, pipeline_parallel_size=2, kv_cache_dtype="int8"
                ),
                PROMPTS[:2],
            )
        )
        for r1, r2 in zip(base, pp):
            assert r1.outputs[0].token_ids == r2.outputs[0].token_ids

    def test_cohorts_share_block_pool_without_leaks(self):
        service = make_service(tp=1, pipeline_parallel_size=2)
        engine = service.engine
        assert len(engine.schedulers) == 2
        assert (
            engine.schedulers[0].block_manager
            is engine.schedulers[1].block_manager
        )
        asyncio.run(generate_all(service, PROMPTS))
        bm = engine.schedulers[0].block_manager
        assert (
            bm.get_num_free_device_blocks()
            == service.config.cache.num_device_blocks
        )

    def test_pp_stage_caches_cover_all_layers(self):
        service = make_service(tp=1, pipeline_parallel_size=2)
        worker = service.engine.worker
        total = sum(ce.num_layers for ce in worker.cache_engines)
        assert total == 2  # tiny model has 2 layers
        service.stop()
