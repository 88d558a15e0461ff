"""Tensor parallelism wired through the FULL serving stack.

Runs LlmService → LlmEngine → Scheduler → ModelWorker on a 4-device CPU
mesh (conftest's virtual devices) and asserts token-identical outputs vs
the single-device service — the serving-integrated analog of the
reference's NCCL path (ref: backends/vllm/src/model_executor.rs:394-545,
models/src/llama_nccl.rs:144-181).
"""

import asyncio

import jax
import jax.numpy as jnp
import pytest

from atoma_infer_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
    ValidationConfig,
)
from atoma_infer_tpu.engine.llm_service import LlmService
from atoma_infer_tpu.entrypoints.offline import ByteTokenizer
from atoma_infer_tpu.models.llama import Llama, LlamaConfig
from atoma_infer_tpu.types import GenerateParameters, GenerateRequest


def build_tp_model(kv_heads: int = 4):
    """Tiny model whose head counts divide a 4-way tp axis."""
    cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=kv_heads,
        head_dim=32,
        max_position_embeddings=2048,
        rope_theta=10000.0,
        rope_scaling=None,
        tie_word_embeddings=True,
        eos_token_ids=(1,),
        bos_token_id=0,
    )
    model = Llama(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params, ByteTokenizer(cfg.vocab_size)


def make_service(
    tp: int,
    kv_cache_dtype=None,
    kv_heads: int = 4,
    pipeline_parallel_size: int = 1,
    **sched_overrides,
) -> LlmService:
    model, params, tokenizer = build_tp_model(kv_heads)
    sched = dict(
        max_num_batched_tokens=512,
        max_num_sequences=16,
        max_model_len=512,
        enable_chunked_prefill=False,
    )
    sched.update(sched_overrides)
    config = EngineConfig(
        model=ModelConfig(
            model_name="tiny-random",
            dtype="float32",
            tensor_parallel_size=tp,
            pipeline_parallel_size=pipeline_parallel_size,
            kv_cache_dtype=kv_cache_dtype,
        ),
        cache=CacheConfig(
            block_size=16,
            num_device_blocks_override=128,
            num_host_blocks_override=32,
        ),
        scheduler=SchedulerConfig(**sched),
        validation=ValidationConfig(max_input_tokens=256, max_total_tokens=512),
    )
    return LlmService.start(
        config, model=model, params=params, tokenizer=tokenizer
    )


async def generate_all(service, prompts, max_new_tokens=12):
    task = asyncio.create_task(service.engine.run())
    futs = [
        await service.handle_request(
            GenerateRequest(
                request_id=f"req-{i}",
                inputs=p,
                parameters=GenerateParameters(
                    max_new_tokens=max_new_tokens, do_sample=False
                ),
            )
        )
        for i, p in enumerate(prompts)
    ]
    results = await asyncio.wait_for(asyncio.gather(*futs), timeout=180)
    service.stop()
    task.cancel()
    return results


PROMPTS = [
    "tensor parallel serving test",
    "a second, rather longer prompt that spans multiple KV blocks " * 3,
    "short",
]


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
class TestServingTensorParallel:
    def test_token_identical_to_single_device(self):
        base = asyncio.run(generate_all(make_service(tp=1), PROMPTS))
        tp = asyncio.run(generate_all(make_service(tp=4), PROMPTS))
        for r1, r4 in zip(base, tp):
            assert r1.outputs[0].token_ids == r4.outputs[0].token_ids
            assert r1.outputs[0].output_text == r4.outputs[0].output_text

    def test_tp_int8_kv_matches_single_device(self):
        base = asyncio.run(
            generate_all(make_service(tp=1, kv_cache_dtype="int8"), PROMPTS[:2])
        )
        tp = asyncio.run(
            generate_all(make_service(tp=4, kv_cache_dtype="int8"), PROMPTS[:2])
        )
        for r1, r4 in zip(base, tp):
            assert r1.outputs[0].token_ids == r4.outputs[0].token_ids

    def test_tp_chunked_prefill(self):
        base = asyncio.run(
            generate_all(
                make_service(
                    tp=1,
                    enable_chunked_prefill=True,
                    max_num_batched_tokens=64,
                ),
                PROMPTS[:2],
            )
        )
        tp = asyncio.run(
            generate_all(
                make_service(
                    tp=4,
                    enable_chunked_prefill=True,
                    max_num_batched_tokens=64,
                ),
                PROMPTS[:2],
            )
        )
        for r1, r4 in zip(base, tp):
            assert r1.outputs[0].token_ids == r4.outputs[0].token_ids

    def test_tp_rejects_bad_head_divisibility(self):
        with pytest.raises(ValueError, match="incompatible"):
            make_service(tp=3)

    def test_tp_wider_than_kv_heads_replicates(self):
        """GQA with tp > kv_heads (the 70B-on-16-chips shape): each kv head
        is replicated across tp//Hk shards (models/llama.py kv_repeat) and
        outputs stay token-identical to single-device."""
        base = asyncio.run(
            generate_all(make_service(tp=1, kv_heads=2), PROMPTS[:2])
        )
        tp = asyncio.run(
            generate_all(make_service(tp=4, kv_heads=2), PROMPTS[:2])
        )
        for r1, r4 in zip(base, tp):
            assert r1.outputs[0].token_ids == r4.outputs[0].token_ids
        # The replicated cache row dim is 2·(Hk·repeat)·D = 2·4·32.
        svc = make_service(tp=4, kv_heads=2)
        assert svc.engine.worker.cache_engine.kv_cache[0].shape[2] == 256
        svc.stop()

    def test_worker_state_stays_sharded(self):
        """KV cache buffers must remain TP-sharded across steps (no silent
        gather-to-host or replication)."""
        from jax.sharding import PartitionSpec as P

        service = make_service(tp=4)
        asyncio.run(generate_all(service, PROMPTS[:1]))
        cache = service.engine.worker.cache_engine.kv_cache
        for layer in cache:
            spec = layer.sharding.spec
            assert tuple(spec) == (None, None, "tp"), spec
