"""End-to-end engine smoke on real TPU with Pallas-kernel-compatible shapes."""
import asyncio, time
import numpy as np
import jax, jax.numpy as jnp
from atoma_infer_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                    SchedulerConfig, ValidationConfig)
from atoma_infer_tpu.engine.llm_service import LlmService
from atoma_infer_tpu.entrypoints.offline import ByteTokenizer
from atoma_infer_tpu.models.llama import Llama, LlamaConfig
from atoma_infer_tpu.types import GenerateParameters, GenerateRequest

cfg = LlamaConfig(vocab_size=512, hidden_size=1024, intermediate_size=2048,
    num_hidden_layers=4, num_attention_heads=16, num_key_value_heads=8,
    head_dim=64, max_position_embeddings=2048, tie_word_embeddings=True,
    eos_token_ids=(1,), bos_token_id=0, rope_theta=10000.0, rope_scaling=None)
model = Llama(cfg, dtype=jnp.bfloat16)
params = model.init_params(jax.random.PRNGKey(0))
config = EngineConfig(
    model=ModelConfig(model_name="tiny-random", dtype="bfloat16"),
    cache=CacheConfig(block_size=32, num_device_blocks_override=256,
                      num_host_blocks_override=64),
    scheduler=SchedulerConfig(max_num_batched_tokens=1024,
                              max_num_sequences=16, max_model_len=1024),
    validation=ValidationConfig(max_input_tokens=512, max_total_tokens=1024),
)
service = LlmService.start(config, model=model, params=params,
                           tokenizer=ByteTokenizer(cfg.vocab_size))

async def go():
    task = asyncio.create_task(service.engine.run())
    futs = []
    t0 = time.time()
    for i in range(8):
        fut = await service.handle_request(GenerateRequest(
            request_id=f"r{i}", inputs=f"prompt {i} " * (3 + i),
            parameters=GenerateParameters(max_new_tokens=12)))
        futs.append(fut)
    results = await asyncio.wait_for(asyncio.gather(*futs), timeout=1500)
    dt = time.time() - t0
    service.stop(); task.cancel()
    return results, dt

results, dt = asyncio.run(go())
total = sum(len(r.outputs[0].token_ids) for r in results)
for r in results[:2]:
    print(f"  {r.request_id}: {len(r.outputs[0].token_ids)} tokens, finish={r.outputs[0].finish_reason}")
print(f"ENGINE-ON-TPU OK: {len(results)} requests, {total} tokens in {dt:.1f}s")
