"""atoma_infer_tpu — a TPU-native LLM serving engine.

Built from scratch with the capabilities of atoma-network/atoma-infer (a Rust/CUDA
vLLM re-implementation): OpenAI-compatible HTTP serving, continuous batching with
chunked prefill and preemption, a block-paginated KV cache with copy-on-write and
host swap — re-architected for TPU on JAX/XLA with Pallas kernels and
``shard_map`` tensor parallelism over device meshes.

Layer map (mirrors the reference's, SURVEY.md §1):
  server/    — OpenAI-compatible HTTP + SSE            (ref: server/src/)
  engine/    — service admission + continuous batching (ref: backends/vllm/src/llm_{service,engine}.rs)
  core/      — scheduler + paged-KV block manager      (ref: backends/vllm/src/{scheduler,block_manager}.rs)
  executor/  — model worker, cache engine, sampling    (ref: backends/vllm/src/{model_executor,worker}.rs)
  models/    — Llama / Mistral / Phi3 in JAX           (ref: models/src/)
  ops/       — Pallas kernels + pure-JAX oracles       (ref: csrc/)
  parallel/  — mesh + sharding rules (replaces NCCL TP, ref: models/src/multi_gpu.rs)
"""

__version__ = "0.1.0"
