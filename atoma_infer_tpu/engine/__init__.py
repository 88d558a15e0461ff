"""Engine layer: continuous batching, execution, sampling, detokenization.

TPU-native counterpart of the reference's ``backends/vllm`` engine crate
(SURVEY.md §2.2): the ``LlmEngine`` event loop (llm_engine.rs), the
``ModelWorker``/``CacheEngine`` executor (worker.rs, model_executor.rs), the
tokenizer worker pool (tokenizer.rs), request validation (validation.rs) and
the admission service (llm_service.rs).

Key architectural departure: the reference spawns one OS thread per GPU with
NCCL collectives between them (model_executor.rs:394-493); here a single SPMD
program over a ``jax.sharding.Mesh`` replaces the whole thread/rank apparatus —
one jitted step function, sharded parameters and KV cache, XLA-inserted
collectives.
"""
