"""LLM service: startup orchestration + request admission.

Ref: backends/vllm/src/llm_service.rs — orchestrates startup (model fetch →
load → profile → engine boot, :116-245), runs the admission loop (validate →
build Sequence/SequenceGroup with per-request sampling params → forward to
engine, :318-388), and shutdown (:404-442).

Two-phase startup ordering preserved from the reference (SURVEY.md §3.1): KV
cache sizing profiles free HBM *after* weights are resident.
"""

from __future__ import annotations

import asyncio
import itertools
import logging
import os
import shutil
import time
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import EngineConfig
from ..core.scheduler import Scheduler
from ..sequence import Sequence, SequenceGroup
from ..types import GenerateRequest
from .cache_engine import CacheEngine
from .llm_engine import LlmEngine
from .tokenizer import TokenizerPool
from .validation import Validation
from .worker import ModelWorker
from ..utils.tracing import instrument

logger = logging.getLogger(__name__)

_SEQ_COUNTER = itertools.count()


def _load_tokenizer(model_dir: str):
    from tokenizers import Tokenizer

    path = os.path.join(model_dir, "tokenizer.json")
    return Tokenizer.from_file(path)


def resolve_model_dir(config) -> str:
    """Model weights directory: local path, cache dir, or HF download
    (ref: models/llama.rs:39-71 fetch)."""
    name = config.model.model_name
    if os.path.isdir(name):
        return name
    local = os.path.join(config.model.cache_dir, name.replace("/", "--"))
    if os.path.isdir(local):
        return local
    try:
        from huggingface_hub import snapshot_download  # type: ignore

        return snapshot_download(
            name,
            revision=config.model.revision,
            cache_dir=config.model.cache_dir,
            token=config.model.api_key,
        )
    except Exception as e:  # pragma: no cover - network-dependent
        raise FileNotFoundError(
            f"model {name!r} not found locally and HF download failed: {e}"
        )


class LlmService:
    """Boots the stack and admits requests (ref: llm_service.rs:102-296)."""

    def __init__(
        self,
        config: EngineConfig,
        engine: LlmEngine,
        validation: Validation,
        tokenizer_pool: TokenizerPool,
        block_size: int,
        eos_token_ids,
    ):
        self.config = config
        self.engine = engine
        self.validation = validation
        self.tokenizer_pool = tokenizer_pool
        self.block_size = block_size
        self.eos_token_ids = eos_token_ids

    # ----------------------------------------------------------------- startup
    @classmethod
    def start(
        cls,
        config: EngineConfig,
        *,
        model=None,
        params=None,
        tokenizer=None,
        model_dir: Optional[str] = None,
    ) -> "LlmService":
        """Build the full stack (ref: llm_service.rs:102-245).

        ``model``/``params``/``tokenizer`` may be injected for tests (the
        MockModel pattern, ref: tests/mod.rs:35-164); otherwise weights load
        from ``model_dir``/HF.
        """
        t0 = time.monotonic()
        # Multi-host: join the cross-host runtime BEFORE any jax.devices()
        # call so the mesh below spans every host's chips
        # (docs/architecture.md §multi-host; replicated scheduler design).
        if (config.model.num_hosts or 1) > 1:
            from ..parallel.distributed import init_distributed

            init_distributed(
                config.model.coordinator_address,
                config.model.num_hosts,
                config.model.host_id,
            )
        if model is None or params is None or tokenizer is None:
            if config.model.model_name == "tiny-random":
                # Random-weight smoke model (tests + the verify drive).
                from ..entrypoints.offline import build_tiny_random

                model, params, tokenizer = build_tiny_random()
            else:
                from ..models.registry import get_model_cls
                from ..models.weights import (
                    load_hf_config,
                    load_llama_params,
                )

                model_dir = model_dir or resolve_model_dir(config)
                model_cfg = load_hf_config(model_dir)
                dtype = jnp.bfloat16 if config.model.dtype == "bfloat16" else (
                    jnp.float32 if config.model.dtype == "float32"
                    else jnp.float16
                )
                arch = model_cfg.architecture or "llama"
                model = get_model_cls(arch)(model_cfg, dtype=dtype)
                params = load_llama_params(
                    model_dir,
                    model_cfg,
                    dtype=dtype,
                    quantization=config.model.quantization,
                )
                tokenizer = _load_tokenizer(model_dir)
            logger.info(
                "model loaded in %.1fs", time.monotonic() - t0
            )

        cfg = model.config

        # Tensor parallelism: build the mesh, shard weights + KV over it
        # (ref: model_executor.rs:394-545 NCCL dispatcher + llama_nccl.rs
        # sharded load — here one SPMD program over a jax mesh).
        tp = config.model.tensor_parallel_size or 1
        pp = config.model.pipeline_parallel_size or 1
        mesh = None
        kv_sharding = None
        if pp > 1:
            return cls._start_pipelined(
                config, model, params, tokenizer, tp, pp, t0
            )
        if tp > 1:
            from ..parallel import (
                kv_cache_layer_sharding,
                make_mesh,
                shard_params,
            )

            devices = jax.devices()
            if config.model.num_devices:
                devices = devices[: config.model.num_devices]
            if tp > len(devices):
                raise ValueError(
                    f"tensor_parallel_size {tp} > visible devices "
                    f"({len(devices)})"
                )
            # q heads must divide tp; kv heads must divide tp OR tp divide
            # into kv heads — when tp > kv_heads the model replicates each
            # kv head across tp//Hk shards (models/llama.py kv_repeat).
            if cfg.num_attention_heads % tp or (
                cfg.num_kv_heads % tp and tp % cfg.num_kv_heads
            ):
                raise ValueError(
                    f"head counts (q={cfg.num_attention_heads}, "
                    f"kv={cfg.num_kv_heads}) incompatible with "
                    f"tensor_parallel_size {tp}"
                )
            mesh = make_mesh(tp=tp, devices=devices[:tp])
            params = shard_params(mesh, params)
            kv_sharding = kv_cache_layer_sharding(mesh)
            model.mesh = mesh
            logger.info(
                "tensor parallelism over %d devices (mesh %s)",
                tp,
                dict(mesh.shape),
            )

        # Profile KV pools AFTER weights are resident (ref: config.rs:624-625).
        # effective_kv_heads accounts for KV replication when tp > Hk.
        eff_kv_heads = getattr(model, "effective_kv_heads", cfg.num_kv_heads)
        config.cache.profile(
            cfg.num_layers,
            eff_kv_heads,
            cfg.head_dim,
            config.model.kv_dtype_size,
        )

        kv_dtype = (
            jnp.int8 if config.model.kv_cache_dtype == "int8"
            # FP8 KV stores e4m3 without scale pages (XLA attention path —
            # Mosaic has no fp8 vector ops on v5e; int8-with-scales is the
            # fused-kernel option at the same footprint).
            else jnp.float8_e4m3fn if config.model.kv_cache_dtype == "fp8"
            else model.dtype
        )
        cache_engine = CacheEngine(
            num_layers=cfg.num_layers,
            num_kv_heads=eff_kv_heads,
            head_dim=cfg.head_dim,
            block_size=config.cache.block_size,
            num_device_blocks=config.cache.num_device_blocks,
            num_host_blocks=config.cache.num_host_blocks or 0,
            dtype=kv_dtype,
            sharding=kv_sharding,
        )
        worker = ModelWorker(
            model, params, cache_engine, config.scheduler, config.cache
        )
        block_manager = cls._build_block_manager(config)
        scheduler = Scheduler(
            config.scheduler, config.cache, block_manager=block_manager
        )
        tokenizer_pool = TokenizerPool(
            tokenizer, config.model.num_tokenizer_workers
        )
        validation = Validation(config.validation, tokenizer_pool)
        engine = LlmEngine(
            scheduler,
            worker,
            tokenizer,
            cfg.eos_token_ids,
            config.scheduler.max_model_len,
            async_scheduling=config.scheduler.async_scheduling,
            async_depth=config.scheduler.async_depth,
        )
        return cls(
            config,
            engine,
            validation,
            tokenizer_pool,
            config.cache.block_size,
            cfg.eos_token_ids,
        )

    @classmethod
    def _start_pipelined(
        cls, config: EngineConfig, model, params, tokenizer, tp: int, pp: int, t0
    ) -> "LlmService":
        """Pipeline-parallel startup: split layers into ``pp`` stages, each
        tensor-parallel over its own tp-mesh; one scheduler per cohort
        sharing a single block pool (parallel/pipeline.py docstring for the
        execution model — beyond the reference, which is TP-only,
        SURVEY.md §2.6)."""
        from ..parallel.pipeline import (
            make_stage_meshes,
            shard_stage_params,
            split_params,
            stage_layer_bounds,
        )
        from ..parallel import kv_cache_layer_sharding
        from .pp_worker import PipelinedModelWorker

        cfg = model.config
        if cfg.num_attention_heads % tp or (
            cfg.num_kv_heads % tp and tp % cfg.num_kv_heads
        ):
            raise ValueError(
                f"head counts (q={cfg.num_attention_heads}, "
                f"kv={cfg.num_kv_heads}) incompatible with "
                f"tensor_parallel_size {tp}"
            )
        if pp > cfg.num_layers:
            raise ValueError(
                f"pipeline_parallel_size {pp} > num_layers {cfg.num_layers}"
            )
        devices = jax.devices()
        if config.model.num_devices:
            devices = devices[: config.model.num_devices]
        stage_meshes = make_stage_meshes(pp, tp, devices)
        bounds = stage_layer_bounds(cfg.num_layers, pp)
        stage_params = shard_stage_params(split_params(params, pp), stage_meshes)
        if tp > 1:
            # kv_repeat/effective_kv_heads read the (uniform) stage tp width.
            model.mesh = stage_meshes[0]
        logger.info(
            "pipeline parallelism: %d stages × tp=%d (layer bounds %s)",
            pp, tp, bounds,
        )

        # Per-device HBM holds only its stage's layers — profile with the
        # largest stage so every stage fits the same global block pool.
        eff_kv_heads = getattr(model, "effective_kv_heads", cfg.num_kv_heads)
        max_stage_layers = max(hi - lo for lo, hi in bounds)
        config.cache.profile(
            max_stage_layers,
            eff_kv_heads,
            cfg.head_dim,
            config.model.kv_dtype_size,
        )

        kv_dtype = (
            jnp.int8 if config.model.kv_cache_dtype == "int8"
            else jnp.float8_e4m3fn if config.model.kv_cache_dtype == "fp8"
            else model.dtype
        )
        cache_engines = [
            CacheEngine(
                num_layers=hi - lo,
                num_kv_heads=eff_kv_heads,
                head_dim=cfg.head_dim,
                block_size=config.cache.block_size,
                num_device_blocks=config.cache.num_device_blocks,
                num_host_blocks=config.cache.num_host_blocks or 0,
                dtype=kv_dtype,
                sharding=kv_cache_layer_sharding(stage_meshes[s]),
            )
            for s, (lo, hi) in enumerate(bounds)
        ]
        worker = PipelinedModelWorker(
            model,
            stage_params,
            cache_engines,
            config.scheduler,
            config.cache,
            stage_meshes,
        )
        # One scheduler per cohort over ONE shared block pool: block ids are
        # global (each stage's cache engine holds the same pool for its
        # layers), so cohorts allocate from a single manager.
        block_manager = cls._build_block_manager(config)
        schedulers = [
            Scheduler(
                config.scheduler, config.cache, block_manager=block_manager
            )
            for _ in range(pp)
        ]
        tokenizer_pool = TokenizerPool(
            tokenizer, config.model.num_tokenizer_workers
        )
        validation = Validation(config.validation, tokenizer_pool)
        engine = LlmEngine(
            schedulers[0],
            worker,
            tokenizer,
            cfg.eos_token_ids,
            config.scheduler.max_model_len,
            extra_schedulers=schedulers[1:],
        )
        return cls(
            config,
            engine,
            validation,
            tokenizer_pool,
            config.cache.block_size,
            cfg.eos_token_ids,
        )

    @classmethod
    def _build_block_manager(cls, config: EngineConfig):
        """Native (C++) block manager when enabled + compatible, else None
        (the Scheduler builds the Python manager itself)."""
        if (
            config.scheduler.use_native_core
            and config.scheduler.num_speculative_tokens
        ):
            logger.info(
                "speculative decoding enabled — using the Python block "
                "manager (lookahead slots spanning shared blocks need its "
                "multi-block copy-on-write)"
            )
            return None
        if not config.scheduler.use_native_core:
            return None
        try:
            from ..native.block_manager import NativeBlockSpaceManager

            manager = NativeBlockSpaceManager(
                block_size=config.cache.block_size,
                num_device_blocks=config.cache.num_device_blocks or 0,
                num_host_blocks=config.cache.num_host_blocks or 0,
                sliding_window=config.cache.sliding_window,
                enable_prefix_caching=config.cache.enable_prefix_caching,
            )
            logger.info("using native (C++) block-manager core")
            return manager
        except Exception as e:
            logger.warning(
                "native core unavailable (%s); using Python block manager", e
            )
            return None

    # --------------------------------------------------------------- admission
    @instrument("service.handle_request")
    async def handle_request(
        self,
        request: GenerateRequest,
        *,
        stream: bool = False,
    ):
        """Validate → sequences → engine (ref: llm_service.rs:318-388).

        Returns an awaitable response future, or (future, stream_queue) when
        streaming.
        """
        valid = await self.validation.validate(request)

        eos = self.eos_token_ids
        eos_id = (
            (eos[0] if eos else None)
            if isinstance(eos, (list, tuple))
            else eos
        )
        # Admit best_of parallel candidates (ref: llm_service.rs:374-388);
        # the engine returns the top-n by cumulative logprob at finish.
        num_seqs = max(valid.best_of, valid.n, 1)
        sequences = [
            Sequence(
                seq_id=next(_SEQ_COUNTER),
                prompt=valid.inputs,
                prompt_token_ids=list(valid.input_token_ids),
                block_size=self.block_size,
                eos_token_id=eos_id,
            )
            for _ in range(num_seqs)
        ]
        group = SequenceGroup(
            request_id=valid.request_id,
            sequences=sequences,
            next_token_chooser_params=valid.parameters,
            stopping_criteria=valid.stopping_criteria,
            logprobs=valid.logprobs,
            best_of=valid.best_of,
            top_n_tokens=valid.top_n_tokens,
        )
        group.num_return = max(valid.n, 1)
        loop = asyncio.get_running_loop()
        future: asyncio.Future = loop.create_future()
        queue: Optional[asyncio.Queue] = asyncio.Queue() if stream else None
        self.engine.add_request(group, future, queue)
        if stream:
            return future, queue
        return future

    # ----------------------------------------------------------------- warmup
    async def warmup(
        self,
        *,
        num_seqs: Optional[int] = None,
        prompt_len: int = 64,
        max_new: Optional[int] = None,
        waves: int = 2,
    ) -> float:
        """Pre-compile and pre-load the serving executables before traffic.

        XLA compiles one program per bucket shape, and remote TPU runtimes
        additionally LOAD each executable on first dispatch (tens of seconds
        per program through a tunneled runtime) — without this, those stalls
        land on the first real requests (the serving analog of the
        reference's two-phase profile-then-serve startup,
        /root/reference/backends/vllm/src/llm_service.rs:116-245). Drives
        ``waves`` synthetic request waves through the FULL engine at the
        configured steady-state shapes: the max-batch prefill and decode
        buckets, block-boundary table refresh, sampling and detokenize.
        Two waves by default — the second wave's prefill consumes
        step-output KV buffers whose layouts key a retrace the first wave
        cannot reach (see benchmarks/engine_decode_bench.py).

        Call with the engine loop running (``asyncio.create_task(
        service.engine.run())``). Returns the wall seconds spent.
        """
        import time as _time

        import numpy as np

        from ..types import GenerateParameters, GenerateRequest

        S = num_seqs or self.config.scheduler.max_num_sequences
        # Cross at least one block boundary so the decode fast path's
        # table-refresh branch compiles/warms too.
        N = max_new or (self.block_size + 2)
        rng = np.random.default_rng(0)
        t0 = _time.monotonic()
        for wave in range(waves):
            futs = []
            for i in range(S):
                body = bytes(
                    rng.integers(32, 127, size=prompt_len, dtype=np.uint8)
                ).decode("latin-1")
                futs.append(
                    await self.handle_request(
                        GenerateRequest(
                            request_id=f"_warmup-{wave}-{i}",
                            inputs=body,
                            parameters=GenerateParameters(max_new_tokens=N),
                        )
                    )
                )
            await asyncio.gather(*futs)
        dt = _time.monotonic() - t0
        logger.info(
            "warmup: %d waves x %d seqs x %d tokens in %.1fs",
            waves, S, N, dt,
        )
        return dt

    # ---------------------------------------------------------------- shutdown
    def stop(self) -> None:
        """Graceful shutdown (ref: llm_service.rs:404-442)."""
        self.engine.stop()
        self.tokenizer_pool.shutdown()
        if self.config.model.flush_storage:
            shutil.rmtree(self.config.model.cache_dir, ignore_errors=True)
