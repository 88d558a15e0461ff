"""Config parsing + invariant tests (ref: config.rs:388-406 invariants,
CacheConfig block math :708-718)."""

import pytest

from atoma_infer_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
    ValidationConfig,
)


def test_scheduler_invariants():
    with pytest.raises(ValueError):
        SchedulerConfig(max_num_batched_tokens=8, max_num_sequences=16)
    with pytest.raises(ValueError):
        SchedulerConfig(
            max_num_batched_tokens=512,
            max_model_len=1024,
            enable_chunked_prefill=False,
        )
    # Chunked prefill relaxes the max_model_len bound.
    SchedulerConfig(
        max_num_batched_tokens=512,
        max_num_sequences=32,
        max_model_len=4096,
        enable_chunked_prefill=True,
    )


def test_cache_config_swap_fraction_guardrails():
    with pytest.raises(ValueError):
        CacheConfig(swap_space_fraction=0.8)
    CacheConfig(swap_space_fraction=0.5)  # warns but allowed


def test_block_bytes():
    cfg = CacheConfig(block_size=16)
    # 2 (K+V) * 16 * layers * kv_heads * head_dim * dtype_size
    assert cfg.block_bytes(32, 8, 128, 2) == 2 * 16 * 32 * 8 * 128 * 2


def test_new_from_blocks_bypasses_profiling():
    cfg = CacheConfig.new_from_blocks(16, 128, 64)
    assert cfg.num_device_blocks == 128
    assert cfg.num_host_blocks == 64


def test_profile_host_blocks_positive():
    cfg = CacheConfig(block_size=16)
    cfg.profile(num_layers=2, num_kv_heads=2, head_dim=64, kv_dtype_size=2,
                devices=[])
    assert cfg.num_device_blocks is not None
    assert cfg.num_host_blocks and cfg.num_host_blocks > 0


def test_toml_roundtrip(tmp_path):
    toml = tmp_path / "config.toml"
    toml.write_text(
        """
[inference]
model_name = "meta-llama/Llama-3.2-1B"
dtype = "bfloat16"

[cache]
block_size = 16
hbm_memory_utilization = 0.85

[scheduler]
max_num_batched_tokens = 2048
max_num_sequences = 64
max_model_len = 2048

[validation]
max_input_tokens = 1024
max_total_tokens = 2048
"""
    )
    cfg = EngineConfig.from_file_path(str(toml))
    assert cfg.model.model_name == "meta-llama/Llama-3.2-1B"
    assert cfg.cache.hbm_memory_utilization == 0.85
    assert cfg.scheduler.max_num_sequences == 64
    assert cfg.validation.max_total_tokens == 2048


def test_model_config_validation():
    with pytest.raises(ValueError):
        ModelConfig(dtype="float64")
    with pytest.raises(ValueError):
        ModelConfig(quantization="int2")
    with pytest.raises(ValueError):
        ModelConfig(kv_cache_dtype="int4")
    m = ModelConfig(quantization="int8", kv_cache_dtype="int8")
    assert m.kv_dtype_size == 1


def test_validation_config_invariant():
    with pytest.raises(ValueError):
        ValidationConfig(max_input_tokens=100, max_total_tokens=100)
