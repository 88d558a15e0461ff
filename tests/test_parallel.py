"""Tensor-parallel sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 takeaway (d): distributed paths validated without real chips).

The key property: the SPMD TP forward is numerically identical to the
single-device forward — the analog of the reference's llama vs llama_nccl
equivalence, which it can only test on real multi-GPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atoma_infer_tpu.models.llama import Llama, LlamaConfig
from atoma_infer_tpu.ops.attention import AttentionMetadata
from atoma_infer_tpu.parallel import (
    kv_cache_sharding,
    make_mesh,
    param_shardings,
    shard_params,
)

TP = 4


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < TP:
        pytest.skip("needs >=4 virtual devices")
    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=4,
        head_dim=16,
        max_position_embeddings=128,
        tie_word_embeddings=True,
    )
    model = Llama(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def make_inputs(cfg, T=16, S=2, block_size=16, num_blocks=8):
    rng = np.random.RandomState(0)
    token_ids = jnp.asarray(rng.randint(0, cfg.vocab_size, T), jnp.int32)
    q_per_seq = T // S
    positions = jnp.tile(jnp.arange(q_per_seq, dtype=jnp.int32), S)
    tables = jnp.asarray(
        [[2 * s, 2 * s + 1] for s in range(S)], jnp.int32
    )
    slots = jnp.concatenate(
        [tables[s, 0] * block_size + jnp.arange(q_per_seq) for s in range(S)]
    ).astype(jnp.int32)
    meta = AttentionMetadata(
        slot_mapping=slots,
        block_tables=tables,
        seq_lens=jnp.full((S,), q_per_seq, jnp.int32),
        query_start_loc=jnp.arange(0, T + 1, q_per_seq, dtype=jnp.int32),
        num_seqs=jnp.asarray(S, jnp.int32),
        block_size=block_size,
    )
    kv_cache = jnp.zeros(
        (cfg.num_layers, num_blocks, block_size,
         2 * cfg.num_kv_heads * cfg.head_dim),
        jnp.float32,
    )
    return token_ids, positions, kv_cache, meta


class TestTensorParallel:
    def test_tp_forward_matches_single_device(self, setup):
        model, params = setup
        cfg = model.config
        token_ids, positions, kv_cache, meta = make_inputs(cfg)

        # Single-device reference.
        hidden_ref, kv_ref = model.forward(
            params, token_ids, positions, kv_cache, meta
        )
        logits_ref = model.compute_logits(params, hidden_ref)

        # TP over the mesh.
        mesh = make_mesh(tp=TP, devices=jax.devices()[:TP])
        params_tp = shard_params(mesh, params)
        kv_tp = jax.device_put(kv_cache, kv_cache_sharding(mesh))

        @jax.jit
        def step(params, token_ids, positions, kv_cache, meta):
            hidden, kv_cache = model.forward(
                params, token_ids, positions, kv_cache, meta
            )
            return model.compute_logits(params, hidden), kv_cache

        with mesh:
            logits_tp, kv_tp = step(
                params_tp, token_ids, positions, kv_tp, meta
            )

        np.testing.assert_allclose(
            np.asarray(logits_tp), np.asarray(logits_ref), atol=2e-4, rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(kv_tp), np.asarray(kv_ref), atol=1e-5, rtol=1e-5
        )

    def test_param_shardings_structure(self, setup):
        model, params = setup
        mesh = make_mesh(tp=TP, devices=jax.devices()[:TP])
        specs = param_shardings(mesh, params)
        # Column-parallel: output dim sharded.
        assert specs["layers"]["q_proj"].spec == jax.sharding.PartitionSpec(
            None, None, "tp"
        )
        # Row-parallel: input dim sharded.
        assert specs["layers"]["o_proj"].spec == jax.sharding.PartitionSpec(
            None, "tp", None
        )
        assert specs["embed"].spec == jax.sharding.PartitionSpec()

    def test_kv_cache_sharded_over_heads(self, setup):
        model, params = setup
        mesh = make_mesh(tp=TP, devices=jax.devices()[:TP])
        spec = kv_cache_sharding(mesh)
        assert spec.spec == jax.sharding.PartitionSpec(None, None, None, "tp")
