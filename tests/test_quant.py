"""Weight-only INT8/INT4 quantization tests (beyond the reference —
BASELINE.json configs #3-5). Gates: dequant round-trip error bounds and
quantized-matmul agreement with the dequantized dense matmul."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atoma_infer_tpu.ops.quant import (
    QuantizedTensor,
    dequantize_kv,
    dequantize_weight,
    quantize_kv,
    quantize_weight,
    quantized_matmul,
)


def _w(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


class TestWeightQuant:
    @pytest.mark.parametrize("bits,tol", [(8, 0.03), (4, 0.4)])
    def test_roundtrip_error(self, bits, tol):
        w = _w((256, 128))
        q = quantize_weight(w, bits=bits)
        deq = dequantize_weight(q, dtype=jnp.float32)
        # Symmetric absmax quant: error bounded by scale/2 per group.
        err = np.abs(np.asarray(deq) - np.asarray(w))
        assert err.max() < tol

    @pytest.mark.parametrize("bits", [8, 4])
    def test_matmul_matches_dequant(self, bits):
        w = _w((256, 64), seed=1)
        x = _w((8, 256), seed=2)
        q = quantize_weight(w, bits=bits)
        got = quantized_matmul(x, q)
        want = x @ dequantize_weight(q, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2
        )

    def test_int4_packing_shape(self):
        w = _w((256, 64))
        q = quantize_weight(w, bits=4)
        assert q.qweight.shape == (128, 64)  # two values per byte
        assert q.in_dim == 256
        assert q.out_dim == 64

    def test_grouped_scales_shape(self):
        w = _w((256, 64))
        q = quantize_weight(w, bits=8, group_size=64)
        assert q.scales.shape == (4, 64)

    def test_degenerate_group(self):
        # in_dim not divisible by group_size → single group.
        w = _w((100, 32))
        q = quantize_weight(w, bits=8, group_size=128)
        assert q.scales.shape == (1, 32)
        deq = dequantize_weight(q, dtype=jnp.float32)
        assert np.abs(np.asarray(deq) - np.asarray(w)).max() < 0.05

    def test_pytree_registration(self):
        w = _w((128, 64))
        q = quantize_weight(w, bits=8)
        leaves, treedef = jax.tree_util.tree_flatten(q)
        assert len(leaves) == 2  # qweight, scales
        q2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert q2.bits == 8

    def test_quantized_model_logits_close_to_dense(self):
        """INT8 weight-only model vs bf16: logprob drift gate
        (BASELINE north-star: logprobs matched to bf16)."""
        from atoma_infer_tpu.models.llama import Llama, LlamaConfig
        from atoma_infer_tpu.ops.attention import AttentionMetadata

        cfg = LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=8,
            num_key_value_heads=4, head_dim=16,
            max_position_embeddings=64, tie_word_embeddings=True,
        )
        model = Llama(cfg, dtype=jnp.float32)
        params = model.init_params(jax.random.PRNGKey(0))
        qparams = dict(params)
        qparams["layers"] = {
            k: (
                jax.vmap(lambda w: quantize_weight(w, 8))(v)
                if k.endswith("_proj")
                else v
            )
            for k, v in params["layers"].items()
        }

        T = 16
        tokens = jnp.arange(T, dtype=jnp.int32) % cfg.vocab_size
        positions = jnp.arange(T, dtype=jnp.int32)
        kv = jnp.zeros(model.kv_cache_shape(4, 16), jnp.float32)
        meta = AttentionMetadata(
            slot_mapping=jnp.arange(T, dtype=jnp.int32),
            block_tables=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
            seq_lens=jnp.asarray([T], jnp.int32),
            query_start_loc=jnp.asarray([0, T], jnp.int32),
            num_seqs=jnp.asarray(1, jnp.int32),
            block_size=16,
        )
        h_dense, _ = model.forward(params, tokens, positions, kv, meta)
        h_quant, _ = model.forward(qparams, tokens, positions, kv, meta)
        lp_dense = jax.nn.log_softmax(model.compute_logits(params, h_dense))
        lp_quant = jax.nn.log_softmax(model.compute_logits(qparams, h_quant))
        # Top-1 agreement and bounded logprob drift.
        top_dense = np.asarray(jnp.argmax(lp_dense, -1))
        top_quant = np.asarray(jnp.argmax(lp_quant, -1))
        assert (top_dense == top_quant).mean() >= 0.9
        drift = np.abs(np.asarray(lp_dense) - np.asarray(lp_quant)).mean()
        assert drift < 0.1


class TestKvQuant:
    def test_kv_roundtrip(self):
        kv = _w((16, 4, 64))
        q, scale = quantize_kv(kv)
        assert q.dtype == jnp.int8
        deq = dequantize_kv(q, scale, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(deq), np.asarray(kv), atol=0.05, rtol=0.05
        )

    def test_oracle_accepts_kv_scales(self):
        """The XLA oracle dequantizes per-slot-scaled caches."""
        from atoma_infer_tpu.ops.reference import ragged_paged_attention_xla

        rng = np.random.default_rng(0)
        T, H, D, bs = 4, 2, 32, 4
        ns = 4 * bs
        k = jnp.asarray(rng.standard_normal((ns, H, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((ns, H, D)), jnp.float32)
        qk, sk = quantize_kv(k)
        qv, sv = quantize_kv(v)
        # Reduce to one scale per slot (the oracle's contract).
        sk1 = sk.max(axis=1)
        sv1 = sv.max(axis=1)
        qk1, _ = jnp.clip(jnp.round(k / sk1[:, None, None]), -127, 127), None
        qv1 = jnp.clip(jnp.round(v / sv1[:, None, None]), -127, 127)
        q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
        tables = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
        seq_lens = jnp.asarray([T], jnp.int32)
        qsl = jnp.asarray([0, T], jnp.int32)
        out_fp = ragged_paged_attention_xla(
            q, k, v, tables, seq_lens, qsl,
            scale=D**-0.5, block_size=bs,
        )
        out_q = ragged_paged_attention_xla(
            q, qk1.astype(jnp.int8), qv1.astype(jnp.int8),
            tables, seq_lens, qsl,
            scale=D**-0.5, block_size=bs,
            k_scale=sk1, v_scale=sv1,
        )
        np.testing.assert_allclose(
            np.asarray(out_q), np.asarray(out_fp), atol=0.05, rtol=0.05
        )


class TestInt8KvCacheModel:
    def test_int8_cache_close_to_bf16(self):
        """Full model forward with INT8 paged KV vs dense cache: top-1
        agreement + bounded logprob drift (BASELINE config #3 gate)."""
        import jax
        from atoma_infer_tpu.models.llama import Llama, LlamaConfig
        from atoma_infer_tpu.ops.attention import AttentionMetadata

        cfg = LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=8,
            num_key_value_heads=4, head_dim=16,
            max_position_embeddings=64, tie_word_embeddings=True,
        )
        model = Llama(cfg, dtype=jnp.float32)
        params = model.init_params(jax.random.PRNGKey(0))
        T, bs = 24, 16
        tokens = (jnp.arange(T, dtype=jnp.int32) * 7) % cfg.vocab_size
        positions = jnp.arange(T, dtype=jnp.int32)
        meta = AttentionMetadata(
            slot_mapping=jnp.arange(T, dtype=jnp.int32),
            block_tables=jnp.asarray([[0, 1]], jnp.int32),
            seq_lens=jnp.asarray([T], jnp.int32),
            query_start_loc=jnp.asarray([0, T], jnp.int32),
            num_seqs=jnp.asarray(1, jnp.int32),
            block_size=bs,
        )
        kv_f = jnp.zeros(model.kv_cache_shape(4, bs), jnp.float32)
        h_f, _ = model.forward(params, tokens, positions, kv_f, meta)
        lp_f = jax.nn.log_softmax(model.compute_logits(params, h_f))

        from atoma_infer_tpu.ops.kv_cache import alloc_kv_scales

        kv_q = jnp.zeros(model.kv_cache_shape(4, bs), jnp.int8)
        scales = jnp.stack([alloc_kv_scales(4, bs)] * 2)
        h_q, kv_q, scales = model.forward(
            params, tokens, positions, kv_q, meta, kv_scales=scales
        )
        lp_q = jax.nn.log_softmax(model.compute_logits(params, h_q))

        top_f = np.asarray(jnp.argmax(lp_f, -1))
        top_q = np.asarray(jnp.argmax(lp_q, -1))
        assert (top_f == top_q).mean() >= 0.9
        assert np.abs(np.asarray(lp_f) - np.asarray(lp_q)).mean() < 0.05
        # The quantized cache really is int8 and scales were written.
        assert kv_q.dtype == jnp.int8
        flat_scales = np.asarray(
            scales[:, :, :, :2], dtype=np.float32
        ).reshape(2, 4 * bs, 2)
        assert float(flat_scales[:, :T].min()) > 0


class TestPallasQuantKernels:
    @pytest.mark.parametrize("bits", [8, 4])
    def test_matches_xla_path(self, bits):
        from jax.experimental.pallas import tpu as pltpu

        from atoma_infer_tpu.ops.quant_kernels import quantized_matmul_pallas

        w = _w((256, 256), seed=5)
        x = _w((16, 256), seed=6).astype(jnp.bfloat16)
        q = quantize_weight(w, bits=bits, group_size=128)
        with pltpu.force_tpu_interpret_mode():
            got = quantized_matmul_pallas(
                x, q.qweight, q.scales, bits=bits, group_size=128, block_n=128
            )
        want = x.astype(jnp.float32) @ dequantize_weight(q, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want),
            atol=0.5, rtol=0.05,
        )

    @pytest.mark.parametrize("bits", [8, 4])
    def test_stacked_layer_view_matches_sliced(self, bits):
        """Layer views of stacked [L, K, N] weights (BlockSpec-indexed, no
        per-layer slice copy — see QuantizedTensor.layer) must produce the
        same result as running each layer's 2D slice."""
        import dataclasses

        from jax.experimental.pallas import tpu as pltpu

        from atoma_infer_tpu.ops.quant import quantized_matmul
        from atoma_infer_tpu.ops.quant_kernels import quantized_matmul_pallas

        L = 3
        per_layer = [quantize_weight(_w((256, 256), seed=10 + i), bits=bits,
                                     group_size=128) for i in range(L)]
        stacked = QuantizedTensor(
            qweight=jnp.stack([q.qweight for q in per_layer]),
            scales=jnp.stack([q.scales for q in per_layer]),
            bits=bits,
            group_size=128,
        )
        x = _w((16, 256), seed=20).astype(jnp.bfloat16)
        for i in range(L):
            with pltpu.force_tpu_interpret_mode():
                got = quantized_matmul_pallas(
                    x, stacked.qweight, stacked.scales, bits=bits,
                    group_size=128, block_n=128, layer=i,
                )
                want = quantized_matmul_pallas(
                    x, per_layer[i].qweight, per_layer[i].scales, bits=bits,
                    group_size=128, block_n=128,
                )
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(want, np.float32),
                atol=1e-4, rtol=1e-4,
            )
            # The quantized_matmul dispatcher takes the same path via the
            # layer-view dataclass (XLA fallback on CPU).
            view = dataclasses.replace(stacked, layer=i)
            got2 = quantized_matmul(x, view)
            want2 = quantized_matmul(x, per_layer[i])
            np.testing.assert_allclose(
                np.asarray(got2, np.float32), np.asarray(want2, np.float32),
                atol=1e-4, rtol=1e-4,
            )


class TestW8A8:
    """Dynamic per-token activation quantization (ATOMA_W8A8): int8×int8
    MXU dots at the double-rate integer path — measured 5831→6581 tok/s on
    8B decode (v5e, round 4). Interpret mode runs the identical integer
    VALUES through float dots, so this CPU test pins the math."""

    def test_matches_weight_only_within_act_quant_noise(self, monkeypatch):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from atoma_infer_tpu.ops import quant_kernels
        from atoma_infer_tpu.ops.quant import quantize_weight

        K, N, M = 256, 256, 16
        w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.02
        qt = quantize_weight(w, bits=8, group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)

        base = quantized = None
        monkeypatch.setattr(quant_kernels, "_W8A8", False)
        base = quant_kernels.quantized_matmul_pallas(
            x, qt.qweight, qt.scales, bits=8, group_size=128, interpret=True
        )
        monkeypatch.setattr(quant_kernels, "_W8A8", True)
        quantized = quant_kernels.quantized_matmul_pallas(
            x, qt.qweight, qt.scales, bits=8, group_size=128, interpret=True
        )
        b = np.asarray(base, np.float32)
        q = np.asarray(quantized, np.float32)
        rel = np.max(np.abs(b - q)) / (np.max(np.abs(b)) + 1e-9)
        # Per-token int8 activation rounding: ~0.4% relative on gaussian x.
        assert rel < 2e-2, rel
        # And it must actually have quantized (not a no-op passthrough).
        assert not np.array_equal(b, q)


class TestWideMBlock:
    """M just past block_m must run ONE wide M block (single weight-stream
    pass), not tile — measured on chip: 256→384-seq INT4 decode regressed
    34.2→63.0 ms/step from the second block's full weight re-read."""

    @pytest.mark.parametrize("bits", [8, 4])
    def test_wide_single_block_matches_tiled(self, bits):
        import jax
        import jax.numpy as jnp

        from atoma_infer_tpu.ops import quant_kernels
        from atoma_infer_tpu.ops.quant import dequantize_weight, quantize_weight

        K, N, M = 256, 256, 384  # block_m=256 < M <= 512
        w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.02
        qt = quantize_weight(w, bits=bits, group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)

        wide = quant_kernels.quantized_matmul_pallas(
            x, qt.qweight, qt.scales, bits=bits, group_size=128,
            interpret=True, block_m=256,
        )
        tiled = quant_kernels.quantized_matmul_pallas(
            x, qt.qweight, qt.scales, bits=bits, group_size=128,
            interpret=True, block_m=128,  # forces n_m=3 (M > 2*block_m)
        )
        ref = x.astype(jnp.float32) @ dequantize_weight(qt).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(wide, np.float32), np.asarray(tiled, np.float32),
            atol=1e-2, rtol=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(wide, np.float32), np.asarray(ref, np.float32),
            atol=5e-2, rtol=5e-2,
        )
