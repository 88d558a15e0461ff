"""Sampler unit tests: typical_p filtering + top_n_tokens extraction
(the reference validates these but never applies/returns them —
validation.rs:228-240 / top_n_tokens; here both are live)."""

import numpy as np
import jax.numpy as jnp

from atoma_infer_tpu.engine.sampler import (
    PENALTY_WINDOW,
    SamplingTensors,
    _typical_p_mask,
    sample,
)
from atoma_infer_tpu.sampling_params import NextTokenChooserParameters


def _sample_kwargs(S, tensors, step=0):
    return dict(
        temperature=jnp.asarray(tensors.temperature),
        top_k=jnp.asarray(tensors.top_k),
        top_p=jnp.asarray(tensors.top_p),
        typical_p=jnp.asarray(tensors.typical_p),
        do_sample=jnp.asarray(tensors.do_sample),
        seeds=jnp.asarray(tensors.seeds),
        repetition_penalty=jnp.asarray(tensors.repetition_penalty),
        frequency_penalty=jnp.asarray(tensors.frequency_penalty),
        recent_tokens=jnp.asarray(tensors.recent_tokens),
        step=jnp.full((S,), step, jnp.int32),
        needs_sampling=tensors.needs_sampling,
        needs_penalties=tensors.needs_penalties,
        needs_typical=tensors.needs_typical,
        top_n=tensors.top_n,
    )


class TestTypicalP:
    def test_disabled_is_identity(self):
        logits = jnp.asarray(np.random.default_rng(0).standard_normal((4, 32)),
                             jnp.float32)
        out = _typical_p_mask(logits, jnp.ones((4,), jnp.float32))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(logits))

    def test_keeps_typical_mass(self):
        # A peaked distribution: low typical_p keeps few tokens, all finite
        # entries must cover >= typical_p of the mass.
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.standard_normal((3, 64)) * 3, jnp.float32)
        tp = jnp.asarray([0.2, 0.5, 0.9], jnp.float32)
        out = np.asarray(_typical_p_mask(logits, tp))
        probs = np.exp(np.asarray(logits))
        probs /= probs.sum(-1, keepdims=True)
        for i in range(3):
            kept = np.isfinite(out[i])
            assert 0 < kept.sum() < 64
            assert probs[i][kept].sum() >= float(tp[i]) - 1e-6

    def test_sampling_with_typical_p_stays_in_kept_set(self):
        rng = np.random.default_rng(2)
        S, V = 8, 128
        logits = jnp.asarray(rng.standard_normal((S, V)) * 2, jnp.float32)
        params = [
            NextTokenChooserParameters(
                do_sample=True, temperature=1.0, typical_p=0.3, seed=i
            )
            for i in range(S)
        ]
        tensors = SamplingTensors.build(params, [[] for _ in range(S)], S)
        assert tensors.needs_typical
        masked = np.asarray(
            _typical_p_mask(logits, jnp.asarray(tensors.typical_p))
        )
        tokens, _, _ = sample(logits, **_sample_kwargs(S, tensors))
        for i, t in enumerate(np.asarray(tokens)):
            assert np.isfinite(masked[i, t])


class TestTopNTokens:
    def test_top_n_returned_sorted(self):
        rng = np.random.default_rng(3)
        S, V, N = 4, 64, 5
        logits = jnp.asarray(rng.standard_normal((S, V)), jnp.float32)
        params = [NextTokenChooserParameters() for _ in range(S)]
        tensors = SamplingTensors.build(
            params, [[] for _ in range(S)], S, top_n_list=[N] * S
        )
        assert tensors.top_n == N
        tokens, lps, top = sample(logits, **_sample_kwargs(S, tensors))
        ids, top_lps = np.asarray(top[0]), np.asarray(top[1])
        assert ids.shape == (S, N)
        full = np.asarray(jnp.log(jnp.exp(logits) /
                                  jnp.exp(logits).sum(-1, keepdims=True)))
        for i in range(S):
            # Descending logprobs, first = greedy choice.
            assert np.all(np.diff(top_lps[i]) <= 1e-6)
            assert ids[i, 0] == int(np.asarray(tokens)[i])
            np.testing.assert_allclose(
                top_lps[i], full[i][ids[i]], rtol=1e-4, atol=1e-4
            )

    def test_top_n_zero_returns_none(self):
        S, V = 2, 16
        logits = jnp.zeros((S, V), jnp.float32)
        params = [NextTokenChooserParameters() for _ in range(S)]
        tensors = SamplingTensors.build(params, [[], []], S)
        _, _, top = sample(logits, **_sample_kwargs(S, tensors))
        assert top is None


class TestEngineTopN:
    def test_service_returns_top_logprobs(self):
        import asyncio

        from atoma_infer_tpu.config import (
            CacheConfig,
            EngineConfig,
            ModelConfig,
            SchedulerConfig,
            ValidationConfig,
        )
        from atoma_infer_tpu.engine.llm_service import LlmService
        from atoma_infer_tpu.entrypoints.offline import build_tiny_random
        from atoma_infer_tpu.types import GenerateParameters, GenerateRequest

        model, params, tokenizer = build_tiny_random()
        config = EngineConfig(
            model=ModelConfig(model_name="tiny-random", dtype="float32"),
            cache=CacheConfig(
                block_size=16,
                num_device_blocks_override=64,
                num_host_blocks_override=8,
            ),
            scheduler=SchedulerConfig(
                max_num_batched_tokens=256,
                max_num_sequences=8,
                max_model_len=256,
            ),
            validation=ValidationConfig(
                max_input_tokens=128, max_total_tokens=256
            ),
        )
        service = LlmService.start(
            config, model=model, params=params, tokenizer=tokenizer
        )

        async def scenario():
            task = asyncio.create_task(service.engine.run())
            fut = await service.handle_request(
                GenerateRequest(
                    request_id="topn",
                    inputs="hello world",
                    parameters=GenerateParameters(
                        max_new_tokens=4,
                        top_n_tokens=3,
                        decoder_input_details=True,
                    ),
                )
            )
            result = await asyncio.wait_for(fut, timeout=60)
            service.stop()
            task.cancel()
            return result

        result = asyncio.run(scenario())
        out = result.outputs[0]
        assert out.top_logprobs is not None
        assert len(out.top_logprobs) == len(out.token_ids)
        for per_tok, tok, lp in zip(
            out.top_logprobs, out.token_ids, out.logprobs
        ):
            assert len(per_tok) == 3
            # Greedy chosen token = first alternative with matching logprob.
            assert per_tok[0][0] == tok
            assert abs(per_tok[0][1] - lp) < 1e-4
