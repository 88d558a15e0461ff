"""Train the in-repo peaked-logit quality-tier model (VERDICT r4 next #2).

Egress is blocked in this environment, so real pretrained checkpoints are
unreachable; every quantization/spec-decode quality gate previously ran on
random weights (flat logits — the uninformative worst case). This tool
trains a small Llama-architecture model on the deterministic in-repo corpus
(tools/tiny_corpus.py) until its logits are peaked and its greedy text is
self-consistent, then saves a standard HF-format checkpoint
(config.json + model.safetensors + tokenizer.json) that:

  * `atoma_infer_tpu.models.weights.load_llama_params` loads directly,
  * HF `transformers` loads too (real_model_check --hf-parity works),
  * the full quality ladder runs on (tools/quality_ladder.py,
    tools/real_model_check.py --spec).

The training forward reuses the serving stack's own math — `rms_norm`,
`apply_rope` (rotate-half), GQA, SwiGLU, tied lm_head — so the trained
weights are exactly on-distribution for the engine (ref evidence tier being
replaced: the reference's real-pretrained generation tests,
/root/reference/models/src/llama.rs:506+).

Usage:
    python tools/train_tiny_model.py                  # train on default backend
    python tools/train_tiny_model.py --cpu --steps 200  # smoke
Output dir default: tests/fixtures/tiny_trained/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from tiny_corpus import EVAL_PROMPTS, build_corpus  # noqa: E402

# Model dims: hidden == heads × head_dim so vanilla HF transformers can load
# the checkpoint; GQA (8q/4kv) exercises the grouped attention paths.
HIDDEN = 256
LAYERS = 4
Q_HEADS = 8
KV_HEADS = 4
HEAD_DIM = 32
INTERMEDIATE = 1024
VOCAB = 1024
EPS = 1e-5
ROPE_THETA = 10000.0
MAX_POS = 2048


def train_tokenizer(corpus: str, out_dir: str):
    """Byte-level BPE (GPT-2 style) trained on the corpus; <s>=0, </s>=1."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=VOCAB,
        special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(corpus.splitlines(), trainer)
    tok.save(os.path.join(out_dir, "tokenizer.json"))
    return tok


def init_params(rng, dtype):
    import jax
    import jax.numpy as jnp

    k = iter(jax.random.split(rng, 16))

    def init(key, shape, fan_in):
        return (
            jax.random.normal(key, shape, dtype=jnp.float32) * fan_in**-0.5
        ).astype(dtype)

    h, i, d = HIDDEN, INTERMEDIATE, HEAD_DIM
    return {
        "embed": init(next(k), (VOCAB, h), h),
        "layers": {
            "input_norm": jnp.ones((LAYERS, h), dtype=dtype),
            "q_proj": init(next(k), (LAYERS, h, Q_HEADS * d), h),
            "k_proj": init(next(k), (LAYERS, h, KV_HEADS * d), h),
            "v_proj": init(next(k), (LAYERS, h, KV_HEADS * d), h),
            "o_proj": init(next(k), (LAYERS, Q_HEADS * d, h), Q_HEADS * d),
            "post_norm": jnp.ones((LAYERS, h), dtype=dtype),
            "gate_proj": init(next(k), (LAYERS, h, i), h),
            "up_proj": init(next(k), (LAYERS, h, i), h),
            "down_proj": init(next(k), (LAYERS, i, h), i),
        },
        "final_norm": jnp.ones((h,), dtype=dtype),
    }


def make_loss_fn(cos, sin):
    """Teacher-forced causal LM loss with the serving stack's layer math."""
    import jax
    import jax.numpy as jnp

    from atoma_infer_tpu.models.llama import rms_norm
    from atoma_infer_tpu.ops.rope import apply_rope

    rep = Q_HEADS // KV_HEADS

    def loss_fn(params, batch):  # batch [B, T+1] int32
        inputs, targets = batch[:, :-1], batch[:, 1:]
        B, T = inputs.shape
        x = params["embed"][inputs].astype(jnp.float32)
        pos = jnp.arange(T, dtype=jnp.int32)
        mask = jnp.tril(jnp.ones((T, T), dtype=bool))
        rope = jax.vmap(lambda t: apply_rope(t, pos, cos, sin))
        for li in range(LAYERS):
            lp = {k: v[li] for k, v in params["layers"].items()}
            normed = rms_norm(x, lp["input_norm"], EPS)
            q = (normed @ lp["q_proj"]).reshape(B, T, Q_HEADS, HEAD_DIM)
            kk = (normed @ lp["k_proj"]).reshape(B, T, KV_HEADS, HEAD_DIM)
            vv = (normed @ lp["v_proj"]).reshape(B, T, KV_HEADS, HEAD_DIM)
            q, kk = rope(q), rope(kk)
            kk = jnp.repeat(kk, rep, axis=2)
            vv = jnp.repeat(vv, rep, axis=2)
            scores = (
                jnp.einsum("bqhd,bkhd->bhqk", q, kk) * HEAD_DIM**-0.5
            )
            scores = jnp.where(mask[None, None], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vv)
            x = x + attn.reshape(B, T, Q_HEADS * HEAD_DIM) @ lp["o_proj"]
            normed = rms_norm(x, lp["post_norm"], EPS)
            x = x + (
                jax.nn.silu(normed @ lp["gate_proj"]) * (normed @ lp["up_proj"])
            ) @ lp["down_proj"]
        x = rms_norm(x, params["final_norm"], EPS)
        logits = jnp.dot(
            x, params["embed"].T, preferred_element_type=jnp.float32
        )
        lps = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lps, targets[..., None], axis=-1)
        return jnp.mean(nll)

    return loss_fn


def save_checkpoint(params, out_dir: str) -> None:
    """HF-format llama checkpoint (inverse of weights.load_llama_params's
    name/transpose mapping); f32 tensors so safetensors' numpy framework
    reads it back and transformers loads it unmodified."""
    from safetensors.numpy import save_file

    tensors = {}

    def put(name, arr):
        tensors[name] = np.ascontiguousarray(np.asarray(arr, np.float32))

    put("model.embed_tokens.weight", params["embed"])
    put("model.norm.weight", params["final_norm"])
    lay = params["layers"]
    for i in range(LAYERS):
        pre = f"model.layers.{i}."
        put(pre + "input_layernorm.weight", lay["input_norm"][i])
        put(pre + "post_attention_layernorm.weight", lay["post_norm"][i])
        for hf, key in (
            ("self_attn.q_proj", "q_proj"),
            ("self_attn.k_proj", "k_proj"),
            ("self_attn.v_proj", "v_proj"),
            ("self_attn.o_proj", "o_proj"),
            ("mlp.gate_proj", "gate_proj"),
            ("mlp.up_proj", "up_proj"),
            ("mlp.down_proj", "down_proj"),
        ):
            put(pre + hf + ".weight", np.asarray(lay[key][i]).T)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))

    config = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": VOCAB,
        "hidden_size": HIDDEN,
        "intermediate_size": INTERMEDIATE,
        "num_hidden_layers": LAYERS,
        "num_attention_heads": Q_HEADS,
        "num_key_value_heads": KV_HEADS,
        "head_dim": HEAD_DIM,
        "rms_norm_eps": EPS,
        "rope_theta": ROPE_THETA,
        "max_position_embeddings": MAX_POS,
        "tie_word_embeddings": True,
        "bos_token_id": 0,
        "eos_token_id": 1,
        "hidden_act": "silu",
        "torch_dtype": "float32",
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)


def greedy_sample(params, tok, loss_fn_mods, prompt: str, n: int = 24) -> str:
    """Quick coherence probe without the engine: full-recompute greedy."""
    import jax.numpy as jnp

    cos, sin, loss_fn = loss_fn_mods  # reuse rope caches via closure
    del loss_fn
    import jax

    from atoma_infer_tpu.models.llama import rms_norm
    from atoma_infer_tpu.ops.rope import apply_rope

    ids = tok.encode(prompt).ids
    rep = Q_HEADS // KV_HEADS
    for _ in range(n):
        T = len(ids)
        x = params["embed"][jnp.asarray(ids)][None].astype(jnp.float32)
        pos = jnp.arange(T, dtype=jnp.int32)
        mask = jnp.tril(jnp.ones((T, T), dtype=bool))
        rope = jax.vmap(lambda t: apply_rope(t, pos, cos, sin))
        for li in range(LAYERS):
            lp = {k: v[li] for k, v in params["layers"].items()}
            normed = rms_norm(x, lp["input_norm"], EPS)
            q = (normed @ lp["q_proj"]).reshape(1, T, Q_HEADS, HEAD_DIM)
            kk = (normed @ lp["k_proj"]).reshape(1, T, KV_HEADS, HEAD_DIM)
            vv = (normed @ lp["v_proj"]).reshape(1, T, KV_HEADS, HEAD_DIM)
            q, kk = rope(q), rope(kk)
            kk = jnp.repeat(kk, rep, axis=2)
            vv = jnp.repeat(vv, rep, axis=2)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, kk) * HEAD_DIM**-0.5
            s = jnp.where(mask[None, None], s, -1e30)
            attn = jnp.einsum(
                "bhqk,bkhd->bqhd", jax.nn.softmax(s, axis=-1), vv
            )
            x = x + attn.reshape(1, T, Q_HEADS * HEAD_DIM) @ lp["o_proj"]
            normed = rms_norm(x, lp["post_norm"], EPS)
            x = x + (
                jax.nn.silu(normed @ lp["gate_proj"]) * (normed @ lp["up_proj"])
            ) @ lp["down_proj"]
        x = rms_norm(x, params["final_norm"], EPS)
        logits = x[0, -1] @ params["embed"].T
        ids.append(int(jnp.argmax(logits)))
    return tok.decode(ids)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--seq", type=int, default=128)
    parser.add_argument("--lr", type=float, default=3e-3)
    parser.add_argument("--scan", type=int, default=50,
                        help="training steps fused per dispatch")
    parser.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "tests", "fixtures",
            "tiny_trained",
        ),
    )
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from atoma_infer_tpu.ops.rope import compute_cos_sin_cache

    out_dir = os.path.abspath(args.out)
    os.makedirs(out_dir, exist_ok=True)

    corpus = build_corpus()
    tok = train_tokenizer(corpus, out_dir)
    stream = np.asarray(tok.encode(corpus).ids, np.int32)
    print(
        f"corpus: {len(corpus)} chars -> {len(stream)} tokens "
        f"(vocab {tok.get_vocab_size()})",
        flush=True,
    )

    cos, sin = compute_cos_sin_cache(HEAD_DIM, MAX_POS, ROPE_THETA)
    loss_fn = make_loss_fn(cos, sin)
    params = init_params(jax.random.PRNGKey(0), jnp.float32)

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, 100, args.steps
    )
    opt = optax.adam(schedule)
    opt_state = opt.init(params)

    B, T = args.batch, args.seq
    n_windows = len(stream) - T - 1
    rng = np.random.default_rng(0)
    starts_all = rng.integers(
        0, n_windows, size=(args.steps, B), dtype=np.int32
    )
    stream_dev = jnp.asarray(stream)

    def one_step(carry, starts):
        params, opt_state = carry
        idx = starts[:, None] + jnp.arange(T + 1)[None, :]
        batch = stream_dev[idx]
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def train_chunk(params, opt_state, starts_chunk):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), starts_chunk
        )
        return params, opt_state, losses

    t0 = time.monotonic()
    for c in range(0, args.steps, args.scan):
        chunk = jnp.asarray(starts_all[c : c + args.scan])
        params, opt_state, losses = train_chunk(params, opt_state, chunk)
        losses = np.asarray(losses)
        print(
            f"step {c + len(losses):5d}/{args.steps}  "
            f"loss {losses[-1]:.4f}  ({time.monotonic() - t0:.0f}s)",
            flush=True,
        )
    final_loss = float(losses[-1])

    save_checkpoint(params, out_dir)
    print(f"saved HF checkpoint to {out_dir}")

    for prompt in EVAL_PROMPTS[:3]:
        text = greedy_sample(params, tok, (cos, sin, loss_fn), prompt)
        print(f"  greedy: {text!r}", flush=True)
    print(json.dumps({
        "metric": "tiny_trained_final_loss",
        "value": round(final_loss, 4),
        "steps": args.steps,
        "tokens_seen": args.steps * B * T,
    }))


if __name__ == "__main__":
    main()
