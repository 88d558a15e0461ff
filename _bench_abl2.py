import time
import numpy as np
import jax, jax.numpy as jnp
from atoma_infer_tpu.models.llama import LlamaConfig, rms_norm

cfg = LlamaConfig(vocab_size=128256, hidden_size=2048, intermediate_size=8192,
    num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
    head_dim=64, max_position_embeddings=4096, tie_word_embeddings=True)
S = 64
L, H, I = 16, 2048, 8192
rng = jax.random.PRNGKey(0)
ks = jax.random.split(rng, 8)
layers = {
    "input_norm": jnp.ones((L, H), jnp.bfloat16),
    "q_proj": jax.random.normal(ks[0], (L, H, 2048), jnp.bfloat16) * 0.02,
    "k_proj": jax.random.normal(ks[1], (L, H, 512), jnp.bfloat16) * 0.02,
    "v_proj": jax.random.normal(ks[2], (L, H, 512), jnp.bfloat16) * 0.02,
    "o_proj": jax.random.normal(ks[3], (L, 2048, H), jnp.bfloat16) * 0.02,
    "post_norm": jnp.ones((L, H), jnp.bfloat16),
    "gate_proj": jax.random.normal(ks[4], (L, H, I), jnp.bfloat16) * 0.02,
    "up_proj": jax.random.normal(ks[5], (L, H, I), jnp.bfloat16) * 0.02,
    "down_proj": jax.random.normal(ks[6], (L, I, H), jnp.bfloat16) * 0.02,
}
embed = jax.random.normal(ks[7], (cfg.vocab_size, H), jnp.bfloat16) * 0.02
slots_n = 39168
kv_cache = jnp.zeros((L, slots_n, 2, 8, 64), jnp.bfloat16)

def layer_body(hidden, lp):
    normed = rms_norm(hidden, lp["input_norm"], 1e-5)
    q = jnp.dot(normed, lp["q_proj"])
    k = jnp.dot(normed, lp["k_proj"])
    v = jnp.dot(normed, lp["v_proj"])
    attn = q  # identity attention
    hidden = hidden + jnp.dot(attn, lp["o_proj"])
    normed = rms_norm(hidden, lp["post_norm"], 1e-5)
    hidden = hidden + jnp.dot(jax.nn.silu(jnp.dot(normed, lp["gate_proj"])) * jnp.dot(normed, lp["up_proj"]), lp["down_proj"])
    return hidden

def bench(name, step_fn, *args):
    f = jax.jit(step_fn, static_argnames=("n",))
    np.asarray(f(*args, n=1))
    t0=time.perf_counter(); np.asarray(f(*args, n=1)); t1=time.perf_counter()
    t2=time.perf_counter(); np.asarray(f(*args, n=17)); t3=time.perf_counter()
    print(f"{name}: {((t3-t2)-(t1-t0))/16*1e3:8.2f} ms/step")

# A: matmul-only layers via scan, no cache at all, no lm_head
def stepA(layers, tokens, n):
    def body(i, tokens):
        h = embed[tokens]
        h, _ = jax.lax.scan(lambda c, lp: (layer_body(c, lp), None), h, layers)
        return jnp.argmax(h, axis=-1).astype(jnp.int32) % 128256
    return jax.lax.fori_loop(0, n, body, tokens)
bench("A scan matmuls only          ", stepA, layers, jnp.zeros((S,), jnp.int32))

# B: + lm_head + argmax over vocab
def stepB(layers, tokens, n):
    def body(i, tokens):
        h = embed[tokens]
        h, _ = jax.lax.scan(lambda c, lp: (layer_body(c, lp), None), h, layers)
        logits = jnp.dot(rms_norm(h, jnp.ones((H,), jnp.bfloat16), 1e-5), embed.T, preferred_element_type=jnp.float32)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.lax.fori_loop(0, n, body, tokens)
bench("B + lm_head/argmax           ", stepB, layers, jnp.zeros((S,), jnp.int32))

# C: + kv cache carried through scan (xs/ys) but untouched
def stepC(layers, kv_cache, tokens, n):
    def body(i, carry):
        tokens, kv_cache = carry
        h = embed[tokens]
        def lf(c, xs):
            lp, kvc = xs
            return layer_body(c, lp), kvc
        h, kv_cache = jax.lax.scan(lf, h, (layers, kv_cache))
        logits = jnp.dot(rms_norm(h, jnp.ones((H,), jnp.bfloat16), 1e-5), embed.T, preferred_element_type=jnp.float32)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv_cache
    return jax.lax.fori_loop(0, n, body, (tokens, kv_cache))
bench("C + kv cache through scan    ", stepC, layers, kv_cache, jnp.zeros((S,), jnp.int32))
