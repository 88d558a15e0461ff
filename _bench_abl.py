import json, time, sys
import numpy as np
import jax, jax.numpy as jnp
from atoma_infer_tpu.models.llama import Llama, LlamaConfig
from atoma_infer_tpu.ops import attention as attn_mod
from atoma_infer_tpu.ops.attention import AttentionMetadata

cfg = LlamaConfig(vocab_size=128256, hidden_size=2048, intermediate_size=8192,
    num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
    head_dim=64, max_position_embeddings=4096, tie_word_embeddings=True)
model = Llama(cfg, dtype=jnp.bfloat16)
params = model.init_params(jax.random.PRNGKey(0))
S, block_size, ctx = 64, 32, 512
steps = 16
pages_per_seq = (ctx + steps + 64) // block_size + 1
num_blocks = S * pages_per_seq + 8
rng = np.random.default_rng(0)
perm = rng.permutation(num_blocks - 1)[: S * pages_per_seq] + 1
tables = jnp.asarray(perm.reshape(S, pages_per_seq), dtype=jnp.int32)
qsl = jnp.arange(S + 1, dtype=jnp.int32)

def make_loop():
    def decode_loop(params, kv_cache, tokens, n_steps):
        def body(i, carry):
            tokens, kv_cache = carry
            kv_len = ctx + i
            positions = jnp.full((S,), kv_len, jnp.int32)
            page = tables[jnp.arange(S), kv_len // block_size]
            slots = page * block_size + kv_len % block_size
            meta = AttentionMetadata(slots, tables,
                jnp.full((S,), kv_len + 1, jnp.int32), qsl,
                jnp.asarray(S, jnp.int32), block_size)
            hidden, kv_cache = model.forward(params, tokens, positions, kv_cache, meta)
            logits = model.compute_logits(params, hidden)
            tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return tokens, kv_cache
        return jax.lax.fori_loop(0, n_steps, body, (tokens, kv_cache))
    return jax.jit(decode_loop, static_argnames=("n_steps",))

def run(tag):
    f = make_loop()
    kv_cache = jnp.zeros(model.kv_cache_shape(num_blocks, block_size), dtype=jnp.bfloat16)
    t0 = jnp.zeros((S,), jnp.int32)
    t, kv2 = f(params, kv_cache, t0, 1); np.asarray(t)  # warm incl. fetch
    def timed(n):
        ts = time.perf_counter()
        t, _ = f(params, kv_cache, t0, n); np.asarray(t)
        return time.perf_counter() - ts
    a = timed(1); b = timed(1 + steps)
    per = (b - a) / steps
    print(f"{tag}: {per*1e3:8.2f} ms/step  {S/per:8.1f} tok/s")

import atoma_infer_tpu.models.llama as lm
orig_attn = lm.ragged_paged_attention
orig_write = lm.write_kv_cache
# 1) no attention, no cache write: pure matmul/scan path
lm.ragged_paged_attention = lambda q, kv, m, **kw: q
lm.write_kv_cache = lambda kv, k, v, s: kv
run("no-attn no-write")
# 2) no attention, with write
lm.write_kv_cache = orig_write
run("no-attn +write  ")
# 3) full pallas
lm.ragged_paged_attention = orig_attn
run("pallas +write   ")
