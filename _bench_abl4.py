import time
import numpy as np
import jax, jax.numpy as jnp
import atoma_infer_tpu.models.llama as lm
from atoma_infer_tpu.models.llama import Llama, LlamaConfig
from atoma_infer_tpu.ops.attention import AttentionMetadata
from atoma_infer_tpu.ops import kv_cache as kvc

cfg = LlamaConfig(vocab_size=128256, hidden_size=2048, intermediate_size=8192,
    num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
    head_dim=64, max_position_embeddings=4096, tie_word_embeddings=True)
model = Llama(cfg, dtype=jnp.bfloat16)
params = model.init_params(jax.random.PRNGKey(0))
S, bs, ctx, steps = 64, 32, 512, 16
pages = (ctx + steps + 32) // bs + 1
nb = S * pages + 8
rng = np.random.default_rng(0)
perm = rng.permutation(nb - 1)[: S * pages] + 1
tables = jnp.asarray(perm.reshape(S, pages), jnp.int32)
qsl = jnp.arange(S + 1, dtype=jnp.int32)

def bench(tag):
    def decode_loop(params, kv, tokens, n):
        def body(i, carry):
            tokens, kv = carry
            kv_len = ctx + i
            positions = jnp.full((S,), kv_len, jnp.int32)
            page = tables[jnp.arange(S), kv_len // bs]
            slots = page * bs + kv_len % bs
            meta = AttentionMetadata(slots, tables, jnp.full((S,), kv_len+1, jnp.int32), qsl, jnp.asarray(S, jnp.int32), bs)
            h, kv = model.forward(params, tokens, positions, kv, meta)
            logits = model.compute_logits(params, h)
            return jnp.argmax(logits, -1).astype(jnp.int32), kv
        return jax.lax.fori_loop(0, n, body, (tokens, kv))
    run = jax.jit(decode_loop, static_argnames=("n",), donate_argnums=(1,))
    kv = tuple(jnp.zeros((nb, bs, 1024), jnp.bfloat16) for _ in range(16))
    t, kv = run(params, kv, jnp.zeros((S,), jnp.int32), 2); np.asarray(t)
    t0=time.perf_counter(); t, kv = run(params, kv, t, 2); np.asarray(t); base=time.perf_counter()-t0
    t0=time.perf_counter(); t, kv = run(params, kv, t, 2+steps); np.asarray(t)
    dt=(time.perf_counter()-t0-base)/steps
    print(f"{tag}: {dt*1e3:8.2f} ms/step  {S/dt:7.0f} tok/s", flush=True)

orig_attn = lm.ragged_paged_attention
orig_write = lm.write_kv_cache
bench("full (pallas attn+write)")
lm.write_kv_cache = lambda kv, k, v, s: kv
bench("no write               ")
lm.ragged_paged_attention = lambda q, kv, m, **kw: q
bench("no write, no attn      ")
lm.write_kv_cache = orig_write
bench("pallas write, no attn  ")
