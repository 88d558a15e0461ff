import time
import numpy as np
import jax, jax.numpy as jnp
from atoma_infer_tpu.models.llama import Llama, LlamaConfig
from atoma_infer_tpu.ops.attention import AttentionMetadata

cfg = LlamaConfig(vocab_size=128256, hidden_size=2048, intermediate_size=8192,
    num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
    head_dim=64, max_position_embeddings=4096, tie_word_embeddings=True)
model = Llama(cfg, dtype=jnp.bfloat16)
params = model.init_params(jax.random.PRNGKey(0))
S, bs, ctx = 64, 32, 512
steps = 64
pages = (ctx + steps + 32) // bs + 1
nb = S * pages + 8
rng = np.random.default_rng(0)
perm = rng.permutation(nb - 1)[: S * pages] + 1
tables = jnp.asarray(perm.reshape(S, pages), jnp.int32)
qsl = jnp.arange(S + 1, dtype=jnp.int32)

@jax.jit
def meta_for(i):
    kv_len = ctx + i
    page = tables[jnp.arange(S), kv_len // bs]
    slots = page * bs + kv_len % bs
    return (jnp.full((S,), kv_len, jnp.int32), slots, jnp.full((S,), kv_len+1, jnp.int32))

from functools import partial
@partial(jax.jit, donate_argnums=(1,))
def step(params, kv, tokens, positions, slots, seq_lens):
    meta = AttentionMetadata(slots, tables, seq_lens, qsl, jnp.asarray(S, jnp.int32), bs)
    h, kv = model.forward(params, tokens, positions, kv, meta)
    logits = model.compute_logits(params, h)
    return jnp.argmax(logits, -1).astype(jnp.int32), kv

kv = tuple(jnp.zeros((nb, bs, 1024), jnp.bfloat16) for _ in range(16))
tokens = jnp.zeros((S,), jnp.int32)
pos, slots, sl = meta_for(0)
tokens, kv = step(params, kv, tokens, pos, slots, sl)
np.asarray(tokens)  # compile done

# engine-style python loop, async pipelined, fetch only at the end
t0 = time.perf_counter()
for i in range(1, 1 + steps):
    pos, slots, sl = meta_for(i)
    tokens, kv = step(params, kv, tokens, pos, slots, sl)
np.asarray(tokens)
dt = (time.perf_counter() - t0) / steps
print(f"engine-style step: {dt*1e3:.2f} ms  -> {S/dt:.0f} tok/s", flush=True)
