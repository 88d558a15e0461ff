import time
import numpy as np
import jax, jax.numpy as jnp
from atoma_infer_tpu.models.llama import LlamaConfig, rms_norm, _linear
from atoma_infer_tpu.ops.rope import apply_rope
from atoma_infer_tpu.ops.attention import AttentionMetadata, ragged_paged_attention
from atoma_infer_tpu.ops.kv_cache import write_kv_cache

cfg = LlamaConfig(vocab_size=128256, hidden_size=2048, intermediate_size=8192,
    num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
    head_dim=64, max_position_embeddings=4096, tie_word_embeddings=True)
from atoma_infer_tpu.models.llama import Llama
model = Llama(cfg, dtype=jnp.bfloat16)
params = model.init_params(jax.random.PRNGKey(0))
S, bs, ctx = 64, 32, 512
steps = 16
pages = (ctx + steps + 32) // bs + 1
nb = S * pages + 8
rng = np.random.default_rng(0)
perm = rng.permutation(nb - 1)[: S * pages] + 1
tables = jnp.asarray(perm.reshape(S, pages), jnp.int32)
qsl = jnp.arange(S + 1, dtype=jnp.int32)
L = cfg.num_layers

def fwd_unrolled(params, kv_list, tokens, positions, meta):
    h = params["embed"][tokens].astype(jnp.bfloat16)
    cos, sin = model.rope_cos, model.rope_sin
    scale = cfg.head_dim ** -0.5
    new_kv = []
    for i in range(L):
        lp = jax.tree_util.tree_map(lambda x: x[i], params["layers"])
        normed = rms_norm(h, lp["input_norm"], cfg.rms_norm_eps)
        q = _linear(normed, lp["q_proj"]).reshape(-1, 32, 64)
        kk = _linear(normed, lp["k_proj"]).reshape(-1, 8, 64)
        vv = _linear(normed, lp["v_proj"]).reshape(-1, 8, 64)
        q = apply_rope(q, positions, cos, sin)
        kk = apply_rope(kk, positions, cos, sin)
        kv_c = write_kv_cache(kv_list[i], kk, vv, meta.slot_mapping)
        attn = ragged_paged_attention(q, kv_c, meta, scale=scale)
        h = h + _linear(attn.reshape(-1, 2048), lp["o_proj"])
        normed = rms_norm(h, lp["post_norm"], cfg.rms_norm_eps)
        h = h + _linear(jax.nn.silu(_linear(normed, lp["gate_proj"])) * _linear(normed, lp["up_proj"]), lp["down_proj"])
        new_kv.append(kv_c)
    return h, tuple(new_kv)

def decode_loop(params, kv_list, tokens, n_steps):
    def body(i, carry):
        tokens, kv_list = carry
        kv_len = ctx + i
        positions = jnp.full((S,), kv_len, jnp.int32)
        page = tables[jnp.arange(S), kv_len // bs]
        slots = page * bs + kv_len % bs
        meta = AttentionMetadata(slots, tables, jnp.full((S,), kv_len+1, jnp.int32), qsl, jnp.asarray(S, jnp.int32), bs)
        h, kv_list = fwd_unrolled(params, kv_list, tokens, positions, meta)
        logits = model.compute_logits(params, h)
        return jnp.argmax(logits, -1).astype(jnp.int32), kv_list
    return jax.lax.fori_loop(0, n_steps, body, (tokens, kv_list))

run = jax.jit(decode_loop, static_argnames=("n_steps",), donate_argnums=(1,))
kv_list = tuple(jnp.zeros((nb*bs, 2, 8, 64), jnp.bfloat16) for _ in range(L))
t0w = time.time()
t, kv_list = run(params, kv_list, jnp.zeros((S,), jnp.int32), 2); np.asarray(t)
print(f"compile+warm {time.time()-t0w:.0f}s")
t0 = time.perf_counter(); t, kv_list = run(params, kv_list, t, 2); np.asarray(t); base = time.perf_counter()-t0
t0 = time.perf_counter(); t, kv_list = run(params, kv_list, t, 2+steps); np.asarray(t); dt = (time.perf_counter()-t0-base)/steps
print(f"unrolled per-layer-cache step: {dt*1e3:.2f} ms  -> {S/dt:.0f} tok/s")
