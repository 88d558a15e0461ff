import time
import numpy as np
import jax, jax.numpy as jnp
from atoma_infer_tpu.models.llama import Llama, LlamaConfig, rms_norm, _linear

cfg = LlamaConfig(vocab_size=128256, hidden_size=2048, intermediate_size=8192,
    num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
    head_dim=64, max_position_embeddings=4096, tie_word_embeddings=True)
model = Llama(cfg, dtype=jnp.bfloat16)
params = model.init_params(jax.random.PRNGKey(0))
S = 64
steps = 16
nb = 1300; bs = 32

def matmul_body(params, tokens):
    h = params["embed"][tokens].astype(jnp.bfloat16)
    for i in range(16):
        lp = jax.tree_util.tree_map(lambda x: x[i], params["layers"])
        normed = rms_norm(h, lp["input_norm"], 1e-5)
        q = _linear(normed, lp["q_proj"])
        k = _linear(normed, lp["k_proj"])
        v = _linear(normed, lp["v_proj"])
        h = h + _linear(q, lp["o_proj"])
        normed = rms_norm(h, lp["post_norm"], 1e-5)
        h = h + _linear(jax.nn.silu(_linear(normed, lp["gate_proj"])) * _linear(normed, lp["up_proj"]), lp["down_proj"])
    logits = model.compute_logits(params, h)
    return jnp.argmax(logits, -1).astype(jnp.int32)

def bench(tag, with_kv):
    def loop(params, kv, tokens, n):
        def body(i, carry):
            tokens, kv = carry
            tokens = matmul_body(params, tokens)
            return tokens, kv
        return jax.lax.fori_loop(0, n, body, (tokens, kv))
    run = jax.jit(loop, static_argnames=("n",), donate_argnums=(1,))
    kv = tuple(jnp.zeros((nb, bs, 1024), jnp.bfloat16) for _ in range(16)) if with_kv else ()
    t, kv2 = run(params, kv, jnp.zeros((S,), jnp.int32), 2); np.asarray(t)
    t0=time.perf_counter(); t, kv2 = run(params, kv2, t, 2); np.asarray(t); base=time.perf_counter()-t0
    t0=time.perf_counter(); t, kv2 = run(params, kv2, t, 2+steps); np.asarray(t)
    dt=(time.perf_counter()-t0-base)/steps
    print(f"{tag}: {dt*1e3:8.2f} ms/step", flush=True)

bench("matmuls, kv in carry ", True)
bench("matmuls, no kv       ", False)
