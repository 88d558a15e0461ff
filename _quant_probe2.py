import time
import numpy as np
import jax, jax.numpy as jnp
from atoma_infer_tpu.ops.quant import quantize_weight, quantized_matmul

M, K, N = 64, 8192, 8192
UNROLL = 24
w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32)
x0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
q8 = quantize_weight(w, 8)
q4 = quantize_weight(w, 4)
wb = w.astype(jnp.bfloat16)

def engine_time(matmul, warg, n=20):
    @jax.jit
    def step(x, warg):
        for _ in range(UNROLL):
            out = matmul(x, warg)
            x = x + out[:, :K] * 1e-6
        return x
    x = step(x0, warg); np.asarray(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = step(x, warg)
    np.asarray(x)
    return (time.perf_counter() - t0) / (n * UNROLL)

t_bf16 = engine_time(lambda x, w: x @ w, wb)
t_i8 = engine_time(quantized_matmul, q8)
t_i4 = engine_time(quantized_matmul, q4)
wbytes = K * N
print(f"bf16: {t_bf16*1e6:8.1f} us/mm  ({2*wbytes/t_bf16/1e9:6.0f} GB/s)")
print(f"int8: {t_i8*1e6:8.1f} us/mm  ({1*wbytes/t_i8/1e9:6.0f} GB/s eff, speedup {t_bf16/t_i8:.2f}x)")
print(f"int4: {t_i4*1e6:8.1f} us/mm  ({wbytes/2/t_i4/1e9:6.0f} GB/s eff, speedup {t_bf16/t_i4:.2f}x)")
