import time
import numpy as np
import jax, jax.numpy as jnp
from atoma_infer_tpu.ops.quant import quantize_weight
from atoma_infer_tpu.ops.quant_kernels import quantized_matmul_pallas

M, K, N = 64, 8192, 8192
UNROLL = 24
w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32)
x0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
q8 = quantize_weight(w, 8)
q4 = quantize_weight(w, 4)

# correctness on chip first
got8 = np.asarray(jax.jit(lambda x: quantized_matmul_pallas(x, q8.qweight, q8.scales, bits=8))(x0), np.float32)
got4 = np.asarray(jax.jit(lambda x: quantized_matmul_pallas(x, q4.qweight, q4.scales, bits=4))(x0), np.float32)
from atoma_infer_tpu.ops.quant import dequantize_weight
want8 = np.asarray(x0.astype(jnp.float32) @ dequantize_weight(q8, jnp.float32))
want4 = np.asarray(x0.astype(jnp.float32) @ dequantize_weight(q4, jnp.float32))
print("i8 rel err:", np.abs(got8-want8).max()/ (np.abs(want8).max()+1e-9))
print("i4 rel err:", np.abs(got4-want4).max()/ (np.abs(want4).max()+1e-9))

def engine_time(matmul, n=20):
    @jax.jit
    def step(x):
        for _ in range(UNROLL):
            out = matmul(x)
            x = x + out[:, :K].astype(jnp.bfloat16) * 1e-6
        return x
    x = step(x0); np.asarray(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = step(x)
    np.asarray(x)
    return (time.perf_counter() - t0) / (n * UNROLL)

t8 = engine_time(lambda x: quantized_matmul_pallas(x, q8.qweight, q8.scales, bits=8))
t4 = engine_time(lambda x: quantized_matmul_pallas(x, q4.qweight, q4.scales, bits=4))
wbytes = K * N
print(f"pallas int8: {t8*1e6:8.1f} us/mm  ({wbytes/t8/1e9:6.0f} GB/s eff)")
print(f"pallas int4: {t4*1e6:8.1f} us/mm  ({wbytes/2/t4/1e9:6.0f} GB/s eff)")
