import os, sys, time
sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))
import numpy as np
import jax, jax.numpy as jnp
from atoma_infer_tpu.ops.quant import quantize_weight, dequantize_weight
from atoma_infer_tpu.ops.quant_kernels import quantized_matmul_pallas

rng = jax.random.PRNGKey(0)
K, N, M = 1024, 2048, 176
w = jax.random.normal(rng, (K, N), jnp.float32) * 0.02
qt = quantize_weight(w, bits=4, group_size=128)
x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
ref = (x.astype(jnp.float32) @ dequantize_weight(qt, jnp.float32))
got = quantized_matmul_pallas(x, qt.qweight, qt.scales, bits=4, group_size=128)
ref_np, got_np = np.asarray(ref, np.float32), np.asarray(got, np.float32)
err = np.max(np.abs(ref_np - got_np)) / (np.max(np.abs(ref_np)) + 1e-9)
print("int4 kernel vs dequant oracle: rel_err", float(err), "OK" if err < 2e-2 else "FAIL")
