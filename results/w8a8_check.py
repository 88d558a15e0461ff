import sys
sys.path.insert(0, '/root/repo')
import os
os.environ["ATOMA_W8A8"] = "1"
import numpy as np
import jax, jax.numpy as jnp
from atoma_infer_tpu.ops.quant import quantize_weight, dequantize_weight
from atoma_infer_tpu.ops.quant_kernels import quantized_matmul_pallas

K, N, M = 1024, 2048, 176
w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.02
qt = quantize_weight(w, bits=8, group_size=128)
x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
ref = (x.astype(jnp.float32) @ dequantize_weight(qt, jnp.float32))
got = quantized_matmul_pallas(x, qt.qweight, qt.scales, bits=8, group_size=128)
ref_np, got_np = np.asarray(ref, np.float32), np.asarray(got, np.float32)
err = np.max(np.abs(ref_np - got_np)) / (np.max(np.abs(ref_np)) + 1e-9)
print("w8a8 vs w8-only oracle rel_err:", float(err), "OK" if err < 2e-2 else "FAIL")
