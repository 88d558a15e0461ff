"""Probe: does int8 x int8 MXU dot run ~2x the bf16-mixed rate on v5e?

Times a Pallas grid matmul [M,K]x[K,N] (8B gate-proj shape) with
(a) bf16 x int8 (the shipping int8 kernel's mixed dot),
(b) int8 x int8 (W8A8 candidate),
unrolled inside one jit to amortize dispatch.
"""
import sys, time
sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 184, 4096, 14336
BK, BN = 1024, 2048
n_k, n_n = K // BK, N // BN

def kern(x_ref, w_ref, o_ref, acc_ref, *, n_k, acc_dtype):
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )
    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(jnp.float32)

def matmul(x, w, acc_dtype=jnp.float32):
    return pl.pallas_call(
        functools.partial(kern, n_k=n_k, acc_dtype=acc_dtype),
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((M, BK), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, BN), acc_dtype)],
    )(x, w)

R = 16  # unroll factor

@jax.jit
def run_mixed(x, ws):
    return sum(jnp.sum(matmul(x, w)) for w in ws)

@jax.jit
def run_i8(xq, ws):
    return sum(jnp.sum(matmul(xq, w, jnp.int32)) for w in ws)

rng = np.random.default_rng(0)
ws = tuple(jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8) for _ in range(R))
xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
xq = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)

def timeit(f, *args):
    r = f(*args); np.asarray(r)  # compile
    t0 = time.perf_counter()
    for i in range(8):
        r = f(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / (8 * R) * 1e6

t_mixed = timeit(run_mixed, xb, ws)
t_i8 = timeit(run_i8, xq, ws)
# correctness: int8 dot == integer math
ref = np.asarray(xq, np.int32) @ np.asarray(ws[0], np.int32)
got = np.asarray(matmul(xq, ws[0], jnp.int32))
ok = np.allclose(ref.astype(np.float32), got, rtol=1e-6, atol=0.5)
print(f"bf16 x int8: {t_mixed:.1f} us/matmul")
print(f"int8 x int8: {t_i8:.1f} us/matmul  exact={ok}")
