"""Measure host->device transfer + dispatch costs through the axon tunnel.

Times three per-step input-feed patterns against an identical trivial jitted
consumer: (a) 18 separate small jnp.asarray transfers, (b) one packed int32
transfer, (c) device-resident inputs (no transfer). Also times output fetch
patterns: two np.asarray fetches vs one packed fetch.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

S = 256
N_ARRS = 18
ITERS = 30

@jax.jit
def consume_many(*xs):
    return sum(jnp.sum(x) for x in xs)

@jax.jit
def consume_one(x):
    return jnp.sum(x)

# warm up compiles
xs = [np.full((S,), i, np.int32) for i in range(N_ARRS)]
np.asarray(consume_many(*[jnp.asarray(x) for x in xs]))
packed = np.concatenate(xs)
np.asarray(consume_one(jnp.asarray(packed)))

# (a) many small transfers
t0 = time.perf_counter()
for it in range(ITERS):
    xs = [np.full((S,), it * N_ARRS + i, np.int32) for i in range(N_ARRS)]
    r = consume_many(*[jnp.asarray(x) for x in xs])
np.asarray(r)
t_many = (time.perf_counter() - t0) / ITERS * 1000

# (b) one packed transfer
t0 = time.perf_counter()
for it in range(ITERS):
    packed = np.arange(S * N_ARRS, dtype=np.int32) + it
    r = consume_one(jnp.asarray(packed))
np.asarray(r)
t_one = (time.perf_counter() - t0) / ITERS * 1000

# (c) device-resident
dev = jnp.arange(S * N_ARRS, dtype=jnp.int32)
t0 = time.perf_counter()
for it in range(ITERS):
    dev = dev + 1
    r = consume_one(dev)
np.asarray(r)
t_dev = (time.perf_counter() - t0) / ITERS * 1000

# fetch patterns: two fetches vs one
a = jnp.arange(S, dtype=jnp.int32)
b = jnp.arange(S, dtype=jnp.float32)
np.asarray(a); np.asarray(b)
t0 = time.perf_counter()
for it in range(ITERS):
    np.asarray(a); np.asarray(b)
t_fetch2 = (time.perf_counter() - t0) / ITERS * 1000

c = jnp.concatenate([a, b.view(jnp.int32) if hasattr(b, 'view') else a])
@jax.jit
def pack_out(a, b):
    return jnp.concatenate([a, jax.lax.bitcast_convert_type(b, jnp.int32)])
c = pack_out(a, b); np.asarray(c)
t0 = time.perf_counter()
for it in range(ITERS):
    np.asarray(pack_out(a, b))
t_fetch1 = (time.perf_counter() - t0) / ITERS * 1000

print(f"18 small transfers+dispatch: {t_many:.1f} ms/step")
print(f"1 packed transfer+dispatch:  {t_one:.1f} ms/step")
print(f"device-resident dispatch:    {t_dev:.1f} ms/step")
print(f"2 separate fetches:          {t_fetch2:.1f} ms")
print(f"1 packed fetch (jit concat): {t_fetch1:.1f} ms")
