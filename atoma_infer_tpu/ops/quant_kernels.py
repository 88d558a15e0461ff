"""Pallas fused dequantize-matmul kernels (weight-only INT8/INT4).

The reference has no quantization (BASELINE configs #3-5 require it). XLA's
fused int8 path reaches ~1.75× over bf16 on v5e, but its int4 path only
~1.16× — nibble unpacking materializes intermediates. These kernels keep the
packed weights in VMEM blocks and dequantize on the fly feeding the MXU.

Layout contract (matches ops/quant.quantize_weight):
- qweight int8 ``[K, N]`` (int8) or ``[K/2, N]`` (int4, packed group-local:
  within each scale group of rows, the first half lives in low nibbles and
  the second half in high nibbles — so a packed block unpacks with one
  sublane concat, no row interleave).
- scales bf16 ``[K/group_size, N]``; group_size must equal the kernel's
  K-block (128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scale_row(s_ref, k):
    """Select scale row k from the full [n_k, BN] block (dynamic sublane
    reads need 8-alignment: read an aligned window and mask-select)."""
    base = pl.multiple_of((k // 8) * 8, 8)
    window = s_ref[pl.ds(base, 8), :].astype(jnp.float32)  # [8, BN]
    rid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    return jnp.sum(
        jnp.where(rid == k % 8, window, 0.0), axis=0, keepdims=True
    )  # [1, BN]


def _scaled_dot(x_blk, w_blk, s_ref, k, groups_per_blk, group_size):
    """Scale each group-of-rows slice of the dequantized block, one dot."""
    scaled = []
    for g in range(groups_per_blk):
        s_row = _scale_row(s_ref, k * groups_per_blk + g)  # [1, BN]
        scaled.append(
            w_blk[g * group_size : (g + 1) * group_size, :]
            * s_row.astype(jnp.bfloat16)
        )
    w_s = jnp.concatenate(scaled, axis=0)
    return jax.lax.dot_general(
        x_blk,
        w_s,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel_i8(
    x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int, groups_per_blk: int,
    group_size: int,
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bk = w_ref.shape[0]
    x_blk = x_ref[:, pl.ds(k * bk, bk)]
    w_blk = w_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += _scaled_dot(
        x_blk, w_blk, s_ref, k, groups_per_blk, group_size
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_i4(
    x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int, groups_per_blk: int,
    group_size: int,
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = w_ref[...]  # [BK/2, BN] int8, group-local halves
    # Mosaic lacks vector shifts on 8-bit types: extract nibbles with float
    # arithmetic (u8 = hi·16 + lo; both in [0,16)).
    pf = packed.astype(jnp.float32)
    as_f = jnp.where(pf < 0.0, pf + 256.0, pf)
    hi_f = jnp.floor(as_f * (1.0 / 16.0))
    lo_f = as_f - hi_f * 16.0
    lo = jnp.where(lo_f > 7.0, lo_f - 16.0, lo_f).astype(jnp.bfloat16)
    hi = jnp.where(hi_f > 7.0, hi_f - 16.0, hi_f).astype(jnp.bfloat16)
    # Packed halves are group-local: reassemble [g0lo..g0hi..g1lo..] order.
    half = group_size // 2
    pieces = []
    for g in range(groups_per_blk):
        pieces.append(lo[g * half : (g + 1) * half, :])
        pieces.append(hi[g * half : (g + 1) * half, :])
    w_blk = jnp.concatenate(pieces, axis=0)  # [BK, BN]

    bk = w_blk.shape[0]
    x_blk = x_ref[:, pl.ds(k * bk, bk)]
    acc_ref[...] += _scaled_dot(
        x_blk, w_blk, s_ref, k, groups_per_blk, group_size
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def quantized_matmul_pallas(
    x: jnp.ndarray,        # [M, K] bf16/f32
    qweight: jnp.ndarray,  # [K, N] int8 | [K/2, N] int4-packed
    scales: jnp.ndarray,   # [K/group, N]
    *,
    bits: int,
    group_size: int = 128,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x.shape
    N = qweight.shape[1]
    groups_per_blk = 4 if K % (4 * group_size) == 0 else 1
    BK = group_size * groups_per_blk
    n_k = K // BK
    n_groups = K // group_size
    BN = min(block_n, N)
    assert N % BN == 0 and K % BK == 0
    assert scales.shape == (n_groups, N), (scales.shape, (n_groups, N))

    xb = x.astype(jnp.bfloat16)
    pad_g = (-n_groups) % 8
    if pad_g:
        scales = jnp.pad(scales, ((0, pad_g), (0, 0)))
    kernel = _kernel_i8 if bits == 8 else _kernel_i4
    wk_rows = BK if bits == 8 else BK // 2

    out = pl.pallas_call(
        functools.partial(
            kernel,
            n_k=n_k,
            groups_per_blk=groups_per_blk,
            group_size=group_size,
        ),
        grid=(N // BN, n_k),
        in_specs=[
            pl.BlockSpec((M, K), lambda n, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wk_rows, BN), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups + pad_g, BN), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xb, qweight, scales)
    return out
