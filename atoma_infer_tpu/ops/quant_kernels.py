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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# INT4 single-dot mode: fold scale+bias into a bf16 dequant scratch and use
# one whole-K-block dot (see _kernel_i4). A/B knob for perf work.
_I4_SINGLEDOT = os.environ.get("ATOMA_I4_SINGLEDOT", "0") not in ("", "0")

# W8A8: quantize activations per token to int8 and run int8×int8 MXU dots
# (double-rate integer path, measured −28% on the 8B gate matmul —
# tools/w8a8_probe.py). Adds activation-quantization noise on top of
# weight quantization; gated by the logprob check in tests/test_quant.py.
_W8A8 = os.environ.get("ATOMA_W8A8", "0") not in ("", "0")


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
    """Grouped-scale matmul: one K=group_size MIXED bf16×int8 dot per scale
    group (Mosaic feeds the int8 operand straight to the MXU — measured ~6×
    faster than a VPU int8→bf16 convert before the dot), scale applied to
    the f32 dot RESULT (epilogue multiply on [BM, BN] registers). Avoids the
    XLA path's HBM-materialized [M, groups, N] partials. All group dots are
    issued back to back before the scale epilogues — interleaving
    independent MXU work with VPU epilogues serializes the MXU pipe
    (measured on the attention kernel's per-head loop: phase-splitting the
    same pattern bought 21% end-to-end).

    W8A8 (x_blk int8): int8×int8 dots run the MXU's double-rate integer
    path (measured 278 vs 387 µs on the 8B gate matmul — tools/
    w8a8_probe.py) with exact int32 accumulation, converted to f32 at the
    per-group scale epilogue; the caller multiplies the per-token
    activation scale into the kernel output."""
    act_int = x_blk.dtype == jnp.int8
    dots = [
        jax.lax.dot_general(
            x_blk[:, g * group_size : (g + 1) * group_size],
            w_blk[g * group_size : (g + 1) * group_size, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if act_int else jnp.float32,
        )
        for g in range(groups_per_blk)
    ]
    if act_int:
        dots = [d.astype(jnp.float32) for d in dots]
    acc = None
    for g, d in enumerate(dots):
        s_row = _scale_row(s_ref, k * groups_per_blk + g)  # [1, BN] f32
        acc = d * s_row if acc is None else acc + d * s_row
    return acc


def _kernel_i8(
    x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int, groups_per_blk: int,
    group_size: int, mixed_dot: bool, stacked: bool,
):
    k = pl.program_id(2)
    if stacked:
        # Layer view of stacked [L, K, N] weights (leading block dim 1).
        w_ref = w_ref.at[0]
        s_ref = s_ref.at[0]

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x_blk = x_ref[...]
    w_blk = w_ref[...]
    if not mixed_dot:
        # Interpret mode rejects mixed-dtype dots; convert first.
        w_blk = w_blk.astype(jnp.bfloat16)
    acc_ref[...] += _scaled_dot(
        x_blk, w_blk, s_ref, k, groups_per_blk, group_size
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_i4(
    x_ref, w_ref, s_ref, o_ref, acc_ref, w_un_ref, *, n_k: int,
    groups_per_blk: int, group_size: int, use_bitcast: bool, stacked: bool,
):
    k = pl.program_id(2)
    if stacked:
        w_ref = w_ref.at[0]
        s_ref = s_ref.at[0]

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = w_ref[...]  # [BK/2, BN] int8, group-local halves, BIASED q+8
    half = group_size // 2
    x_blk = x_ref[...]
    if use_bitcast:
        # Nibble extraction in int32: bitcast packs 4 int8 sublanes per
        # int32 lane, mask/shift extract all nibbles as bytes, bitcast back
        # restores the original rows (per-byte masks are byte-order
        # agnostic). Pure integer VPU ops on 4 bytes per lane; the BIASED
        # bytes (q+8 ∈ [1,15]) feed the MXU directly as mixed bf16×int8
        # dots — ZERO VPU converts — and the −8 bias folds into a rank-1
        # correction: x·(n−8) = x·n − 8·Σ_g(x).
        p32 = pltpu.bitcast(packed, jnp.int32)            # [BK/8, BN]
        lo = pltpu.bitcast(p32 & 0x0F0F0F0F, jnp.int8)    # [BK/2, BN] 0..15
        hi = pltpu.bitcast((p32 >> 4) & 0x0F0F0F0F, jnp.int8)
        if _I4_SINGLEDOT:
            # Fold scale + bias into a bf16 dequant scratch and contract the
            # WHOLE K block in one MXU dot: groups_per_blk× fewer issues
            # than the int8 kernel and zero scale/bias epilogue, for ~4 VPU
            # ops per weight (sub, convert, mul, store). At 8B decode the
            # matmuls are MXU-issue-bound, not HBM-bound, so fewer issues
            # beat exact-integer accumulation; bf16 rounding of w·s adds
            # ~0.3% relative error on top of 4-bit quantization noise.
            for g in range(groups_per_blk):
                s_row = _scale_row(s_ref, k * groups_per_blk + g)
                w_un_ref[g * group_size : g * group_size + half, :] = (
                    (lo[g * half : (g + 1) * half, :].astype(jnp.float32)
                     - 8.0)
                    * s_row.astype(jnp.float32)
                ).astype(jnp.bfloat16)
                w_un_ref[
                    g * group_size + half : (g + 1) * group_size, :
                ] = (
                    (hi[g * half : (g + 1) * half, :].astype(jnp.float32)
                     - 8.0)
                    * s_row.astype(jnp.float32)
                ).astype(jnp.bfloat16)
            acc_ref[...] += jax.lax.dot_general(
                x_blk,
                w_un_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            @pl.when(k == n_k - 1)
            def _():
                o_ref[...] = acc_ref[...].astype(o_ref.dtype)

            return
        # Restore contiguous group rows in a VMEM scratch so each group is
        # ONE K=group_size MXU dot — the same issue structure as the int8
        # kernel. The previous two-half-dots-per-group form (K=64 each)
        # halved MXU utilization per issue and measured +45%/layer vs int8
        # at 8B decode (layer sweep, round 4) — the unpack stores are VPU
        # copies and cost far less than the K=64 dots they replace.
        for g in range(groups_per_blk):
            w_un_ref[g * group_size : g * group_size + half, :] = (
                lo[g * half : (g + 1) * half, :]
            )
            w_un_ref[g * group_size + half : (g + 1) * group_size, :] = (
                hi[g * half : (g + 1) * half, :]
            )
        w_full = w_un_ref[...]
        act_int = x_blk.dtype == jnp.int8  # W8A8: integer MXU path
        dots = [
            jax.lax.dot_general(
                x_blk[:, g * group_size : (g + 1) * group_size],
                w_full[g * group_size : (g + 1) * group_size, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=(
                    jnp.int32 if act_int else jnp.float32
                ),
            )
            for g in range(groups_per_blk)
        ]
        if act_int:
            dots = [d.astype(jnp.float32) for d in dots]
        biased = True
    else:
        # Interpret-mode fallback (pltpu.bitcast and mixed dots are
        # TPU-only): float unpack (u8 = hi·16 + lo, both in [0,16)), unbias.
        pf = packed.astype(jnp.float32)
        as_f = jnp.where(pf < 0.0, pf + 256.0, pf)
        hi_f = jnp.floor(as_f * (1.0 / 16.0))
        lo_f = as_f - hi_f * 16.0
        lo = (lo_f - 8.0).astype(jnp.bfloat16)
        hi = (hi_f - 8.0).astype(jnp.bfloat16)
        biased = False
        # Packed halves are group-local (group g's first half rows in lo,
        # second half in hi): dot each half against its x slice.
        dots = [
            jax.lax.dot_general(
                x_blk[:, g * group_size : g * group_size + half],
                lo[g * half : (g + 1) * half, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                x_blk[:, g * group_size + half : (g + 1) * group_size],
                hi[g * half : (g + 1) * half, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for g in range(groups_per_blk)
        ]
    acc = None
    for g, d in enumerate(dots):
        s_row = _scale_row(s_ref, k * groups_per_blk + g)  # [1, BN]
        if biased:
            sum_x = jnp.sum(
                x_blk[
                    :, g * group_size : (g + 1) * group_size
                ].astype(jnp.float32),
                axis=1,
                keepdims=True,
            )  # [BM, 1]
            d = d - 8.0 * sum_x
        acc = d * s_row if acc is None else acc + d * s_row
    acc_ref[...] += acc

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
    block_n: int = 2048,
    interpret: bool = False,
    block_m: int = 256,
    layer: int | None = None,
) -> jnp.ndarray:
    """``layer`` selects one layer of STACKED [L, K(,/2), N] qweight/scales
    via the BlockSpec index map — no per-layer slice, so XLA never
    materializes a weight copy for the custom call (see QuantizedTensor)."""
    M, K = x.shape
    stacked = layer is not None
    N = qweight.shape[-1]
    # Big blocks: v5e executes the grid sequentially at ~0.6µs/step, so at
    # [512, 512] blocks an 8B layer costs ~830 steps ≈ 500µs of pure grid
    # overhead (measured by layer-count scaling). [1024, 2048] blocks cut
    # the step count ~16× while staying well inside VMEM.
    for gpb in (8, 4, 1):
        if K % (gpb * group_size) == 0:
            groups_per_blk = gpb
            break
    BK = group_size * groups_per_blk
    n_k = K // BK
    n_groups = K // group_size
    BN = min(block_n, N)
    while N % BN:
        BN //= 2
    assert N % BN == 0 and K % BK == 0
    want_scales = (
        (qweight.shape[0], n_groups, N) if stacked else (n_groups, N)
    )
    assert scales.shape == want_scales, (scales.shape, want_scales)

    xb = x.astype(jnp.bfloat16)
    act_scale = None
    if _W8A8 and not (bits == 4 and _I4_SINGLEDOT):
        # W8A8: dynamic symmetric per-token activation quantization. The
        # int8×int8 dots take the MXU's double-rate integer path (see
        # _scaled_dot); the per-token scale multiplies the kernel OUTPUT,
        # so the kernel itself stays scale-free on the activation side.
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        act_scale = jnp.maximum(amax, 1e-8) / 127.0     # [M, 1] f32
        xq = jnp.clip(jnp.round(xf / act_scale), -127.0, 127.0)
        # Interpret mode (CPU tests) runs the same integer VALUES through
        # the float dot path — math identical, no Mosaic mixed-int dots.
        xb = xq.astype(jnp.bfloat16 if interpret else jnp.int8)
    # M-blocking: decode batches (M ≤ block_m) run one M block and stream
    # every weight block exactly once (bandwidth-bound); prefill chunks tile
    # M and re-read weights n_m× (compute-bound — the re-read is cheap
    # relative to the MXU work, and nothing is ever materialized in HBM,
    # unlike the XLA path whose loop-invariant unpack temps OOM at 8B/32L).
    pad_m = (-M) % 8
    if pad_m:
        xb = jnp.pad(xb, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    if block_m < Mp <= 2 * block_m:
        # Decode batches just past block_m (e.g. 384 seqs at the default
        # 256) must NOT tile M: a second M block re-reads EVERY weight
        # block — measured on chip as 34.2 → 63.0 ms/step for 256 → 384
        # seqs (INT4 8B), throughput 7481 → 6090 tok/s DESPITE 1.5× rows.
        # One wider M block keeps the weight stream single-pass; BN drops
        # to keep the f32 accumulator + double-buffered in/out blocks
        # inside Mosaic's scoped VMEM.
        BM = Mp
        BN = min(BN, 1024)
    else:
        BM = min(block_m, Mp)
    if Mp % BM:
        pad2 = BM - Mp % BM
        xb = jnp.pad(xb, ((0, pad2), (0, 0)))
        Mp += pad2
    n_m = Mp // BM

    pad_g = (-n_groups) % 8
    if pad_g:
        pad_spec = ((0, 0),) * (scales.ndim - 2) + ((0, pad_g), (0, 0))
        scales = jnp.pad(scales, pad_spec)
    wk_rows = BK if bits == 8 else BK // 2
    if bits == 8:
        kernel = functools.partial(
            _kernel_i8,
            n_k=n_k,
            groups_per_blk=groups_per_blk,
            group_size=group_size,
            mixed_dot=not interpret,
            stacked=stacked,
        )
    else:
        kernel = functools.partial(
            _kernel_i4,
            n_k=n_k,
            groups_per_blk=groups_per_blk,
            group_size=group_size,
            use_bitcast=not interpret,
            stacked=stacked,
        )

    if stacked:
        w_spec = pl.BlockSpec(
            (1, wk_rows, BN), lambda m, n, k: (layer, k, n),
            memory_space=pltpu.VMEM,
        )
        s_spec = pl.BlockSpec(
            (1, n_groups + pad_g, BN), lambda m, n, k: (layer, 0, n),
            memory_space=pltpu.VMEM,
        )
    else:
        w_spec = pl.BlockSpec((wk_rows, BN), lambda m, n, k: (k, n),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((n_groups + pad_g, BN), lambda m, n, k: (0, n),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_m, N // BN, n_k),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            w_spec,
            s_spec,
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((BM, BN), jnp.float32)]
            + (
                [
                    pltpu.VMEM(
                        (BK, BN),
                        jnp.bfloat16 if _I4_SINGLEDOT else jnp.int8,
                    )
                ]
                if bits == 4
                else []
            )
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xb, qweight, scales)
    out = out[:M] if Mp != M else out
    if act_scale is not None:
        out = (out.astype(jnp.float32) * act_scale).astype(x.dtype)
    return out
