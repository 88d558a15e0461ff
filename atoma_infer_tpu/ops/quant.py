"""Weight-only INT8/INT4 quantization (+ quantized KV-cache helpers).

The reference has no quantization (an unchecked roadmap item, README Status
list); BASELINE.json requires INT8/INT4 weight-only dequant+matmul and
INT8/FP8 KV-cache support, so this module is new ground.

Scheme: symmetric per-output-channel, sub-channel (grouped along the
contraction axis) scales — ``w ≈ qweight · scale[group, out]``. INT4 packs two
values per int8 byte along the contraction axis. The XLA path dequantizes
into the matmul (XLA fuses convert+multiply into the MXU feed); a Pallas
kernel (ops/quant_kernels.py) provides the guaranteed fused path on TPU where
HBM reads stay at 1 (or 0.5) bytes/weight.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

DEFAULT_GROUP_SIZE = 128


@dataclasses.dataclass(frozen=True)
class QuantizedTensor:
    """A quantized linear weight: ``w ≈ qweight · scales`` (grouped).

    ``layer`` marks a LAYER VIEW of a stacked [L, in, out] tensor: the
    arrays stay stacked and the matmul kernel selects the layer in its
    BlockSpec index map. Slicing the stacked int8 array per layer instead
    (``qweight[i]``) forces XLA to MATERIALIZE each slice in HBM before
    the Pallas call (custom calls cannot consume slice fusions) — measured
    ~56MB × 7 copies per 8B layer: ~3.1GB of HLO temps and ~400MB/layer of
    extra HBM traffic per decode step."""

    qweight: jnp.ndarray  # int8 [in(/2 for int4), out] (+ leading L when
                          # ``layer`` is set)
    scales: jnp.ndarray   # bf16 [in//group_size, out] (+ leading L)
    bits: int = dataclasses.field(default=8, metadata=dict(static=True))
    group_size: int = dataclasses.field(
        default=DEFAULT_GROUP_SIZE, metadata=dict(static=True)
    )
    layer: int | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def in_dim(self) -> int:
        return self.qweight.shape[-2] * (2 if self.bits == 4 else 1)

    @property
    def out_dim(self) -> int:
        return self.qweight.shape[-1]


jax.tree_util.register_dataclass(
    QuantizedTensor,
    data_fields=["qweight", "scales"],
    meta_fields=["bits", "group_size", "layer"],
)

# Back-compat alias used in type positions.
QuantizedLinear = QuantizedTensor


def quantize_weight(
    w: jnp.ndarray, bits: int = 8, group_size: int = DEFAULT_GROUP_SIZE
) -> QuantizedTensor:
    """Quantize ``w: [in, out]`` to int8/int4 with grouped absmax scales."""
    assert bits in (8, 4)
    in_dim, out_dim = w.shape
    if in_dim % group_size != 0:
        group_size = in_dim  # degenerate: one group
    wf = w.astype(jnp.float32).reshape(in_dim // group_size, group_size, out_dim)
    qmax = 127.0 if bits == 8 else 7.0
    absmax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)  # [G, 1, out]
    scales = jnp.maximum(absmax / qmax, 1e-8)
    q = jnp.clip(jnp.round(wf / scales), -qmax, qmax).astype(jnp.int8)
    q = q.reshape(in_dim, out_dim)
    if bits == 4:
        # Group-local halves packing with BIASED nibbles: within each scale
        # group of rows the first half lives in low nibbles, the second half
        # in high nibbles, each stored as q+8 ∈ [1, 15]. Biased storage lets
        # the Pallas kernel dequantize with a plain subtract — no sign-fix
        # compare (Mosaic has no vector compares on 8-bit types) — and a
        # packed block unpacks with one sublane concat (no row interleave).
        assert in_dim % 2 == 0 and group_size % 2 == 0
        qg = (
            q.reshape(in_dim // group_size, group_size, out_dim).astype(
                jnp.int32
            )
            + 8
        )
        lo = qg[:, : group_size // 2].astype(jnp.uint8) & 0xF
        hi = (qg[:, group_size // 2 :].astype(jnp.uint8) & 0xF) << 4
        q = (lo | hi).astype(jnp.int8).reshape(in_dim // 2, out_dim)
    return QuantizedTensor(
        qweight=q,
        scales=scales[:, 0, :].astype(jnp.bfloat16),
        bits=bits,
        group_size=group_size,
    )


def _unpack_int4(packed: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Unpack [..., in/2, out] int8 bytes → [..., in, out] int8 in [-7, 7]
    (group-local halves, biased nibbles — see quantize_weight)."""
    as_u8 = packed.astype(jnp.uint8)
    lo = (as_u8 & 0xF).astype(jnp.int8) - 8
    hi = ((as_u8 >> 4) & 0xF).astype(jnp.int8) - 8
    half = group_size // 2
    in_half, out_dim = packed.shape[-2], packed.shape[-1]
    gs = in_half // half
    lead = packed.shape[:-2]
    lo = lo.reshape(*lead, gs, half, out_dim)
    hi = hi.reshape(*lead, gs, half, out_dim)
    full = jnp.concatenate([lo, hi], axis=-2)  # [..., gs, group, out]
    return full.reshape(*lead, in_half * 2, out_dim)


def dequantize_weight(w: QuantizedTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize the bf16 weight (tests + fallback path)."""
    q = w.qweight
    in_dim_q = q.shape[-2] * (2 if w.bits == 4 else 1)
    group_size = w.group_size if in_dim_q % w.group_size == 0 else in_dim_q
    if w.bits == 4:
        q = _unpack_int4(q, group_size)
    in_dim, out_dim = q.shape[-2:]
    scales = w.scales.astype(jnp.float32)  # [..., G, out]
    deq = q.astype(jnp.float32).reshape(
        *q.shape[:-2], in_dim // group_size, group_size, out_dim
    ) * scales[..., :, None, :]
    return deq.reshape(*q.shape[:-2], in_dim, out_dim).astype(dtype)


def quantized_matmul(x: jnp.ndarray, w: QuantizedTensor) -> jnp.ndarray:
    """``x @ dequant(w)`` with dequant fused into the contraction.

    INT8 uses the grouped XLA contraction (keeps the int8→bf16 convert
    adjacent to the dot; measured 1.75×/347GB/s-eff on v5e, faster than the
    round-1 Pallas i8 kernel). INT4 on TPU uses the Pallas kernel: XLA's
    int4 path materializes loop-invariant nibble-unpack temps in HBM (OOMs
    an 8B 32-layer model) and reached only 1.16× over bf16; the kernel
    unpacks biased nibbles with int32 bitcast ops in VMEM, streaming packed
    weights at 0.5 bytes/weight.
    """
    q = w.qweight
    stacked = w.layer is not None
    in_dim_q = q.shape[-2] * (2 if w.bits == 4 else 1)
    group_size = w.group_size if in_dim_q % w.group_size == 0 else in_dim_q
    N = q.shape[-1]
    kernel_ok = (
        jax.default_backend() == "tpu"
        and q.ndim == (3 if stacked else 2)
        and x.ndim == 2
        and in_dim_q % group_size == 0
        and N % min(512, N) == 0
        and group_size % 2 == 0
    )
    # Both widths default to the Pallas kernel: with [1024, 2048] blocks and
    # mixed bf16×int8 MXU dots it measures 2238 tok/s on the 8B INT8 decode
    # bench vs 2074 for XLA's dot-convert fusion (ATOMA_INT8_MATMUL=xla
    # opts back out).
    if kernel_ok and (
        w.bits == 4 or os.environ.get("ATOMA_INT8_MATMUL", "pallas") == "pallas"
    ):
        from .quant_kernels import quantized_matmul_pallas

        return quantized_matmul_pallas(
            x, q, w.scales, bits=w.bits, group_size=group_size,
            layer=w.layer,
        ).astype(x.dtype)
    if stacked:
        q = q[w.layer]
        w = dataclasses.replace(
            w, qweight=q, scales=w.scales[w.layer], layer=None
        )
    if w.bits == 4:
        q = _unpack_int4(q, group_size)
    in_dim, out_dim = q.shape[-2:]
    num_groups = in_dim // group_size
    scales = w.scales  # [G, out]

    xg = x.reshape(*x.shape[:-1], num_groups, group_size)
    qg = q.reshape(num_groups, group_size, out_dim)
    # bf16 operands feed the MXU on TPU; CPU XLA lacks bf16×bf16→f32 dots.
    op_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    partial = jnp.einsum(
        "...gk,gko->...go",
        xg.astype(op_dtype),
        qg.astype(op_dtype),
        preferred_element_type=jnp.float32,
    )
    out = jnp.sum(partial * scales.astype(jnp.float32), axis=-2)
    return out.astype(x.dtype)


# ----------------------------------------------------------------- KV quant
def quantize_kv(
    kv: jnp.ndarray,  # [T, num_kv_heads, head_dim]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(token, head) symmetric int8 quantization of new KV rows."""
    absmax = jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(kv / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0].astype(jnp.float32)  # [T, H]


def dequantize_kv(
    q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16
) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)
