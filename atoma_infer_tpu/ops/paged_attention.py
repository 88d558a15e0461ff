"""Pallas TPU ragged paged-attention kernel (with fused decode KV write).

The TPU-native replacement for the reference's three CUDA attention paths —
``flash_attn_varlen`` (prefill), ``flash_attn_varlen_with_block_table``
(prefix prefill) and ``flash_attn_kv_cache_full`` (split-KV decode)
(ref: csrc/src/lib.rs:1160,1392,2083; csrc/kernels/flash_fwd_kernel.h) —
expressed as ONE kernel: every query token attends causally to its sequence's
paged KV prefix. For decode batches the kernel additionally FUSES the
``reshape_and_cache`` write (ref: csrc/kernels/cache_manager.cu:140-185):
each entry patches its newly-written KV row into the loaded chunk in VMEM and
DMAs the patched 16-row window back to HBM — no separate per-layer scatter
kernel, no page read-modify-write round trip.

Design (TPU-first, not a port):
- A host-side *work list* of (sequence, query-block) entries replaces the
  reference's split-KV occupancy heuristic (csrc/src/lib.rs:2122-2199). Each
  grid step owns a block of BQ query rows from one sequence; decode sequences
  (1 query token) and prefill chunks (hundreds) use the same code path at
  different BQ.
- KV pages are DMA'd HBM→VMEM one page per descriptor with double buffering
  across page-group chunks, the Pallas analog of FA2's cp.async pipelining.
  Block tables live in SMEM via scalar prefetch (the "block table in SMEM"
  pattern the survey calls out, SURVEY.md §2.4).
- Queries and outputs are *entry-major, kv-head-major* windows
  ``[W, G·BQ, Hk·D]``: row g·BQ+i holds query head h·G+g of token i in lane
  block h. Arranged by XLA around the kernel (tiny arrays), this makes every
  per-kv-head query group a VALUE-LEVEL LANE SLICE — no per-head staging
  loops through scratch (round 1 spent ~Hq tiny VMEM stores per entry on
  both q staging and output scatter; now one slice/store per kv head).
- Online-softmax (m, l, acc) flash recurrence in f32; GQA groups q heads
  [h·G, (h+1)·G) onto kv head h, one score/PV matmul per kv head.

Fused-write correctness invariant: a loaded chunk is patched with EVERY row
of it written this step (decode ⇒ exactly the row at position kv_len−1,
located by pure position arithmetic — slot = table[pos//bs]·bs + pos%bs is
the slot-mapping contract, ref worker.rs:373-401). Stale loads that race an
earlier entry's write-back are therefore harmless: the patch re-applies the
new value, and write-backs are idempotent (pages are owned by exactly one
sequence; CoW guarantees exclusivity before append).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import AttentionMetadata

NEG_INF = -2.0e30
WB_SUB = 16  # write-back window rows (bf16 sublane tile)
WB_SUB_I8 = 32  # write-back window rows for int8 pages (int8 sublane tile)
SC_SUB = 16  # scale-page write-back window rows (bf16 sublane tile)
# Chunk-buffer ring depth (cross-entry prefetch): NB−1 entries of DMA
# lookahead. Env-tunable for perf A/B (read at trace time).
RING_BUFFERS = int(os.environ.get("ATOMA_ATTN_RING", "4"))

_LN2 = 0.6931471805599453


def _e4m3_decode(b: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """Decode raw float8_e4m3fn BYTES (int8 view) to float on the VPU.

    Mosaic on v5e has no fp8 vector ops, no 8-bit shifts/compares, and no
    16-bit-int bitcasts — so the decode runs entirely in float arithmetic
    after one int8→f32 convert (~12 VPU ops/element): unpack
    sign/exponent/mantissa by floor-division and rebuild the value as
    ``(m + 8·[e>0]) · 2^(max(e,1)−10)`` (which unifies the normal
    ``(8+m)·2^(e−10)`` and subnormal ``m·2^−9`` cases). e4m3fn's NaN byte
    (0x7F/0xFF) decodes to ±480 — the engine's quantize path clips to
    ±448 so NaN bytes never occur in the cache."""
    bf = b.astype(jnp.float32)                      # −128..127, exact
    u = jnp.where(bf < 0, bf + 256.0, bf)           # unsigned byte value
    s = jnp.floor(u * (1.0 / 128.0))                # sign bit
    r = u - 128.0 * s
    e = jnp.floor(r * 0.125)                        # 4-bit exponent
    m = r - 8.0 * e                                 # 3-bit mantissa
    t = m + 8.0 * jnp.minimum(e, 1.0)
    mag = t * jnp.exp((jnp.maximum(e, 1.0) - 10.0) * _LN2)
    return ((1.0 - 2.0 * s) * mag).astype(out_dtype)


def _pick_block_q(num_tokens: int, num_seq_slots: int) -> int:
    # Decode-dominated batches (≈1 query/seq): narrow entries avoid
    # padded-row softmax work; 2 rows is the bf16 sublane-packing minimum.
    if num_tokens <= num_seq_slots:
        return 2
    # Scale the block to the batch's tokens-per-sequence so short ragged
    # chunks (speculative verification rides (1+k)-token chunks; decode
    # sequences mixed into prefill batches ride 1-token chunks) are not
    # padded to a prefill-sized 64-row block — a 5-row verify chunk at
    # BQ=64 wastes 12.8× matmul/softmax rows (measured 39.8ms → see
    # benchmarks/spec_decode_bench.py). Long prefills still take the
    # 64-row cap (VMEM scratch bound under Mosaic's 16MB scoped limit).
    per_seq = -(-num_tokens // max(num_seq_slots, 1))
    target = 8
    while target < min(per_seq, 64):
        target *= 2
    divisors = [b for b in (8, 16, 32, 64) if num_tokens % b == 0]
    if not divisors:
        raise ValueError(f"token count {num_tokens} must be a multiple of 8")
    under = [b for b in divisors if b <= target]
    return max(under) if under else min(divisors)


def build_work_list(
    query_start_loc: jnp.ndarray,  # [S+1] int32
    num_seqs: jnp.ndarray,         # [] int32
    *,
    block_q: int,
    num_entries: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flatten the ragged batch into (seq, q_block) grid entries.

    Returns ``entry_seq`` / ``entry_qblock`` of static length ``num_entries``
    (inactive tail entries have ``entry_seq == -1``) plus the per-sequence
    entry offsets ``offs`` [S+1].
    """
    num_slots = query_start_loc.shape[0] - 1
    q_lens = query_start_loc[1:] - query_start_loc[:-1]
    active = jnp.arange(num_slots, dtype=jnp.int32) < num_seqs
    nblocks = jnp.where(active, pl.cdiv(q_lens, block_q), 0)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nblocks, dtype=jnp.int32)]
    )
    eids = jnp.arange(num_entries, dtype=jnp.int32)
    seq = jnp.searchsorted(offs, eids, side="right").astype(jnp.int32) - 1
    seq = jnp.clip(seq, 0, num_slots - 1)
    qblock = eids - offs[seq]
    valid = eids < offs[num_slots]
    return jnp.where(valid, seq, -1), jnp.where(valid, qblock, 0), offs


def _kernel(
    # scalar prefetch (SMEM)
    entry_seq_ref,    # [W]
    entry_qb_ref,     # [W]
    block_tables_ref, # [S, P]
    seq_lens_ref,     # [S]
    qsl_ref,          # [S+1]
    # tensor refs (q/o are entry-major, kv-head-major lanes)
    q_hbm,            # [W, G*BQ, Hk*D]
    kvn_ref,          # [Tp, 2*Hk*D] VMEM — staged new rows (fused write)
    scn_ref,          # [Tp, 128] bf16 VMEM — staged new-row scale rows
    kv_hbm_in,        # [num_pages, bs, 2*Hk*D] (aliased to kv_hbm)
    sc_hbm_in,        # [num_pages, bs, 128] bf16 (aliased to sc_hbm; int8 KV)
    slope_ref,        # [G*BQ, 128] f32 VMEM — ALiBi slope of q head h·G+g at
                      # (row g·BQ+i, lane h); zeros row when alibi disabled
    o_hbm,            # [W, G*BQ, Hk*D]
    kv_hbm,           # cache output (aliased; head-interleaved K|V rows)
    sc_hbm,           # scale pages output (aliased; K lane 0, V lane 1)
    # scratch — a flat ring of NB chunk buffers. multi-chunk mode maps
    # (entry parity, chunk parity) onto it; single-chunk mode rotates
    # entries through all NB slots for deep cross-entry prefetch.
    q_vmem,           # [NB, G*BQ, Hk*D]
    kv_vmem,          # [NB, CP, bs, 2*Hk*D]
    sc_vmem,          # [NB, CP, bs, 128] bf16 — scale pages ride the chunk DMA
    o_vmem,           # [G*BQ, Hk*D]
    wb_flag,          # SMEM [NB] — write-back DMA in flight per slot
    qblk_vmem,        # [Hk·G·BQ, 2·Hk·D] — block-diagonal staged queries
                      # (head-fused decode path; [8, 128] dummy otherwise)
    pv_vmem,          # [Hk·G·BQ, D] f32 — PV diagonal-block extraction
    q_sems,           # DMA sems [NB]
    kv_sems,          # DMA sems [NB]
    sc_sems,          # DMA sems [NB]
    o_sem,
    wb_sems,          # DMA sems [NB]
    *,
    scale: float,
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    block_q: int,
    block_size: int,
    pages_per_chunk: int,
    sliding_window: Optional[int],
    soft_cap: Optional[float],
    fuse_write: bool,
    single_chunk: bool,
    quant: bool,
    quant_mxu: bool,
    fp8: bool,
    alibi: bool,
    wb_sub: int,
    qo_vmem: bool,
    entries_per_step: int,
    head_fused: bool,
):
    EPS = entries_per_step
    g = pl.program_id(0)
    W = entry_seq_ref.shape[0]  # total entries (== grid·EPS)
    e = g * EPS  # first entry of this grid step
    s = entry_seq_ref[e]
    active = s >= 0
    s = jnp.maximum(s, 0)
    b = entry_qb_ref[e]

    NB = RING_BUFFERS
    BQ = block_q
    CP = pages_per_chunk
    bs = block_size
    CHUNK = CP * bs
    num_pages = block_tables_ref.shape[1]
    max_page = kv_hbm.shape[0] - 1
    Hq, Hk, D = num_q_heads, num_kv_heads, head_dim
    G = Hq // Hk
    GBQ = G * BQ

    q_start = qsl_ref[s]
    q_len = qsl_ref[s + 1] - q_start
    kv_len = seq_lens_ref[s]

    def kv_slot(eidx, j):
        """Ring slot of (entry, chunk). Single-chunk: entries rotate through
        all NB slots (chunk j is always 0). Multi-chunk: 2 slots per entry
        parity, double-buffered over chunks."""
        if single_chunk:
            return eidx % NB
        return 2 * (eidx % 2) + j % 2

    def q_slot(eidx):
        return eidx % (NB if single_chunk else 2)

    def maybe_wait_wb(slot):
        """Drain a pending write-back DMA before its source buffer is
        overwritten by a new chunk load."""
        if not fuse_write:
            return

        @pl.when(wb_flag[slot] == 1)
        def _():
            # Wait sized to the window's byte count (dst ref shape).
            pltpu.make_async_copy(
                kv_vmem.at[slot, 0, pl.ds(0, wb_sub)],
                kv_hbm.at[0, pl.ds(0, wb_sub)],
                wb_sems.at[slot],
            ).wait()
            if quant:
                # The int8 fused write also wrote back a scale-page window
                # on the same semaphore; drain it with a second sized wait.
                pltpu.make_async_copy(
                    sc_vmem.at[slot, 0, pl.ds(0, SC_SUB)],
                    sc_hbm.at[0, pl.ds(0, SC_SUB)],
                    wb_sems.at[slot],
                ).wait()
            wb_flag[slot] = 0

    def start_chunk(seq, slot, chunk):
        # Drain any write-back still reading this slot before overwriting it
        # (dropped by mistake in the coalescing revert; the race window is
        # small — WB starts a grid step earlier — but unguaranteed).
        maybe_wait_wb(slot)
        # Plain per-page descriptors. A 4-page run-coalescing variant was
        # measured on hardware and REVERTED: the contiguity scalar checks +
        # branches cost as much as the saved descriptor issues (permuted
        # tables regressed 5-17%, contiguous gained nothing) — per-entry
        # fixed cost is not descriptor issue.
        for p in range(CP):
            idx = jnp.minimum(chunk * CP + p, num_pages - 1)
            page = jnp.clip(block_tables_ref[seq, idx], 0, max_page)
            pltpu.make_async_copy(
                kv_hbm.at[page],
                kv_vmem.at[slot, p],
                kv_sems.at[slot],
            ).start()
            if quant:
                pltpu.make_async_copy(
                    sc_hbm.at[page],
                    sc_vmem.at[slot, p],
                    sc_sems.at[slot],
                ).start()

    def wait_chunk(slot):
        # All CP page copies signal the same semaphore; one wait sized to the
        # whole chunk buffer (DMA waits count destination bytes) replaces CP
        # per-descriptor waits.
        pltpu.make_async_copy(
            kv_hbm.at[pl.ds(0, CP)],
            kv_vmem.at[slot],
            kv_sems.at[slot],
        ).wait()
        if quant:
            pltpu.make_async_copy(
                sc_hbm.at[pl.ds(0, CP)],
                sc_vmem.at[slot],
                sc_sems.at[slot],
            ).wait()

    def q_dma(eidx, slot):
        return pltpu.make_async_copy(
            q_hbm.at[eidx], q_vmem.at[slot], q_sems.at[slot]
        )

    def issue_entry(eidx):
        """Start entry eidx's q + first-chunk DMAs (if it is active)."""
        eidx_c = jnp.minimum(eidx, W - 1)
        s_i = entry_seq_ref[eidx_c]

        @pl.when((eidx < W) & (s_i >= 0))
        def _():
            if not qo_vmem:
                q_dma(eidx_c, q_slot(eidx_c)).start()
            start_chunk(jnp.maximum(s_i, 0), kv_slot(eidx_c, 0), 0)

    def load_q(eidx):
        """This entry's [G·BQ, Hk·D] query window. VMEM-resident q (small
        decode batches) reads it directly; otherwise waits on the manual
        per-entry DMA started by issue_entry."""
        if qo_vmem:
            return q_hbm[eidx]
        q_dma(eidx, q_slot(eidx)).wait()
        return q_vmem[q_slot(eidx)]

    def patch_and_writeback(slot, j, s, q_start, q_len, kv_len):
        """Fused KV write: patch this entry's newly written row (position
        kv_len−1, decode ⇒ q_len==1) into the loaded chunk and DMA the
        patched 16-row window back to its HBM page."""
        w_pos = kv_len - 1
        j_w = w_pos // CHUNK

        @pl.when((j == j_w) & (q_len == 1))
        def _():
            r_w = w_pos - j_w * CHUNK      # chunk-local row
            p_idx = r_w // bs              # page slot in chunk
            pr = r_w % bs                  # row within page
            base = pl.multiple_of((pr // wb_sub) * wb_sub, wb_sub)
            # Staged new row: aligned-window read + mask-select
            # (Mosaic cannot address a single dynamic VMEM row).
            tb = pl.multiple_of((q_start // wb_sub) * wb_sub, wb_sub)
            winq = kvn_ref[pl.ds(tb, wb_sub), :]
            rid = jax.lax.broadcasted_iota(jnp.int32, (wb_sub, 1), 0)
            new_row = jnp.sum(
                jnp.where(
                    rid == q_start - tb, winq.astype(jnp.float32), 0.0
                ),
                axis=0,
            )  # [2·Hk·D]
            win = kv_vmem[slot, p_idx, pl.ds(base, wb_sub), :]
            patched = jnp.where(
                rid == pr - base, new_row[None, :].astype(win.dtype), win
            )
            kv_vmem[slot, p_idx, pl.ds(base, wb_sub), :] = patched
            page_w = jnp.clip(
                block_tables_ref[s, j_w * CP + p_idx], 0, max_page
            )
            pltpu.make_async_copy(
                kv_vmem.at[slot, p_idx, pl.ds(base, wb_sub)],
                kv_hbm.at[page_w, pl.ds(base, wb_sub)],
                wb_sems.at[slot],
            ).start()
            if quant:
                # Patch the new row's scale row (K lane 0, V lane 1) into
                # the loaded scale page and write its 16-row bf16 window
                # back too.
                base_s = pl.multiple_of((pr // SC_SUB) * SC_SUB, SC_SUB)
                tb_s = pl.multiple_of(
                    (q_start // SC_SUB) * SC_SUB, SC_SUB
                )
                wins = scn_ref[pl.ds(tb_s, SC_SUB), :]
                rid_s = jax.lax.broadcasted_iota(
                    jnp.int32, (SC_SUB, 1), 0
                )
                new_sc = jnp.sum(
                    jnp.where(
                        rid_s == q_start - tb_s,
                        wins.astype(jnp.float32),
                        0.0,
                    ),
                    axis=0,
                )  # [128]
                win_s = sc_vmem[slot, p_idx, pl.ds(base_s, SC_SUB), :]
                patched_s = jnp.where(
                    rid_s == pr - base_s,
                    new_sc[None, :].astype(win_s.dtype),
                    win_s,
                )
                sc_vmem[slot, p_idx, pl.ds(base_s, SC_SUB), :] = patched_s
                pltpu.make_async_copy(
                    sc_vmem.at[slot, p_idx, pl.ds(base_s, SC_SUB)],
                    sc_hbm.at[page_w, pl.ds(base_s, SC_SUB)],
                    wb_sems.at[slot],
                ).start()
            wb_flag[slot] = 1

    # Absolute key position each query row may attend up to; row r of a
    # group is query i = r % BQ (rows are g-major: g·BQ + i).
    row_query = jax.lax.broadcasted_iota(jnp.int32, (GBQ, 1), 0) % BQ
    pos = kv_len - q_len + b * BQ + row_query  # [G·BQ, 1]
    HGBQ = Hk * GBQ  # head-fused row count (row h·GBQ + g·BQ + i)

    def stage_qblk(q_all):
        """Scatter this entry's [G·BQ, Hk·D] query window onto the block
        diagonal of ``qblk_vmem`` [Hk·GBQ, 2·Hk·D]: head h's group lands at
        rows [h·GBQ, (h+1)·GBQ) in its K-lane block [h·2D, h·2D+D). All
        off-diagonal positions stay at their grid-step-0 zeros (every entry
        rewrites the same diagonal slots), so ONE matmul against the raw
        [CHUNK, 2·Hk·D] chunk rows computes every head's scores at once —
        the zero lanes null out other heads' K and all V lanes."""
        for h in range(Hk):
            qblk_vmem[
                h * GBQ : (h + 1) * GBQ, h * 2 * D : h * 2 * D + D
            ] = q_all[:, h * D : (h + 1) * D]

    def scale_rows(slot, nrows):
        """Lane-major per-KV-row dequant scales [nrows, CHUNK] from the
        scale pages (K scale at lane 0, V at lane 1 of each page row).

        The scales are needed as score COLUMNS — along lanes — but pages
        store them along sublanes ([CHUNK, 128]), and Mosaic has no
        lane<->sublane transpose. Two one-hot MXU dots do the transpose:
        ``e_k[nrows,128] . scv[CHUNK,128]^T`` lands row c's lane-0 value at
        every (row, c). ~0.2us each, replacing the whole-chunk VPU dequant
        (~3M VPU ops/entry — measured 6.75us/entry at 8B ctx 512, ~5x the
        KV-read roofline): the cache now feeds the MXU as raw int8 (mixed
        bf16xint8 dots, like ops/quant_kernels) and scales apply to the
        small [rows, CHUNK] score/probability matrices after the dots."""
        scv = sc_vmem[slot].reshape(CHUNK, 128)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 1)
        dims = (((1,), (1,)), ((), ()))
        e_k = (lane_iota == 0).astype(scv.dtype)
        e_v = (lane_iota == 1).astype(scv.dtype)
        k_rows = jax.lax.dot_general(
            e_k, scv, dims, preferred_element_type=jnp.float32
        )
        v_rows = jax.lax.dot_general(
            e_v, scv, dims, preferred_element_type=jnp.float32
        )
        return k_rows, v_rows

    def attend_chunk_fused(slot, j, carry, kv_len=kv_len):
        """Head-fused online-softmax update: 2 MXU dots per chunk total
        (block-diagonal QK^T, then one PV against the full chunk rows with
        diagonal-block extraction) instead of 2·Hk per-head dots. At decode
        the per-head dots are issue-latency-bound (M = G·BQ = 8 rows,
        ~0.19µs each measured), so fusing them into one wide dot trades
        idle-MXU FLOPs (Hk× more, still ≪ 1µs at peak) for Hk× fewer
        serial MXU issues. VPU softmax work is unchanged — the same
        Hk·GBQ·CHUNK elements, one [Hk·GBQ, CHUNK] block instead of Hk
        [GBQ, CHUNK] blocks."""
        m, l, acc = carry  # [HGBQ, 1], [HGBQ, 1], [HGBQ, D]
        kv_all = kv_vmem[slot].reshape(CHUNK, 2 * Hk * D)
        if fp8:
            # e4m3 bytes → bf16 on the VPU before the dots (scale-free).
            kv_all = _e4m3_decode(kv_all, qblk_vmem.dtype)
        if quant:
            # Raw int8 chunk rows feed the MXU; scales apply post-dot (see
            # scale_rows). K scale lands on the scores, V scale folds into
            # the probabilities — both tiny [HGBQ, CHUNK] multiplies.
            k_rows, v_rows = scale_rows(slot, HGBQ)
            if not quant_mxu:
                # Interpret mode rejects mixed-dtype dots: convert only
                # (scales still apply post-dot — identical math).
                kv_all = kv_all.astype(qblk_vmem.dtype)

        col = j * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        rq = jax.lax.broadcasted_iota(jnp.int32, (HGBQ, 1), 0) % BQ
        posf = kv_len - q_len + b * BQ + rq  # [HGBQ, 1]
        mask = (col <= posf) & (col < kv_len)
        if sliding_window is not None:
            mask &= col > posf - sliding_window

        sc = jax.lax.dot_general(
            qblk_vmem[...],
            kv_all,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [HGBQ, CHUNK]
        sc = sc * (k_rows * scale) if quant else sc * scale
        if soft_cap is not None:
            sc = soft_cap * jnp.tanh(sc / soft_cap)
        if alibi:
            # Fused slope layout: [HGBQ, 128] with the row's q-head slope
            # at lane 0 (host-built; see _paged_attention_call).
            sl_lane = jax.lax.broadcasted_iota(jnp.int32, (HGBQ, 128), 1)
            slope_col = jnp.sum(
                jnp.where(sl_lane == 0, slope_ref[...], 0.0),
                axis=1,
                keepdims=True,
            )
            sc = sc + slope_col * (col - posf).astype(jnp.float32)
        sc = jnp.where(mask, sc, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
        p_ = jnp.exp(sc - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p_, axis=-1, keepdims=True)

        if quant:
            # Fold the V dequant scale into p (per KV row = per column).
            p_ = p_ * v_rows
        out_blk = jax.lax.dot_general(
            p_.astype(qblk_vmem.dtype),
            kv_all,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [HGBQ, 2·Hk·D] — diagonal V blocks are the per-head PV results
        # Mosaic cannot concat lane-offset slices — stage the diagonal
        # blocks through the pv scratch (stores realign).
        for h in range(Hk):
            pv_vmem[h * GBQ : (h + 1) * GBQ, :] = out_blk[
                h * GBQ : (h + 1) * GBQ, h * 2 * D + D : (h + 1) * 2 * D
            ]
        acc_new = acc * alpha + pv_vmem[...]
        return (m_new, l_new, acc_new)

    def attend_chunk(q_all, slot, j, carry, pos=pos, kv_len=kv_len):
        """Online-softmax update of (m, l, acc) per kv head over one chunk."""
        kv_all = kv_vmem[slot].reshape(CHUNK, 2 * Hk * D)
        if fp8:
            # e4m3 bytes → bf16 on the VPU before the dots (scale-free).
            kv_all = _e4m3_decode(kv_all, q_all.dtype)
        col = j * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        mask = (col <= pos) & (col < kv_len)  # [G·BQ, CHUNK]
        if sliding_window is not None:
            mask &= col > pos - sliding_window

        if quant:
            # Raw int8 rows feed the MXU; scales apply post-dot — K on the
            # scores, V folded into the probabilities (see scale_rows).
            k_rows, v_rows = scale_rows(slot, GBQ)
            if not quant_mxu:
                # Interpret mode rejects mixed-dtype dots: convert only
                # (scales still apply post-dot — identical math).
                kv_all = kv_all.astype(q_all.dtype)

        # Phase 1: all per-head score matmuls, back to back — the 2·Hk
        # per-head matmuls are the dominant per-entry cost at decode (the
        # constant-FLOPs --heads probe measured ~0.19µs/kv-head), and
        # grouping the independent QK^T dots gives the scheduler a run of
        # MXU work with no interleaved VPU dependencies.
        scores = []
        for h in range(Hk):
            # Head-interleaved rows: [K_h | V_h] at lanes [h·2D, (h+1)·2D).
            kh = kv_all[:, h * 2 * D : h * 2 * D + D]  # [CHUNK, D]
            dot = jax.lax.dot_general(
                q_all[:, h * D : (h + 1) * D],
                kh,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G·BQ, CHUNK]
            scores.append(dot * (k_rows * scale) if quant else dot * scale)

        # Phase 2: per-head masked online-softmax updates (pure VPU).
        softmaxed = []
        for h in range(Hk):
            m, l, acc = carry[h]
            sc = scores[h]
            if soft_cap is not None:
                sc = soft_cap * jnp.tanh(sc / soft_cap)
            if alibi:
                # ALiBi bias (ref: csrc/kernels/alibi.h): slope_h·(col−pos).
                # Per-head slope column via lane-masked reduction (Mosaic
                # rejects unaligned lane slicing).
                sl_lane = jax.lax.broadcasted_iota(
                    jnp.int32, (GBQ, 128), 1
                )
                slope_col = jnp.sum(
                    jnp.where(sl_lane == h, slope_ref[...], 0.0),
                    axis=1,
                    keepdims=True,
                )  # [G·BQ, 1]
                sc = sc + slope_col * (col - pos).astype(jnp.float32)
            sc = jnp.where(mask, sc, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
            p_ = jnp.exp(sc - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p_, axis=-1, keepdims=True)
            if quant:
                # Fold the V dequant scale into p (per KV row = per column).
                p_ = p_ * v_rows
            softmaxed.append((m_new, l_new, alpha, p_))

        # Phase 3: all PV matmuls back to back (same scheduling rationale
        # as phase 1).
        new_carry = []
        for h in range(Hk):
            vh = kv_all[:, h * 2 * D + D : (h + 1) * 2 * D]
            m_new, l_new, alpha, p_ = softmaxed[h]
            acc = carry[h][2]
            acc_new = acc * alpha + jax.lax.dot_general(
                p_.astype(q_all.dtype),
                vh,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G·BQ, D]
            new_carry.append((m_new, l_new, acc_new))
        return tuple(new_carry)

    def finalize(carry, eidx=None):
        eidx = e if eidx is None else eidx
        if head_fused:
            m, l, acc = carry
            out_all = acc / jnp.maximum(l, 1e-30)  # [HGBQ, D]
            if qo_vmem:
                for h in range(Hk):
                    o_hbm[eidx, :, h * D : (h + 1) * D] = out_all[
                        h * GBQ : (h + 1) * GBQ
                    ].astype(o_hbm.dtype)
                return
            for h in range(Hk):
                o_vmem[:, h * D : (h + 1) * D] = out_all[
                    h * GBQ : (h + 1) * GBQ
                ].astype(o_vmem.dtype)
            o_dma = pltpu.make_async_copy(o_vmem, o_hbm.at[eidx], o_sem)
            o_dma.start()
            o_dma.wait()
            return
        if qo_vmem:
            # VMEM-resident output: per-head stores at a dynamic entry row —
            # no per-entry DMA, no synchronous wait (Pallas writes the whole
            # array back once after the last grid step).
            for h in range(Hk):
                _, l, acc = carry[h]
                out_h = acc / jnp.maximum(l, 1e-30)  # [G·BQ, D]
                o_hbm[eidx, :, h * D : (h + 1) * D] = out_h.astype(
                    o_hbm.dtype
                )
            return
        for h in range(Hk):
            _, l, acc = carry[h]
            out_h = acc / jnp.maximum(l, 1e-30)  # [G·BQ, D]
            o_vmem[:, h * D : (h + 1) * D] = out_h.astype(o_vmem.dtype)
        o_dma = pltpu.make_async_copy(o_vmem, o_hbm.at[eidx], o_sem)
        o_dma.start()
        o_dma.wait()

    if head_fused:
        init = (
            jnp.full((HGBQ, 1), NEG_INF, jnp.float32),
            jnp.zeros((HGBQ, 1), jnp.float32),
            jnp.zeros((HGBQ, D), jnp.float32),
        )

        # Off-diagonal q lanes must read as zero for every entry; entries
        # only ever rewrite the diagonal slots, so zero once up front.
        @pl.when(e == 0)
        def _():
            qblk_vmem[...] = jnp.zeros(qblk_vmem.shape, qblk_vmem.dtype)

    else:
        init = tuple(
            (
                jnp.full((GBQ, 1), NEG_INF, jnp.float32),
                jnp.zeros((GBQ, 1), jnp.float32),
                jnp.zeros((GBQ, D), jnp.float32),
            )
            for _ in range(Hk)
        )

    if fuse_write:

        @pl.when(e == 0)
        def _():
            for i in range(NB):
                wb_flag[i] = 0

    # NOTE (measured dead end): a two-entries-per-grid-step variant of the
    # single-chunk branch (grid W/2, per-entry scalars, NB=2·EPS ring with
    # one-step lookahead) REGRESSED 4% at 256-seq decode — the per-entry
    # pl.when regions gain no cross-entry MXU overlap and the shallower
    # DMA lookahead (2 entries vs 3) costs more than the halved grid
    # overhead saves. The helpers stay parameterized by per-entry scalars.
    if single_chunk:
        # Deep pipeline: NB−1 entries of lookahead keep NB chunk DMAs in
        # flight — the analog of FA2's multi-stage cp.async pipelining for
        # the inter-entry (not intra-entry) axis, which is where decode
        # spends its time (one chunk covers the whole context).
        # Prologue issues entries 0..NB−2 only; each entry e then issues
        # e+NB−1, so entry NB−1 is issued exactly once (by e=0). Issuing it
        # in the prologue too would double-start its DMAs and over-signal
        # the slot semaphores (hardware FailedPrecondition; interpret mode
        # does not model semaphore counts and cannot catch it).
        @pl.when(e == 0)
        def _():
            for k in range(min(NB - 1, W)):
                issue_entry(k)

        @pl.when(active)
        def _():
            issue_entry(e + NB - 1)
            slot = kv_slot(e, 0)
            q_all = load_q(e)
            if head_fused:
                stage_qblk(q_all)
            wait_chunk(slot)
            if fuse_write:
                patch_and_writeback(slot, 0, s, q_start, q_len, kv_len)
            finalize(
                attend_chunk_fused(slot, 0, init)
                if head_fused
                else attend_chunk(q_all, slot, 0, init)
            )
    else:

        @pl.when(active & (e == 0))
        def _():
            issue_entry(e)

        @pl.when(active)
        def _():
            issue_entry(e + 1)
            # Causal chunk limit: this entry's highest query row attends up
            # to position kv_len−q_len+(b+1)·BQ−1; later chunks are fully
            # masked — skip their DMA + compute entirely. This is the
            # work-list analog of the reference's split-KV early exit
            # (csrc/src/lib.rs:2122-2199): halves long-prefill attention
            # traffic on average. Decode (q_len==1, b==0) is unaffected
            # (limit == kv_len).
            limit = jnp.minimum(kv_len, kv_len - q_len + (b + 1) * BQ)
            nc = pl.cdiv(limit, CHUNK)
            # Per-kv-head query groups are VALUE lane slices of the
            # prearranged [G·BQ, Hk·D] window — no staging.
            q_all = load_q(e)
            if head_fused:
                stage_qblk(q_all)

            def chunk_body(j, carry):
                @pl.when(j + 1 < nc)
                def _():
                    start_chunk(s, kv_slot(e, j + 1), j + 1)

                slot = kv_slot(e, j)
                wait_chunk(slot)
                if fuse_write:
                    patch_and_writeback(slot, j, s, q_start, q_len, kv_len)
                if head_fused:
                    return attend_chunk_fused(slot, j, carry)
                return attend_chunk(q_all, slot, j, carry)

            finalize(jax.lax.fori_loop(0, nc, chunk_body, init))

    if fuse_write:
        # Drain outstanding write-backs before the kernel exits (runs even
        # when the final entries are inactive padding).
        @pl.when(g == pl.num_programs(0) - 1)
        def _():
            for slot in range(NB):
                maybe_wait_wb(slot)


def _entries_to_gmajor(q_entries, W, BQ, Hk, G, D):
    """[W, BQ, Hq·D] → [W, G·BQ, Hk·D] (q head h·G+g of query i lands in
    row g·BQ+i, lane block h)."""
    return (
        q_entries.reshape(W, BQ, Hk, G, D)
        .transpose(0, 3, 1, 2, 4)
        .reshape(W, G * BQ, Hk * D)
    )


def _gmajor_to_entries(out_gm, W, BQ, Hk, G, D):
    """Inverse of :func:`_entries_to_gmajor` → [W, BQ, Hq·D]."""
    return (
        out_gm.reshape(W, G, BQ, Hk, D)
        .transpose(0, 2, 3, 1, 4)
        .reshape(W, BQ, Hk * G * D)
    )


def _paged_attention_call(
    q: jnp.ndarray,         # [T, Hq, D]
    kv_cache: jnp.ndarray,  # [num_pages, block_size, 2*Hk*D] (page-major)
    meta: AttentionMetadata,
    kvn: Optional[jnp.ndarray],  # [T, 2*Hk*D] staged new rows (fused write)
    *,
    scale: float,
    sliding_window: Optional[int],
    soft_cap: Optional[float],
    block_q: Optional[int],
    pages_per_chunk: Optional[int],
    interpret: bool,
    kv_scales: Optional[jnp.ndarray] = None,  # [pages, bs, 128] bf16 pages
    scn: Optional[jnp.ndarray] = None,        # [T, 128] staged scale rows
    alibi_slopes: Optional[jnp.ndarray] = None,  # [Hq] f32
):
    T, Hq, D = q.shape
    num_pages_total, bs_cache, row = kv_cache.shape
    Hk = row // (2 * D)
    G = Hq // Hk
    S = meta.seq_lens.shape[0]
    P = meta.block_tables.shape[1]
    bs = meta.block_size
    quant = kv_scales is not None
    # FP8 (e4m3) caches ride the byte-page machinery: bitcast to int8 at
    # the kernel boundary (a free XLA bitcast — no copy, alias-preserving)
    # and decode bytes→bf16 on the VPU inside the kernel (_e4m3_decode).
    # Scale-free, so none of the int8 scale-page plumbing engages.
    fp8 = kv_cache.dtype == jnp.float8_e4m3fn
    if fp8:
        assert kv_scales is None, "fp8 KV is scale-free"
        kv_cache = jax.lax.bitcast_convert_type(kv_cache, jnp.int8)
        if kvn is not None:
            kvn = jax.lax.bitcast_convert_type(kvn, jnp.int8)
    wbs = WB_SUB_I8 if jnp.dtype(kv_cache.dtype).itemsize == 1 else WB_SUB
    BQ = block_q or _pick_block_q(T, S)
    # Narrow (decode) blocks take the largest chunk the VMEM ring budget
    # allows, up to 1024 rows (multi-chunk decode at ctx 2k-8k measured ~7×
    # off roofline with 512-row chunks — per-chunk fixed costs dominate).
    # The budget keeps ring + q/o/staging under Mosaic's 16MB scoped-VMEM
    # cap across row widths (8B bf16 rows are 4KB; a fixed 1024-row chunk
    # put the 4-slot ring alone at 16MB and failed to compile).
    itemsize = jnp.dtype(kv_cache.dtype).itemsize
    row_bytes = row * itemsize + (256 if quant else 0)  # + scale-page share
    ring_budget = 10 * 1024 * 1024
    cp_budget = max(1, ring_budget // (RING_BUFFERS * bs * row_bytes))
    max_chunk_rows = 1024 if BQ <= 16 else 256
    CP = pages_per_chunk or max(1, min(max_chunk_rows // bs, cp_budget))
    CP = min(CP, P)
    # Single-chunk mode: when the whole (bucketed) block table fits one
    # chunk within the VMEM ring budget, each entry is exactly one chunk and
    # the ring prefetches RING_BUFFERS−1 entries ahead — decode is
    # inter-entry-latency-bound, not intra-entry.
    chunk_bytes = P * bs * row * itemsize
    if quant:
        # One bf16 lane tile of scale page per cache page rides along.
        chunk_bytes += P * bs * 128 * 2
    single_chunk = (
        pages_per_chunk is None
        and BQ <= 16
        # Per-chunk budget (2MB = the historical 8MB/4-slot ring): a deeper
        # env-tuned ring must not flip the regime it is trying to measure.
        and chunk_bytes <= 2 * 1024 * 1024
        and RING_BUFFERS * chunk_bytes <= 12 * 1024 * 1024
    )
    if single_chunk:
        CP = P
    # Decode-only batches have exactly one entry per active sequence, so the
    # work list is S entries exactly; the general worst case pads to 1.5·S
    # grid steps of pure overhead at BQ=2. Rounded up to even so the
    # two-entries-per-step mode divides the work list (the pad entry is
    # inactive).
    W = S if meta.decode_only else T // BQ + S
    W += W % 2
    # VMEM-resident q/o: for decode batches the whole entry-major q and
    # output arrays live in VMEM for the kernel's duration — no per-entry
    # q DMA wait, no synchronous per-entry output DMA (measured ~1µs/entry
    # on v5e). Budget is JOINT with the chunk ring: ring + q + o must stay
    # within Mosaic's ~16MB scoped VMEM (13MB leaves room for the small
    # q/o/scale scratch) — a fixed 4MB qo cap turned the path off at
    # decode batches ≥ 384 where it matters most.
    # Head-fused decode: block-diagonal q staging folds the 2·Hk per-head
    # MXU dots per chunk into 2 (see attend_chunk_fused). Gated to the
    # regime where it MEASURED faster on v5e (1B shapes): multi-chunk mode
    # with deep (long-context-capable) block tables, where the 2-slot ring's
    # one-entry lookahead leaves per-head dot issues exposed (+23% @ctx 512
    # / P=1025 tables, +2.4% @2k, ~0 @8k, batch 64). In single-chunk mode
    # the 4-slot ring + 3-entry prefetch already hides the issues and
    # fusion's Hk× idle-FLOPs became the critical path (−2.3% e2e @64 seqs,
    # −2.5% @256); shallow tables at 256 entries also lost (−2.5%, P=33) —
    # both excluded. Alignment needs G·BQ a sublane multiple and D a
    # 64-lane multiple; decode-shaped (BQ ≤ 2) entries only.
    GBQ_ = G * BQ
    fuse_env = os.environ.get("ATOMA_HEAD_FUSE", "1")  # 0 | 1 (auto) | force
    head_fused = (
        fuse_env != "0"
        and Hk > 1
        and BQ <= 2
        and (fuse_env == "force" or (not single_chunk and P >= 256 and S <= 128))
        and GBQ_ % 8 == 0
        and D % 64 == 0
        and Hk * GBQ_ <= 256
    )
    qo_bytes = W * G * BQ * Hk * D * q.dtype.itemsize
    ring_bytes = RING_BUFFERS * min(chunk_bytes, CP * bs * row_bytes)
    qo_vmem = (
        single_chunk
        and ring_bytes + 2 * qo_bytes <= 13 * 1024 * 1024
    )
    EPS = 1  # entries per grid step (2 measured slower — see kernel note)

    fuse_write = kvn is not None
    assert not (fuse_write and quant and scn is None)
    if fuse_write:
        pad = (-kvn.shape[0]) % wbs
        if pad:
            kvn = jnp.pad(kvn, ((0, pad), (0, 0)))
    else:
        kvn = jnp.zeros((wbs, row), kv_cache.dtype)
    if quant and scn is not None:
        pad_s = (-scn.shape[0]) % SC_SUB
        if pad_s:
            scn = jnp.pad(scn, ((0, pad_s), (0, 0)))
    else:
        scn = jnp.zeros((SC_SUB, 128), jnp.bfloat16)
    sc_in = (
        kv_scales
        if quant
        else jnp.zeros((1, bs_cache, 128), jnp.bfloat16)
    )

    alibi = alibi_slopes is not None
    if alibi and head_fused:
        # Head-fused slope layout: [Hk·G·BQ, 128] with row h·GBQ+g·BQ+i
        # carrying q head h·G+g's slope at lane 0.
        r = jnp.arange(Hk * G * BQ, dtype=jnp.int32)
        qhead = (r // (G * BQ)) * G + (r % (G * BQ)) // BQ      # [HGBQ]
        lanes = jnp.arange(128, dtype=jnp.int32)                # [128]
        slope_mat = jnp.where(
            lanes[None, :] == 0,
            alibi_slopes.astype(jnp.float32)[qhead][:, None],
            0.0,
        )
    elif alibi:
        # Slope of q head h·G+g at (row g·BQ+i, lane h) — a [G·BQ, 128]
        # constant the kernel reduces per kv head (traced, so TP shard_map
        # can feed per-shard slopes).
        g_row = jnp.arange(G * BQ, dtype=jnp.int32) // BQ       # [GBQ]
        lanes = jnp.arange(128, dtype=jnp.int32)                # [128]
        hmat = jnp.clip(lanes[None, :] * G + g_row[:, None], 0, Hq - 1)
        slope_mat = jnp.where(
            lanes[None, :] < Hk,
            alibi_slopes.astype(jnp.float32)[hmat],
            0.0,
        )
    else:
        slope_mat = jnp.zeros((G * BQ, 128), jnp.float32)

    qsl = meta.query_start_loc
    entry_seq, entry_qb, offs = build_work_list(
        qsl, meta.num_seqs, block_q=BQ, num_entries=W
    )

    assert bs_cache == bs, (bs_cache, bs)
    # Entry-major q windows, then kv-head-major lanes: every kernel DMA is
    # statically tile-aligned, entry output windows are disjoint, and each
    # per-kv-head query group is a value lane slice inside the kernel.
    q2 = q.reshape(T, Hq * D)

    base_row = qsl[jnp.clip(entry_seq, 0, S - 1)] + entry_qb * BQ  # [W]
    row_idx = base_row[:, None] + jnp.arange(BQ, dtype=jnp.int32)[None, :]
    row_idx = jnp.clip(row_idx, 0, T - 1)
    q_entries = _entries_to_gmajor(q2[row_idx], W, BQ, Hk, G, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(W // EPS,),
        in_specs=[
            pl.BlockSpec(
                memory_space=pltpu.VMEM if qo_vmem else pl.ANY
            ),                                      # q entries
            pl.BlockSpec(memory_space=pltpu.VMEM),  # staged new rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # staged new-row scales
            pl.BlockSpec(memory_space=pl.ANY),      # fused kv cache
            pl.BlockSpec(memory_space=pl.ANY),      # kv scale pages
            pl.BlockSpec(memory_space=pltpu.VMEM),  # alibi slope matrix
        ],
        out_specs=(
            pl.BlockSpec(
                memory_space=pltpu.VMEM if qo_vmem else pl.ANY
            ),                                      # o entries
            pl.BlockSpec(memory_space=pl.ANY),      # cache (aliased)
            pl.BlockSpec(memory_space=pl.ANY),      # scales (aliased)
        ),
        scratch_shapes=[
            pltpu.VMEM((RING_BUFFERS, G * BQ, Hk * D), q.dtype),
            pltpu.VMEM((RING_BUFFERS, CP, bs, row), kv_cache.dtype),
            pltpu.VMEM(
                (RING_BUFFERS, CP, bs, 128) if quant else (1, 1, SC_SUB, 128),
                jnp.bfloat16,
            ),
            pltpu.VMEM((G * BQ, Hk * D), q.dtype),
            pltpu.SMEM((RING_BUFFERS,), jnp.int32),
            pltpu.VMEM(
                (Hk * G * BQ, 2 * Hk * D) if head_fused else (8, 128),
                q.dtype,
            ),
            pltpu.VMEM(
                (Hk * G * BQ, D) if head_fused else (8, 128), jnp.float32
            ),
            pltpu.SemaphoreType.DMA((RING_BUFFERS,)),
            pltpu.SemaphoreType.DMA((RING_BUFFERS,)),
            pltpu.SemaphoreType.DMA((RING_BUFFERS,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((RING_BUFFERS,)),
        ],
    )

    kernel = functools.partial(
        _kernel,
        scale=scale,
        num_q_heads=Hq,
        num_kv_heads=Hk,
        head_dim=D,
        block_q=BQ,
        block_size=bs,
        pages_per_chunk=CP,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        fuse_write=fuse_write,
        single_chunk=single_chunk,
        quant=quant,
        # Mixed bf16xint8 MXU dots are TPU-only (interpret mode rejects
        # mixed-dtype dot_general).
        quant_mxu=quant and not interpret,
        fp8=fp8,
        alibi=alibi,
        wb_sub=wbs,
        qo_vmem=qo_vmem,
        entries_per_step=EPS,
        head_fused=head_fused,
    )

    out_gm, new_cache, new_scales = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((W, G * BQ, Hk * D), q.dtype),
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
            jax.ShapeDtypeStruct(sc_in.shape, sc_in.dtype),
        ),
        # Alias cache + scales through (operand index counts the 5
        # scalar-prefetch args) so fused write-backs land in the caller's
        # buffers.
        input_output_aliases={8: 1, 9: 2},
        # Must be "arbitrary": the cross-entry prefetch chain (entry e starts
        # entry e+1's DMAs) assumes sequential grid execution. A "parallel"
        # split across megacore TensorCores (v4/v5p) would leave the second
        # core waiting on DMAs its partition never started.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(
        entry_seq,
        entry_qb,
        meta.block_tables,
        meta.seq_lens,
        qsl,
        q_entries,
        kvn,
        scn,
        kv_cache,
        sc_in,
        slope_mat,
    )
    out_entries = _gmajor_to_entries(out_gm, W, BQ, Hk, G, D)

    # Reassemble token-major output from the disjoint entry windows.
    t = jnp.arange(T, dtype=jnp.int32)
    s_t = jnp.clip(
        jnp.searchsorted(qsl, t, side="right").astype(jnp.int32) - 1, 0, S - 1
    )
    qoff = t - qsl[s_t]
    ent = jnp.clip(offs[s_t] + qoff // BQ, 0, W - 1)
    out = out_entries[ent, qoff % BQ].reshape(T, Hq, D)
    if fp8:
        new_cache = jax.lax.bitcast_convert_type(
            new_cache, jnp.float8_e4m3fn
        )
    return out, new_cache, new_scales


def ragged_paged_attention_pallas(
    q: jnp.ndarray,         # [T, Hq, D]
    kv_cache: jnp.ndarray,  # [num_pages, block_size, 2*Hk*D] (page-major)
    meta: AttentionMetadata,
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    block_q: Optional[int] = None,
    pages_per_chunk: Optional[int] = None,
    interpret: bool = False,
    kv_scales: Optional[jnp.ndarray] = None,  # [pages, bs, 128] bf16 pages
    alibi_slopes: Optional[jnp.ndarray] = None,  # [Hq] f32
) -> jnp.ndarray:
    """Unified prefill+decode paged attention on TPU (cache already contains
    this step's K/V). With ``kv_scales`` the cache is int8 and rows are
    dequantized on the VPU before the MXU matmuls (scale pages ride the same
    per-page chunk DMAs). Returns [T, Hq, D]."""
    out, _, _ = _paged_attention_call(
        q,
        kv_cache,
        meta,
        None,
        scale=scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        block_q=block_q,
        pages_per_chunk=pages_per_chunk,
        interpret=interpret,
        kv_scales=kv_scales,
        alibi_slopes=alibi_slopes,
    )
    return out


def ragged_paged_attention_fused(
    q: jnp.ndarray,         # [T, Hq, D]
    kv_cache: jnp.ndarray,  # [num_pages, block_size, 2*Hk*D] — WITHOUT this
                            # step's K/V (the kernel writes them)
    k_new: jnp.ndarray,     # [T, Hk, D]
    v_new: jnp.ndarray,
    meta: AttentionMetadata,
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    interpret: bool = False,
    alibi_slopes: Optional[jnp.ndarray] = None,
):
    """Decode-only attention with the KV-cache write fused in (replaces
    reshape_and_cache + attention, ref flash_attention.rs:360-361 order).
    Requires every active sequence to have exactly one query token and
    ``block_size % 16 == 0``. Returns (out [T, Hq, D], updated kv_cache)."""
    from .kv_cache import kv_rows

    wb = WB_SUB_I8 if jnp.dtype(kv_cache.dtype).itemsize == 1 else WB_SUB
    assert meta.block_size % wb == 0
    kvn = kv_rows(k_new, v_new, kv_cache.dtype)
    out, new_cache, _ = _paged_attention_call(
        q,
        kv_cache,
        meta,
        kvn,
        scale=scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        block_q=None,
        pages_per_chunk=None,
        interpret=interpret,
        alibi_slopes=alibi_slopes,
    )
    return out, new_cache


def ragged_paged_attention_fused_quant(
    q: jnp.ndarray,          # [T, Hq, D]
    kv_cache: jnp.ndarray,   # [pages, bs, 2*Hk*D] int8 — WITHOUT this step
    kv_scales: jnp.ndarray,  # [pages, bs, 128] bf16 scale pages
    k_new: jnp.ndarray,      # [T, Hk, D] float
    v_new: jnp.ndarray,
    meta: AttentionMetadata,
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    scales_new: Optional[jnp.ndarray] = None,  # [T, 2] (TP: precomputed)
    interpret: bool = False,
    alibi_slopes: Optional[jnp.ndarray] = None,
):
    """INT8-KV decode with quantize + cache write + attention in ONE kernel:
    the new row is quantized outside (cheap elementwise), patched into the
    loaded chunk with its scale row, both page windows written back by DMA,
    and every chunk dequantized on the VPU before the MXU matmuls.
    Requires pure decode and ``block_size % 32 == 0`` (int8 sublane tile).
    Returns (out [T, Hq, D], kv_cache, kv_scales)."""
    from .kv_cache import SCALE_LANES, kv_quant_scales, quantize_kv_rows

    assert kv_cache.dtype == jnp.int8
    assert meta.block_size % WB_SUB_I8 == 0
    sc_t = kv_quant_scales(k_new, v_new) if scales_new is None else scales_new
    kvn = quantize_kv_rows(k_new, v_new, sc_t)
    scn = jnp.pad(
        sc_t.astype(jnp.bfloat16), ((0, 0), (0, SCALE_LANES - 2))
    )
    return _paged_attention_call(
        q,
        kv_cache,
        meta,
        kvn,
        scale=scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        block_q=None,
        pages_per_chunk=None,
        interpret=interpret,
        kv_scales=kv_scales,
        scn=scn,
        alibi_slopes=alibi_slopes,
    )
