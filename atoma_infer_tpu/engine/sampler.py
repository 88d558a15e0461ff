"""On-device batched sampling.

Replaces the reference's per-request host-side ``LogitsProcessor`` + argmax
(ref: backends/vllm/src/model_executor.rs:144-282 — repetition penalty over
the last ``repeat_last_n`` tokens, then ArgMax/All/TopP/TopK/TopKThenTopP
strategies decided at admission, llm_service.rs:346-372).

TPU-native design: sampling runs inside the jitted step function on the whole
batch at once — per-sequence parameters arrive as device arrays, the sampled
token ids leave the chip in one small transfer (SURVEY.md §7 hard part #3:
avoid a host round-trip per sequence). Seeded per-sequence PRNG streams make
sampling deterministic and replay-stable: key = fold_in(seed, step).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..sampling_params import NextTokenChooserParameters

# Repetition/frequency penalties look back over this many tokens
# (ref: model_executor.rs repeat_last_n handling).
PENALTY_WINDOW = 64


@dataclasses.dataclass
class SamplingTensors:
    """Per-sequence sampling parameters as host arrays (bucketed to S)."""

    temperature: np.ndarray     # [S] f32
    top_k: np.ndarray           # [S] i32 (0 = disabled)
    top_p: np.ndarray           # [S] f32 (1.0 = disabled)
    typical_p: np.ndarray       # [S] f32 (1.0 = disabled)
    do_sample: np.ndarray       # [S] bool
    seeds: np.ndarray           # [S] u32
    repetition_penalty: np.ndarray  # [S] f32 (1.0 = disabled)
    frequency_penalty: np.ndarray   # [S] f32 (0.0 = disabled)
    recent_tokens: np.ndarray   # [S, PENALTY_WINDOW] i32 (-1 pad)
    needs_sampling: bool        # any do_sample → compile the stochastic path
    needs_penalties: bool
    needs_typical: bool
    top_n: int                  # static: max top_n_tokens requested (0 = off)

    @classmethod
    def build(
        cls,
        params_list: List[NextTokenChooserParameters],
        recent_token_lists: List[List[int]],
        num_slots: int,
        top_n_list: Optional[List[int]] = None,
    ) -> "SamplingTensors":
        S = num_slots
        t = np.ones(S, dtype=np.float32)
        tk = np.zeros(S, dtype=np.int32)
        tp = np.ones(S, dtype=np.float32)
        typ = np.ones(S, dtype=np.float32)
        ds = np.zeros(S, dtype=bool)
        sd = np.zeros(S, dtype=np.uint32)
        rp = np.ones(S, dtype=np.float32)
        fp = np.zeros(S, dtype=np.float32)
        recent = np.full((S, PENALTY_WINDOW), -1, dtype=np.int32)
        for i, p in enumerate(params_list):
            t[i] = max(p.temperature, 1e-5)
            tk[i] = max(p.top_k, 0)
            tp[i] = p.top_p
            typ[i] = getattr(p, "typical_p", 1.0)
            ds[i] = p.do_sample and p.temperature > 1e-5
            sd[i] = np.uint32(p.seed & 0xFFFFFFFF)
            rp[i] = p.repetition_penalty
            fp[i] = p.frequency_penalty
            toks = recent_token_lists[i][-PENALTY_WINDOW:]
            if toks:
                recent[i, : len(toks)] = toks
        needs_penalties = any(
            p.repetition_penalty != 1.0 or p.frequency_penalty != 0.0
            for p in params_list
        )
        return cls(
            temperature=t,
            top_k=tk,
            top_p=tp,
            typical_p=typ,
            do_sample=ds,
            seeds=sd,
            repetition_penalty=rp,
            frequency_penalty=fp,
            recent_tokens=recent,
            needs_sampling=bool(ds.any()),
            needs_penalties=needs_penalties,
            needs_typical=bool((typ < 1.0).any()),
            top_n=max(top_n_list) if top_n_list else 0,
        )


def apply_penalties(
    logits: jnp.ndarray,           # [S, V] f32
    recent_tokens: jnp.ndarray,    # [S, W] i32, -1 pad
    repetition_penalty: jnp.ndarray,  # [S]
    frequency_penalty: jnp.ndarray,   # [S]
) -> jnp.ndarray:
    """Repetition (divide/multiply) + frequency (count-scaled subtract)
    penalties over the recent-token window (ref: model_executor.rs:173-278)."""
    S, V = logits.shape
    W = recent_tokens.shape[1]
    oob = jnp.where(recent_tokens < 0, V, recent_tokens)  # pad → dropped
    counts = jnp.zeros((S, V), logits.dtype).at[
        jnp.arange(S, dtype=jnp.int32)[:, None], oob
    ].add(1.0, mode="drop")
    seen = counts > 0

    rp = repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(seen, penalized, logits)
    logits = logits - frequency_penalty[:, None] * counts
    return logits


def _top_k_mask(logits: jnp.ndarray, top_k: jnp.ndarray, max_k: int) -> jnp.ndarray:
    """Mask all but each row's top-k entries (k=0 disables)."""
    kth_vals, _ = jax.lax.top_k(logits, max_k)  # [S, max_k] descending
    k = jnp.clip(top_k, 1, max_k)
    thresh = jnp.take_along_axis(kth_vals, (k - 1)[:, None], axis=1)  # [S, 1]
    keep = (logits >= thresh) | (top_k[:, None] <= 0)
    return jnp.where(keep, logits, -jnp.inf)


def _top_p_mask(logits: jnp.ndarray, top_p: jnp.ndarray) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest set of tokens whose probability
    mass reaches top_p (exact, via a full descending sort)."""
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Keep entries whose *exclusive* cumulative mass is < top_p (always keeps
    # the argmax).
    keep_sorted = (cum - probs) < top_p[:, None]
    # Value threshold = smallest kept logit per row.
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    keep = (logits >= thresh) | (top_p[:, None] >= 1.0)
    return jnp.where(keep, logits, -jnp.inf)


def _typical_p_mask(logits: jnp.ndarray, typical_p: jnp.ndarray) -> jnp.ndarray:
    """Locally-typical filtering (Meister et al., 2022; the reference
    validates typical_p — validation.rs:228-240 — but never applies it; here
    it is live): keep the tokens whose surprisal is closest to the
    distribution's entropy, accumulating probability mass to typical_p."""
    S = logits.shape[0]
    lp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(lp)
    ent = -jnp.sum(p * jnp.where(p > 0, lp, 0.0), axis=-1, keepdims=True)
    dev = jnp.abs(-lp - ent)
    order = jnp.argsort(dev, axis=-1)              # ascending deviation
    p_sorted = jnp.take_along_axis(p, order, axis=-1)
    cum = jnp.cumsum(p_sorted, axis=-1)
    keep_sorted = (cum - p_sorted) < typical_p[:, None]  # ≥1 token kept
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(S, dtype=jnp.int32)[:, None], order
    ].set(keep_sorted)
    keep |= typical_p[:, None] >= 1.0
    return jnp.where(keep, logits, -jnp.inf)


def sample(
    logits: jnp.ndarray,        # [S, V] f32 (last-token logits per sequence)
    *,
    temperature: jnp.ndarray,
    top_k: jnp.ndarray,
    top_p: jnp.ndarray,
    do_sample: jnp.ndarray,
    seeds: jnp.ndarray,
    repetition_penalty: jnp.ndarray,
    frequency_penalty: jnp.ndarray,
    recent_tokens: jnp.ndarray,
    step: jnp.ndarray,          # [S] i32 — per-sequence generated-token count.
                                # Folding the SEQUENCE's position (not a global
                                # engine step) into the PRNG makes sampling
                                # replay-stable across preemption/swap: the
                                # same request draws the same stream no matter
                                # how it was scheduled.
    needs_sampling: bool,       # static: compile the stochastic path?
    needs_penalties: bool,      # static: compile the penalty path?
    typical_p: Optional[jnp.ndarray] = None,
    needs_typical: bool = False,
    top_n: int = 0,             # static: also return each row's top-n tokens
    max_top_k: int = 128,
):
    """Returns (token ids [S] i32, logprobs [S] f32[, top-n (ids, logprobs)])."""
    if needs_penalties:
        logits = apply_penalties(
            logits, recent_tokens, repetition_penalty, frequency_penalty
        )

    # Logprob of the chosen token from the post-penalty distribution
    # (ref: model_executor.rs logprob extraction).
    logprobs_full = jax.nn.log_softmax(logits, axis=-1)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if not needs_sampling:
        chosen = greedy
    else:
        scaled = logits / temperature[:, None]
        scaled = _top_k_mask(scaled, top_k, max_top_k)
        scaled = _top_p_mask(scaled, top_p)
        if needs_typical and typical_p is not None:
            scaled = _typical_p_mask(scaled, typical_p)

        step_arr = jnp.broadcast_to(
            jnp.asarray(step, jnp.int32), seeds.shape
        )

        def per_seq_gumbel(seed, st):
            key = jax.random.fold_in(
                jax.random.PRNGKey(0), seed.astype(jnp.uint32)
            )
            key = jax.random.fold_in(key, st.astype(jnp.uint32))
            return jax.random.gumbel(key, (logits.shape[-1],), jnp.float32)

        gumbel = jax.vmap(per_seq_gumbel)(seeds, step_arr)
        sampled = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
        chosen = jnp.where(do_sample, sampled, greedy)

    logprob = jnp.take_along_axis(
        logprobs_full, chosen[:, None], axis=-1
    )[:, 0]
    if top_n > 0:
        # Top-n alternative tokens per row (TGI-style top_n_tokens; the
        # reference accepts the parameter but returns nothing for it).
        top_lps, top_ids = jax.lax.top_k(logprobs_full, top_n)
        return chosen, logprob, (top_ids.astype(jnp.int32), top_lps)
    return chosen, logprob, None
