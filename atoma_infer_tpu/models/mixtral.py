"""Mixtral (sparse mixture-of-experts) model family.

MoE is an UNCHECKED roadmap item in the reference (README.md Roadmap #6;
SURVEY.md §2.6 EP row: NO) — this family goes beyond reference parity.
Architecturally Mistral attention + a top-k sparse-MoE feed-forward
(HF ``MixtralSparseMoeBlock``): a router picks ``k`` of ``E`` experts per
token, each expert is a SwiGLU MLP, and the outputs mix by the renormalized
router softmax weights.

TPU-native design — dense-expert einsum instead of token dispatch:
the expert computation runs as batched einsums over the stacked expert
weights ``[E, H, I]`` and the mix applies the (mostly-zero) [T, E] weight
matrix. Rationale: decode is WEIGHT-BANDWIDTH-bound, and this formulation
reads each expert's weights exactly once per step — identical HBM traffic
to a perfectly load-balanced dispatch — while wasting only MXU FLOPs,
which are not the bottleneck at decode batch sizes (T ≤ a few hundred
rows). It is also branch-free, static-shaped (XLA-friendly: no capacity
overflow, no sort/scatter — TPU scatter runs ~100× off roofline), and
shards trivially for expert parallelism: partition the ``E`` axis over the
mesh and ``psum`` the mixed output. Capacity-bucketed dispatch for long
prefill (where FLOPs dominate) is the follow-up.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .llama import Llama, LlamaConfig


@dataclasses.dataclass(frozen=True)
class MixtralConfig(LlamaConfig):
    """Mistral-shaped config + MoE fields (HF ``MixtralConfig``)."""

    num_local_experts: int = 8
    num_experts_per_tok: int = 2

    @classmethod
    def from_hf_dict(cls, d: Dict[str, Any]) -> "MixtralConfig":
        base = LlamaConfig.from_hf_dict(d)
        base_kw = {
            f.name: getattr(base, f.name)
            for f in dataclasses.fields(LlamaConfig)
        }
        base_kw["sliding_window"] = d.get("sliding_window")
        base_kw["rope_scaling"] = None
        return cls(
            **base_kw,
            num_local_experts=int(d.get("num_local_experts", 8)),
            num_experts_per_tok=int(d.get("num_experts_per_tok", 2)),
        )


class Mixtral(Llama):
    """Shared paged-KV attention; sparse-MoE feed-forward."""

    config_cls = MixtralConfig

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        """Replace the dense MLP weights with a router + stacked experts."""
        params = super().init_params(rng)
        cfg = self.config
        L, h, inter = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
        E = cfg.num_local_experts
        keys = jax.random.split(rng, 4)

        def init(key, shape, fan_in):
            return (
                jax.random.normal(key, shape, dtype=jnp.float32) * fan_in**-0.5
            ).astype(self.dtype)

        layers = params["layers"]
        for k in ("gate_proj", "up_proj", "down_proj"):
            del layers[k]
        layers["router"] = init(keys[0], (L, h, E), h)
        layers["w1"] = init(keys[1], (L, E, h, inter), h)
        layers["w3"] = init(keys[2], (L, E, h, inter), h)
        layers["w2"] = init(keys[3], (L, E, inter, h), inter)
        return params

    def _mlp_block(self, normed: jnp.ndarray, lp: Dict[str, Any]) -> jnp.ndarray:
        cfg = self.config
        k = cfg.num_experts_per_tok
        E = cfg.num_local_experts

        # Router: softmax in f32, take top-k, renormalize over the chosen k
        # (HF MixtralSparseMoeBlock semantics).
        router_logits = jnp.dot(normed, lp["router"]).astype(jnp.float32)
        probs = jax.nn.softmax(router_logits, axis=-1)          # [T, E]
        topv, topi = jax.lax.top_k(probs, k)                    # [T, k]
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        # Dense [T, E] mix weights via one-hot sum — no scatter (see module
        # docstring for why dispatch-free is the right decode shape on TPU).
        mix = jnp.sum(
            topv[..., None] * jax.nn.one_hot(topi, E, dtype=jnp.float32),
            axis=1,
        )                                                        # [T, E]

        x = normed
        g = jnp.einsum("th,ehi->tei", x, lp["w1"])
        u = jnp.einsum("th,ehi->tei", x, lp["w3"])
        y = jnp.einsum("tei,eih->teh", jax.nn.silu(g) * u, lp["w2"])
        out = jnp.einsum("te,teh->th", mix.astype(y.dtype), y)
        return out.astype(normed.dtype)
