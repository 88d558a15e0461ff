"""Deterministic in-repo training corpus for the peaked-logit quality tier.

Zero-egress environments cannot download pretrained checkpoints (VERDICT r4
missing #1), so the quality ladder's "real model" is trained in-repo on this
corpus (tools/train_tiny_model.py). Design goals:

  * every prompt prefix has a DOMINANT continuation, so a well-trained
    model's greedy decode is self-consistent and its logits are peaked —
    the regime the random-weight gates cannot reach;
  * the three `tools/real_model_check.py` coherence prompts appear verbatim
    with fixed continuations;
  * enough lexical variety (entities × templates) that the model learns
    structure rather than one string, and a trained BPE tokenizer gets a
    meaningful merge table (multi-byte tokens exercise the incremental
    detokenizer, including a few unicode sentences).

Everything is seeded — two runs produce byte-identical text.
"""

from __future__ import annotations

import random
from typing import List

# Fixed factual sentences: each prefix → one continuation, repeated often.
FACTS = [
    "The capital of France is Paris.",
    "The capital of Japan is Tokyo.",
    "The capital of Italy is Rome.",
    "The capital of Spain is Madrid.",
    "The capital of Egypt is Cairo.",
    "The capital of Canada is Ottawa.",
    "The quick brown fox jumps over the lazy dog.",
    "Water boils at one hundred degrees.",
    "The sun rises in the east and sets in the west.",
    "Two plus two equals four.",
    "Three plus three equals six.",
    "Four plus four equals eight.",
    "A triangle has three sides and a square has four sides.",
    "The moon orbits the earth and the earth orbits the sun.",
    "Café au lait is coffee with milk.",
    "Zürich is a city in Switzerland.",
]

# A single fixed fairy tale; its opening matches real_model_check's
# "Once upon a time, there was a" prompt.
STORY = (
    "Once upon a time, there was a quiet fox that lived near the river. "
    "The fox walked to the village every morning to look for bread. "
    "One day the fox met a small bird sitting on a stone. "
    "The bird said that the river had carried the bread away. "
    "So the fox and the bird walked along the river together. "
    "They found the bread under the old bridge and shared it. "
    "From that day on, the fox and the bird were friends. "
    "The end."
)

SUBJECTS = [
    "the fox", "the bird", "the farmer", "the sailor", "the teacher",
    "the child", "the baker", "the miller", "the fisherman", "the painter",
]
PLACES = [
    "the river", "the village", "the market", "the forest", "the harbor",
    "the mountain", "the garden", "the bridge", "the mill", "the shore",
]
OBJECTS = [
    "bread", "water", "apples", "fish", "flour",
    "wood", "stones", "flowers", "paper", "rope",
]

# Verb templates keep subject→verb→object statistics simple and learnable.
TEMPLATES = [
    "Every morning {s} walked to {p} to look for {o}.",
    "In the evening {s} carried {o} back from {p}.",
    "{S} found {o} near {p} and smiled.",
    "When it rained, {s} stayed close to {p} and counted {o}.",
    "{S} gave {o} to a friend at {p}.",
]


def build_corpus(repeats: int = 40, seed: int = 0) -> str:
    """~400KB of deterministic text; `repeats` scales the size."""
    rng = random.Random(seed)
    lines: List[str] = []
    for _ in range(repeats):
        lines.extend(FACTS)
        lines.append(STORY)
        for _ in range(60):
            t = rng.choice(TEMPLATES)
            s = rng.choice(SUBJECTS)
            sent = t.format(
                s=s, S=s[0].upper() + s[1:],
                p=rng.choice(PLACES), o=rng.choice(OBJECTS),
            )
            lines.append(sent)
        rng.shuffle(lines)
    return "\n".join(lines) + "\n"


# Held-out-style eval prompts (prefixes the corpus makes near-deterministic).
EVAL_PROMPTS = [
    "The capital of France is",
    "Once upon a time, there was a",
    "The quick brown fox jumps over",
    "Every morning the fox walked to",
    "The sun rises in the east and",
]
