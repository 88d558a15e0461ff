"""Shared test fixtures.

``create_dummy_prompt`` mirrors the reference's fixture building token-id
sequences + groups without a tokenizer (ref: sequence.rs:2268-2300).
"""

from __future__ import annotations

import itertools
from typing import Optional, Tuple

from atoma_infer_tpu.sampling_params import (
    NextTokenChooserParameters,
    StoppingCriteriaParameters,
)
from atoma_infer_tpu.sequence import Sequence, SequenceGroup

_seq_counter = itertools.count()


def create_dummy_prompt(
    request_id: str,
    prompt_length: int,
    block_size: int = 16,
    best_of: int = 1,
    max_new_tokens: int = 16,
    eos_token_id: Optional[int] = None,
) -> Tuple[Sequence, SequenceGroup]:
    prompt_tokens = list(range(prompt_length))
    prompt_str = " ".join(str(t) for t in prompt_tokens)
    seq = Sequence(
        seq_id=next(_seq_counter),
        prompt=prompt_str,
        prompt_token_ids=prompt_tokens,
        block_size=block_size,
        eos_token_id=eos_token_id,
    )
    group = SequenceGroup(
        request_id=request_id,
        sequences=[seq],
        next_token_chooser_params=NextTokenChooserParameters(),
        stopping_criteria=StoppingCriteriaParameters(max_new_tokens=max_new_tokens),
        best_of=best_of,
    )
    return seq, group


def fork_group(
    group: SequenceGroup, parent: Sequence, n_children: int
) -> list[Sequence]:
    children = []
    for _ in range(n_children):
        child = parent.fork(next(_seq_counter))
        group.add_sequence(child)
        children.append(child)
    return children
