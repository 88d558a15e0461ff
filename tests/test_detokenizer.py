"""Incremental detokenizer + policy unit tests."""

from collections import deque

from atoma_infer_tpu.engine.detokenizer import decode_incrementally
from atoma_infer_tpu.core.policy import FcfsPolicy
from atoma_infer_tpu.sequence import Sequence, SequenceGroup


class FakeTokenizer:
    """Multi-byte-aware fake: token 0 is an incomplete UTF-8 fragment."""

    def decode(self, ids, skip_special_tokens=True):
        out = b""
        for i in ids:
            out += b"\xe2\x82" if i == 0 else f"<{i}>".encode()
        return out.decode("utf-8", errors="replace")


class TestIncrementalDecode:
    def test_emits_complete_text(self):
        tok = FakeTokenizer()
        ids = [1, 2, 3]
        text, p, r = decode_incrementally(tok, ids, 0, 0)
        assert text == "<1><2><3>"
        assert (p, r) == (0, 3)
        ids += [4]
        text, p, r = decode_incrementally(tok, ids, p, r)
        assert text == "<4>"

    def test_withholds_incomplete_utf8(self):
        tok = FakeTokenizer()
        ids = [1, 0]  # trailing incomplete fragment → replacement char
        text, p, r = decode_incrementally(tok, ids, 0, 0)
        # Incremental decode must not emit the replacement-char tail.
        assert not text.endswith("�")


class TestFcfsPolicy:
    def test_sorts_by_arrival(self):
        def group(rid, t):
            g = SequenceGroup(rid, [Sequence(hash(rid) % 1000, "x", [1], 16)],
                              arrival_time=t)
            return g

        q = deque([group("b", 2.0), group("a", 1.0), group("c", 3.0)])
        out = FcfsPolicy().sort_by_priority(10.0, q)
        assert [g.request_id for g in out] == ["a", "b", "c"]
