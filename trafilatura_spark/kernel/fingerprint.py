"""Content fingerprinting: Charikar Simhash over sampled tokens.

Semantics mirror /root/reference/trafilatura/deduplication.py:33-149
(token sampling, blake2b-based bit votes, 64-bit signature) — a
deterministic scalar, used as the per-document fingerprint column and
for near-duplicate similarity joins.
"""

from __future__ import annotations

import string
import unicodedata
from functools import lru_cache
from hashlib import blake2b
from typing import Optional

_PUNCT_TBL = str.maketrans(
    {i: " " for i in range(0x10FFFF) if unicodedata.category(chr(i))[0] == "P"}
)


def _get_sample_by_length(tokens: list, target_length: int) -> list:
    sample: list = []
    for i in range(4, -1, -1):
        sample = [t for t in tokens if len(t) > i]
        if len(sample) >= target_length / 2:
            return sample
    return sample


def _sample_tokens_fallback(inputstring: str, length: int = 64) -> list:
    clean_text = inputstring.translate(_PUNCT_TBL)
    tokens = [t for t in clean_text.split() if t.isalnum()]
    return _get_sample_by_length(tokens, length)


def sample_tokens(inputstring: str, length: int = 64) -> list:
    "Token sample sized to the signature length (deduplication.py:56-69)."
    tokens = []
    for token in inputstring.split():
        token = token.strip(string.punctuation)
        if token.isalnum():
            tokens.append(token)
    sample = _get_sample_by_length(tokens, length)
    if not sample:
        return _sample_tokens_fallback(inputstring, length)
    return sample


@lru_cache(maxsize=2**14)
def _vector_to_add(token: str, length: int) -> tuple:
    token_hash = int.from_bytes(blake2b(token.encode(), digest_size=8).digest(), "big")
    return tuple(1 if token_hash & (1 << i) else -1 for i in range(length))


class Simhash:
    "Charikar simhash (deduplication.py:88-149)."

    __slots__ = ["hash", "length"]

    def __init__(self, inputstring: str = "", length: int = 64, existing_hash: Optional[int] = None):
        self.length = length
        self.hash = existing_hash if existing_hash is not None else self.create_hash(inputstring)

    def create_hash(self, inputstring: str) -> int:
        vector = [0] * self.length
        for token in sample_tokens(inputstring, self.length):
            contribution = _vector_to_add(token, self.length)
            vector = [a + b for a, b in zip(vector, contribution)]
        return sum(1 << i for i in range(self.length) if vector[i] >= 0)

    def to_hex(self) -> str:
        return hex(self.hash)[2:]

    def hamming_distance(self, other: "Simhash") -> int:
        return bin(self.hash ^ other.hash).count("1")

    def similarity(self, other: "Simhash") -> float:
        return (self.length - self.hamming_distance(other)) / self.length


def content_fingerprint(content: str) -> str:
    "Simhash hex of meaningful content bits (deduplication.py:147-149)."
    return Simhash(content).to_hex()


_STRIP_EXTENSION = None


def is_similar_domain(reference: str, new_string: str, threshold: float = 0.5) -> bool:
    "SequenceMatcher ratio on extension-stripped domains (deduplication.py:25-30)."
    import re
    from difflib import SequenceMatcher

    global _STRIP_EXTENSION
    if _STRIP_EXTENSION is None:
        _STRIP_EXTENSION = re.compile(r"\.[^/?#]{2,63}$")
    reference = _STRIP_EXTENSION.sub("", reference)
    new_string = _STRIP_EXTENSION.sub("", new_string)
    return SequenceMatcher(None, reference, new_string).ratio() >= threshold
