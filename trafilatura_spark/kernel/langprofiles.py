"""Character-n-gram language profiles (py3langid-grade stand-in).

The reference optionally delegates language ID to py3langid
(utils.py:440-464).  That model's data files are unavailable here, so
this module implements the classic Cavnar-Trenkle (1994, public)
rank-order n-gram method: per-language profiles of the most frequent
character 1-3-grams, classification by out-of-place rank distance.

Profiles are TRAINED AT IMPORT from the in-repo stoplist corpora
(kernel/stoplists.py, ~50 languages): function words dominate real
running text, so their n-gram distributions approximate full-corpus
profiles closely enough for routing/filtering — and the construction is
fully deterministic with zero external data files.

Scale note: the classifier is a per-document scalar used inside the
extraction batch UDF (language gate) — pure dict lookups, no I/O; the
JVM-side column variant for whole-table sweeps stays in
operators/textstats.py.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

from .stoplists import LANG_STOPLISTS, NOSPACE_STOPLISTS

PROFILE_SIZE = 300
MAX_TEXT_CHARS = 2000  # classification reads at most this much text

# tokenizer: whitespace split + punctuation/digit strip.  NOT `\w+`:
# Python's \w excludes combining marks (category Mn), so a \w+ scan
# shreds Indic-script words at every vowel sign (e.g. Devanagari matras)
_STRIP_CHARS = "0123456789!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~«»‹›„“”‘’…—–·•،؛؟।॥"


def tokenize(text: str) -> list:
    "Lowercased word tokens preserving combining marks (all scripts)."
    return [t for t in (w.strip(_STRIP_CHARS) for w in text.lower().split()) if t]


def _ngrams_of_word(word: str, counts: Dict[str, int], weight: int = 1) -> None:
    "Count padded character 1-3-grams of one word into ``counts``."
    padded = f" {word} "
    for n in (1, 2, 3):
        for i in range(len(padded) - n + 1):
            g = padded[i : i + n]
            if g != " ":
                counts[g] = counts.get(g, 0) + weight


def _profile_from_counts(counts: Dict[str, int]) -> Dict[str, int]:
    "Rank map of the PROFILE_SIZE most frequent n-grams (rank 0 = top)."
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PROFILE_SIZE]
    return {g: rank for rank, (g, _) in enumerate(ordered)}


def _build_profiles() -> Dict[str, Dict[str, int]]:
    profiles = {}
    for lang, words in {**LANG_STOPLISTS, **NOSPACE_STOPLISTS}.items():
        counts: Dict[str, int] = {}
        for w in words:
            _ngrams_of_word(w.lower(), counts)
        profiles[lang] = _profile_from_counts(counts)
    return profiles


LANG_PROFILES = _build_profiles()
LANGS = sorted(LANG_PROFILES)


def _text_profile(text: str) -> Dict[str, int]:
    counts: Dict[str, int] = {}
    for word in tokenize(text[:MAX_TEXT_CHARS]):
        _ngrams_of_word(word, counts)
    return _profile_from_counts(counts)


def rank_distance(text_profile: Dict[str, int], lang_profile: Dict[str, int]) -> float:
    """Cavnar-Trenkle out-of-place distance, normalized to [0, 1]:
    0 = identical rank order, 1 = no overlap at all."""
    if not text_profile:
        return 1.0
    miss = PROFILE_SIZE
    total = sum(
        min(abs(rank - lang_profile[g]), miss) if g in lang_profile else miss
        for g, rank in text_profile.items()
    )
    return total / (len(text_profile) * miss)


def rank_candidates(text: str) -> list:
    "All languages sorted by rank distance: [(distance, lang), ...]."
    tp = _text_profile(text)
    if not tp:
        return []
    return sorted((rank_distance(tp, LANG_PROFILES[lang]), lang) for lang in LANGS)


def classify_ngram(text: str) -> Tuple[Optional[str], Optional[str], float, float]:
    """(best_language, runner_up, best_distance, margin_to_second).
    best_language is None only for empty/letterless input — like
    py3langid, the model otherwise always produces an argmax label;
    callers decide whether to trust low-confidence labels (see
    langid.classify_language, which tie-breaks narrow margins by exact
    function-word hits)."""
    ranked = rank_candidates(text)
    if not ranked:
        return None, None, 1.0, 0.0
    best, best_lang = ranked[0]
    second, second_lang = ranked[1] if len(ranked) > 1 else (2.0, None)
    return best_lang, second_lang, best, second - best
