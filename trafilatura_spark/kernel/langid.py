"""Language identification heuristic (stand-in for the reference's
optional py3langid dependency, utils.py:440-464, absent here).

Marker-function-word scoring over a compact per-language vocabulary —
deterministic, n-gram-free, adequate for routing/filtering.  The Spark
column twin lives in operators/textstats.py (lang_id).
"""

from __future__ import annotations

import re
from typing import Optional

LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|in|that|it|for|with)\b",
    "de": r"\b(der|die|und|das|nicht|ist|ein|mit|den|von)\b",
    "fr": r"\b(le|la|les|et|des|est|dans|pour|que|une)\b",
    "es": r"\b(el|los|las|es|en|un|una|por|para|con)\b",
}
_COMPILED = {lang: re.compile(pat) for lang, pat in LANG_MARKERS.items()}


def classify_language(text: str) -> Optional[str]:
    "Best-scoring language, or None when no marker hits at all."
    best_lang, best_score = None, 0
    for lang, pattern in _COMPILED.items():
        score = len(pattern.findall(text.lower()))
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def language_filter(temp_text: str, temp_comments: str, target_language: str) -> bool:
    """True when the document should be DISCARDED (detected language known
    and different from the target) — utils.py:450-464 semantics."""
    detected = classify_language(temp_text if len(temp_text) > len(temp_comments) else temp_comments)
    return detected is not None and detected != target_language
