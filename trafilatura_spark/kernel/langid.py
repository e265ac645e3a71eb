"""Language identification heuristic (stand-in for the reference's
optional py3langid dependency, utils.py:440-464, absent here).

Function-word scoring over per-language vocabularies (17 languages) —
deterministic, n-gram-free, adequate for routing/filtering a
multilingual crawl.  The Spark column twin lives in
operators/textstats.py (lang_id) and shares LANG_WORDS.
"""

from __future__ import annotations

import re
from typing import Optional

# distinctive high-frequency function words per language; lowercase,
# no regex metacharacters.  Deliberately compact: scoring is hit-count
# argmax, so each list only needs enough coverage to dominate on text
# genuinely written in its language.
LANG_WORDS = {
    "en": "the and is that it for with was this have are not you but they from she his her which their",
    "de": "der die und das nicht ist ein mit den von sich auch werden einer dass für wird bei nur noch",
    "fr": "le les des est dans pour que une qui avec sur pas sont cette aux été leur comme nous mais",
    "es": "el los las es un una por para con del como pero más está muy hay sin sobre también cuando",
    "it": "il che di non per sono della questo anche più gli nel alla hanno sulla essere degli quella",
    "pt": "os das dos não uma foi são ela você tem ser isso seu sua pelo pela até depois quem",
    "nl": "het een van dat niet zijn voor maar ook deze wordt naar heeft werd onder tegen hun bij zich",
    "pl": "się nie jest tak ale jego przez tylko może być bardzo już czy które został oraz aby tego",
    "cs": "že když jako jen podle nebo však ještě jsou jsme této které další mezi byla bylo už při",
    "sv": "och att det som är av inte till den ett han har var vid från kan skulle när också",
    "da": "og at er en til ikke der af men et hun blev være hvad hvor efter kunne skal denne",
    "fi": "ja on ei että oli hän mutta kun niin kuin myös sitä tai vain joka ovat olen sen ole",
    "hu": "az és hogy nem egy volt csak már vagy mint még aki mert nagyon lehet ezt olyan amikor meg",
    "ro": "și în cu pe că este nu din mai sau dacă care pentru sunt fost când după acest fără",
    "tr": "bir ve bu için çok ile daha gibi ama değil sonra kadar her onun ancak veya olarak olan şey",
    "id": "yang dan di itu dengan untuk tidak ini dari dalam akan pada juga mereka bisa oleh sudah telah",
    "ru": "и в не на что он как это по но они мы же за от так его было она мне",
}
LANG_WORD_SETS = {lang: frozenset(words.split()) for lang, words in LANG_WORDS.items()}

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
MIN_MARKER_HITS = 2  # below this the text is treated as language-unknown


def classify_language(text: str) -> Optional[str]:
    """Best-scoring language by function-word occurrence count, or None
    when fewer than MIN_MARKER_HITS markers fire (unknown language never
    triggers the discard filter, matching the reference's behavior when
    py3langid is not installed)."""
    tokens = _TOKEN_RE.findall(text.lower())
    if not tokens:
        return None
    best_lang, best_score = None, MIN_MARKER_HITS - 1
    for lang, words in LANG_WORD_SETS.items():
        score = sum(1 for t in tokens if t in words)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


_HTML_LANG_RE = re.compile(r"([a-z]{2})")
# meta attributes checked, in order (reference utils.py:93)
_TARGET_LANG_ATTRS = (("http-equiv", "content-language"), ("property", "og:locale"))


def check_html_lang(tree, target_language: str, strict: bool = False) -> bool:
    """Quick declared-language check over meta elements (reference
    utils.py:416-436): content-language / og:locale metas decide when
    present; the <html lang> attribute only counts in strict mode
    (it is often wrong); absent markup passes."""
    for attr, value in _TARGET_LANG_ATTRS:
        elems = [
            m
            for m in tree.iterdescendants("meta")
            if (m.get(attr) or "").lower() == value and m.get("content")
        ]
        if elems:
            return any(
                target_language in _HTML_LANG_RE.split((m.get("content") or "").lower())
                for m in elems
            )
    if strict:
        root = tree if tree.tag == "html" else next(tree.iterdescendants("html"), None)
        if root is not None and root.get("lang"):
            return target_language in _HTML_LANG_RE.split((root.get("lang") or "").lower())
    return True


def language_filter(temp_text: str, temp_comments: str, target_language: str) -> bool:
    """True when the document should be DISCARDED (detected language known
    and different from the target) — utils.py:450-464 semantics."""
    detected = classify_language(temp_text if len(temp_text) > len(temp_comments) else temp_comments)
    return detected is not None and detected != target_language
