"""Bound the language-ID stand-in against real pages (round-3 VERDICT
item 3).

py3langid itself cannot run here (no pip), so the strongest available
check is agreement with what real-world pages DECLARE: for each of the
reference's eval pages (/root/reference/tests/eval, read-only), read the
declared language (content-language / og:locale metas, then the
<html lang> attribute — the same vocabulary check_html_lang trusts),
extract the main text with the kernel cascade, classify it with the
60-language n-gram model (kernel/langid.py), and tabulate agreement.

Declared languages are noisy ground truth (template defaults, en-on-
everything CMS themes), so disagreements are printed per pair for manual
genre inspection rather than hard-asserted; the aggregate agreement rate
and the top confusion pairs go to COVERAGE.md.

Usage: python tools/langid_agreement.py [min_chars]
Output: one JSON line + a per-language table on stderr-free stdout.
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_DIR = "/root/reference/tests/eval"

_PRIMARY_RE = re.compile(r"^\s*([A-Za-z]{2,3})")


def declared_lang(tree) -> str | None:
    "Primary declared language: meta vocabulary first, then <html lang>."
    for attr, value in (("http-equiv", "content-language"), ("property", "og:locale")):
        for m in tree.iterdescendants("meta"):
            if (m.get(attr) or "").lower() == value and m.get("content"):
                mm = _PRIMARY_RE.match(m.get("content"))
                if mm:
                    return mm.group(1).lower()
    root = tree if tree.tag == "html" else next(tree.iterdescendants("html"), None)
    if root is not None and root.get("lang"):
        mm = _PRIMARY_RE.match(root.get("lang"))
        if mm:
            return mm.group(1).lower()
    return None


def main() -> int:
    min_chars = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    from trafilatura_spark.kernel import bare_extract
    from trafilatura_spark.kernel.langid import classify_language
    from trafilatura_spark.kernel.langprofiles import LANG_PROFILES
    from trafilatura_spark.kernel.loader import load_html

    known = set(LANG_PROFILES)
    per_lang: dict = {}
    confusions: Counter = Counter()
    disagreement_files: list = []
    n_pages = n_declared = n_usable = 0

    for filename in sorted(os.listdir(EVAL_DIR)):
        path = os.path.join(EVAL_DIR, filename)
        try:
            with open(path, "rb") as f:
                html = f.read()
        except OSError:
            continue
        n_pages += 1
        tree = load_html(html)
        if tree is None:
            continue
        declared = declared_lang(tree)
        if declared is None or declared not in known:
            continue
        n_declared += 1
        try:
            res = bare_extract(html)
        except Exception:
            continue
        if not res.text or len(res.text) < min_chars:
            continue
        n_usable += 1
        detected = classify_language(res.text, strict=True)
        bucket = per_lang.setdefault(declared, {"n": 0, "agree": 0})
        bucket["n"] += 1
        if detected == declared:
            bucket["agree"] += 1
        else:
            confusions[(declared, detected)] += 1
            disagreement_files.append((filename, declared, detected))

    total = sum(b["n"] for b in per_lang.values())
    agree = sum(b["agree"] for b in per_lang.values())
    print(f"{'declared':>9} {'pages':>6} {'agree':>6} {'rate':>6}")
    for lang in sorted(per_lang, key=lambda k: -per_lang[k]["n"]):
        b = per_lang[lang]
        print(f"{lang:>9} {b['n']:>6} {b['agree']:>6} {b['agree'] / b['n']:>6.3f}")
    print(f"{'TOTAL':>9} {total:>6} {agree:>6} {agree / max(total, 1):>6.3f}")
    if confusions:
        print("\ntop confusion pairs (declared -> detected):")
        for (d, g), n in confusions.most_common(12):
            print(f"  {d} -> {g}: {n}")
        print("\ndisagreeing files:")
        for filename, d, g in disagreement_files:
            print(f"  {filename}: declared={d} detected={g}")
    print(json.dumps({
        "pages": n_pages, "declared_known": n_declared, "usable": n_usable,
        "agreement": round(agree / max(total, 1), 4),
        "per_lang": {k: (v["agree"], v["n"]) for k, v in sorted(per_lang.items())},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
