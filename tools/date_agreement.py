"""Bound the date-finding stand-in against real pages (round-4 VERDICT
item 4) the way tools/langid_agreement.py bounded language ID.

htmldate itself cannot run here (no pip), so the strongest available
ground truth is what real pages carry in machine-readable form:
`article:published_time`-family metas in the HTML and full Y/M/D dates
in the page's own URL (from the reference's evaldata.json mapping).
Both are HELD OUT from the ladder's input — the published-time metas are
stripped from the tree and find_date runs with url=None — so the score
measures the REST of the ladder (JSON-LD, <time> elements, date-classed
text, free-text scan) against an independent signal, not a rung reading
back its own input.

Ground truth is noisy in known ways (timezone-shifted meta stamps make
off-by-one-day disagreements ambiguous; URL dates can be section dates),
so exact / same-month / same-year tiers are reported separately and
disagreements are printed for adjudication rather than hard-asserted.
Aggregate numbers go to COVERAGE.md.

Usage: python tools/date_agreement.py
Output: one JSON summary line; per-page disagreements on stdout above it.
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_DIR = "/root/reference/tests/eval"
EVALDATA = "/root/reference/tests/evaldata.json"

# machine-readable published-time metas used as ground truth AND stripped
# from the ladder input (the held-out set: the judge-specified
# article:published_time family, exact ISO stamps only)
_TRUTH_META_NAMES = {
    "article:published_time",
    "og:article:published_time",
    "article.published",
    "datepublished",
    "parsely-pub-date",
}
_ISO_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})")
_URL_DATE_RE = re.compile(r"/(20\d\d|19\d\d)/(\d{1,2})/(\d{1,2})(?:/|$)")
_URL_ISO_RE = re.compile(r"/(20\d\d|19\d\d)-(\d{2})-(\d{2})(?:[-/]|$)")


def _iso(y: str, m: str, d: str):
    y, m, d = int(y), int(m), int(d)
    if not (1 <= m <= 12 and 1 <= d <= 31):
        return None
    return f"{y:04d}-{m:02d}-{d:02d}"


def truth_from_meta(tree):
    for el in tree.iterdescendants("meta"):
        name = (el.get("property") or el.get("name") or el.get("itemprop") or "").lower()
        if name in _TRUTH_META_NAMES and el.get("content"):
            m = _ISO_RE.match(el.get("content").strip())
            if m:
                return _iso(*m.groups())
    return None


def truth_from_url(url: str):
    m = _URL_DATE_RE.search(url) or _URL_ISO_RE.search(url)
    return _iso(*m.groups()) if m else None


def strip_truth_inputs(tree) -> None:
    "Remove the held-out published-time metas from the ladder's input."
    doomed = []
    for el in tree.iterdescendants("meta"):
        name = (el.get("property") or el.get("name") or el.get("itemprop") or "").lower()
        if name in _TRUTH_META_NAMES:
            doomed.append(el)
    for el in doomed:
        parent = el.getparent()
        if parent is not None:
            parent.remove(el)


def main() -> int:
    from trafilatura_spark.kernel.loader import load_html
    from trafilatura_spark.kernel.metadata import find_date

    with open(EVALDATA, "r", encoding="utf-8") as fh:
        evaldata = json.load(fh)

    tiers = Counter()
    confusion = []
    n_meta_truth = n_url_truth = 0
    for url, item in sorted(evaldata.items()):
        path = os.path.join(EVAL_DIR, item.get("file") or "")
        if not item.get("file") or not os.path.exists(path):
            continue
        with open(path, "rb") as fh:
            raw = fh.read()
        tree = load_html(raw)
        if tree is None:
            continue
        truth = truth_from_meta(tree)
        if truth:
            n_meta_truth += 1
        else:
            truth = truth_from_url(url)
            if truth:
                n_url_truth += 1
        if not truth:
            continue
        strip_truth_inputs(tree)
        # url=None: URL dates are the other held-out truth source
        pred = find_date(tree, url=None, max_date="2026-01-01")
        if pred == truth:
            tiers["exact"] += 1
        elif pred and pred[:7] == truth[:7]:
            tiers["same_month"] += 1
            confusion.append((url, truth, pred))
        elif pred and pred[:4] == truth[:4]:
            tiers["same_year"] += 1
            confusion.append((url, truth, pred))
        elif pred:
            tiers["disagree"] += 1
            confusion.append((url, truth, pred))
        else:
            tiers["none_found"] += 1
            confusion.append((url, truth, None))

    total = sum(tiers.values())
    for url, truth, pred in confusion:
        print(f"DIFF truth={truth} pred={pred} {url[:100]}")
    found = tiers["exact"] + tiers["same_month"] + tiers["same_year"] + tiers["disagree"]
    summary = {
        "pages_with_truth": total,
        "truth_from_meta": n_meta_truth,
        "truth_from_url": n_url_truth,
        "exact": tiers["exact"],
        "same_month": tiers["same_month"],
        "same_year": tiers["same_year"],
        "disagree": tiers["disagree"],
        "none_found": tiers["none_found"],
        "exact_rate": round(tiers["exact"] / total, 4) if total else None,
        "month_rate": round((tiers["exact"] + tiers["same_month"]) / total, 4) if total else None,
        "exact_rate_when_found": round(tiers["exact"] / found, 4) if found else None,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
