"""Readability/fallback tier win-lose analysis (VERDICT r2 item 9).

For every eval-corpus document whose cascade output came from a
FALLBACK tier (readability, justext, escalation, baseline), score BOTH
the chosen output and the main-extractor-only output (fast=True, which
skips the comparators) against the gold segments.  Reports, per tier,
how often the fallback beat / tied / lost to what the main extractor
would have produced — the evidence needed before touching any
comparator threshold.

Usage: python tools/tier_confusion.py [n_procs]
"""

from __future__ import annotations

import importlib.util
import json
import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_DIR = "/root/reference/tests/eval"
EVALDATA = "/root/reference/tests/evaldata.py"


def load_evaldata() -> dict:
    spec = importlib.util.spec_from_file_location("evaldata", EVALDATA)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module.EVAL_PAGES


def _f1(result, item) -> float:
    if not result:
        return 0.0
    tp = sum(1 for seg in item["with"] if seg in result)
    fp = sum(1 for seg in item["without"] if seg in result)
    fn = len(item["with"]) - tp
    return (2 * tp) / (2 * tp + fp + fn) if tp else 0.0


def _worker(args):
    filename, item = args
    from trafilatura_spark.kernel import Options, bare_extract

    try:
        with open(os.path.join(EVAL_DIR, filename), "rb") as f:
            html = f.read()
    except OSError:
        return None
    try:
        chosen = bare_extract(html)
    except Exception:
        return None
    if chosen.tier in ("main", "unparseable", "error", "timeout"):
        return None  # only fallback-tier docs are interesting
    try:
        main_only = bare_extract(html, Options(fast=True))
    except Exception:
        return None
    return (
        chosen.tier,
        round(_f1(chosen.text, item), 4),
        round(_f1(main_only.text, item), 4),
        filename,
    )


def main() -> None:
    n_procs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    pages = load_evaldata()
    work = [
        (item["file"], {"with": item["with"], "without": item["without"]})
        for item in pages.values()
        if os.path.exists(os.path.join(EVAL_DIR, item["file"]))
    ]
    with mp.Pool(n_procs) as pool:
        rows = [r for r in pool.map(_worker, work) if r is not None]

    tiers: dict = {}
    for tier, f1_chosen, f1_main, fname in rows:
        t = tiers.setdefault(tier, {"docs": 0, "wins": 0, "ties": 0, "losses": 0,
                                    "chosen_f1": 0.0, "main_f1": 0.0, "worst": []})
        t["docs"] += 1
        t["chosen_f1"] += f1_chosen
        t["main_f1"] += f1_main
        if f1_chosen > f1_main + 1e-9:
            t["wins"] += 1
        elif f1_chosen < f1_main - 1e-9:
            t["losses"] += 1
            t["worst"].append((round(f1_main - f1_chosen, 3), fname))
        else:
            t["ties"] += 1
    for t in tiers.values():
        t["chosen_f1"] = round(t["chosen_f1"] / t["docs"], 4)
        t["main_f1"] = round(t["main_f1"] / t["docs"], 4)
        t["worst"] = sorted(t["worst"], reverse=True)[:3]
    print(json.dumps(tiers, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
