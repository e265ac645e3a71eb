"""Quality evaluation on the reference's own benchmark corpus.

Runs THIS engine's kernel over the reference's evaluation pages
(/root/reference/tests/eval, 926 real-world HTML files, read-only) and
scores precision/recall/accuracy/F1 by segment containment, exactly as
the reference's harness does (tests/evaluate.py:398-470: "with" segments
must appear in the output, "without" segments must not).

The expected segments come from the reference's handcrafted gold data
(tests/evaldata.py, loaded as data); no reference code executes.

Published comparison points (docs/evaluation.rst):
  trafilatura 1.2.2 standard F1=0.909 · readability-lxml F1=0.801 ·
  justext F1=0.742 · baseline dump F1=0.790.

Usage: python tools/evaluate_quality.py [n_procs] [limit]
"""

from __future__ import annotations

import importlib.util
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_DIR = "/root/reference/tests/eval"
EVALDATA = "/root/reference/tests/evaldata.py"


def load_evaldata() -> dict:
    spec = importlib.util.spec_from_file_location("evaldata", EVALDATA)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module.EVAL_PAGES


def _worker(args):
    filename, item = args
    from trafilatura_spark.kernel import bare_extract

    path = os.path.join(EVAL_DIR, filename)
    try:
        with open(path, "rb") as f:
            html = f.read()
    except OSError:
        return None
    t0 = time.monotonic()
    try:
        res = bare_extract(html)
        result, tier = res.text, res.tier
    except Exception:
        result, tier = None, "error"
    elapsed = time.monotonic() - t0
    if result is not None and isinstance(result, str):
        tp = sum(1 for seg in item["with"] if seg in result)
        fn = len(item["with"]) - tp
        fp = sum(1 for seg in item["without"] if seg in result)
        tn = len(item["without"]) - fp
    else:
        tp = fp = 0
        fn = len(item["with"])
        tn = len(item["without"])
    return tp, fn, fp, tn, elapsed, tier


def main() -> None:
    n_procs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    limit = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    pages = load_evaldata()
    work = []
    for url, item in pages.items():
        if os.path.exists(os.path.join(EVAL_DIR, item["file"])):
            work.append((item["file"], {"with": item["with"], "without": item["without"]}))
    if limit:
        work = work[:limit]

    with mp.Pool(n_procs) as pool:
        results = [r for r in pool.map(_worker, work) if r is not None]

    tp = sum(r[0] for r in results)
    fn = sum(r[1] for r in results)
    fp = sum(r[2] for r in results)
    tn = sum(r[3] for r in results)
    total_time = sum(r[4] for r in results)

    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    accuracy = (tp + tn) / (tp + tn + fp + fn) if results else 0.0
    fscore = (2 * tp) / (2 * tp + fp + fn) if tp else 0.0

    # per-tier confusion: which cascade stage produced each document's
    # output, and how that tier scores on its own documents — the lens
    # for tuning the readability/justext comparators without flying blind
    tiers: dict = {}
    for r in results:
        t = tiers.setdefault(r[5], [0, 0, 0, 0, 0])
        for i in range(4):
            t[i] += r[i]
        t[4] += 1
    tier_table = {
        tier: {
            "docs": t[4],
            "precision": round(t[0] / (t[0] + t[2]), 4) if t[0] + t[2] else None,
            "recall": round(t[0] / (t[0] + t[1]), 4) if t[0] + t[1] else None,
            "f1": round(2 * t[0] / (2 * t[0] + t[2] + t[1]), 4) if t[0] else 0.0,
        }
        for tier, t in sorted(tiers.items(), key=lambda kv: -kv[1][4])
    }

    print(
        json.dumps(
            {
                "docs": len(results),
                "precision": round(precision, 4),
                "recall": round(recall, 4),
                "accuracy": round(accuracy, 4),
                "f1": round(fscore, 4),
                "core_seconds": round(total_time, 1),
                "docs_per_core_sec": round(len(results) / total_time, 1) if total_time else None,
                "tiers": tier_table,
                "reference_published": {"trafilatura_standard_f1": 0.909, "readability_f1": 0.801,
                                        "justext_f1": 0.742, "baseline_f1": 0.790},
            }
        )
    )


if __name__ == "__main__":
    main()
