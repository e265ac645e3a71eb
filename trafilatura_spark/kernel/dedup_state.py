"""Per-worker LRU segment dedup (reference deduplication.py:155-260).

This is the reference's ONLY cross-document state: an LRU counting text
segments; segments repeated more than max_repetitions get dropped.  It
is order-dependent and therefore per-worker in the Spark engine (each
Python worker keeps its own cache, like the reference's per-process
pools) — default OFF, matching the reference default
(deduplicate=False, core.py:304), and excluded from the cross-engine
equality contract (SURVEY.md §2.6).  For global, order-independent
dedup use the distributed operators in operators/dedup.py.
"""

from __future__ import annotations

from collections import OrderedDict

from .settings import Options
from .textutils import trim

LRU_SIZE = 4096


class LRUCache:
    "Size-bounded recency cache (functional match of deduplication.py:155-235)."

    __slots__ = ("maxsize", "_data")

    def __init__(self, maxsize: int = 128):
        self.maxsize = maxsize
        self._data: OrderedDict = OrderedDict()

    def get(self, key):
        if key in self._data:
            self._data.move_to_end(key)
            return self._data[key]
        return -1

    def put(self, key, value) -> None:
        if key in self._data:
            self._data.move_to_end(key)
        elif len(self._data) >= self.maxsize:
            self._data.popitem(last=False)
        self._data[key] = value

    def clear(self) -> None:
        self._data.clear()


LRU_TEST = LRUCache(maxsize=LRU_SIZE)


def put_in_cache(teststring: str) -> None:
    cacheval = LRU_TEST.get(teststring)
    value = cacheval + 1 if cacheval != -1 else 1
    LRU_TEST.put(teststring, value)


def duplicate_test(element, options: Options) -> bool:
    "Drop segments repeated more than max_repetitions (deduplication.py:248-260)."
    teststring = trim(" ".join(element.itertext()))
    if len(teststring) > options.min_duplcheck_size:
        cacheval = LRU_TEST.get(teststring)
        if cacheval > options.max_repetitions:
            LRU_TEST.put(teststring, cacheval + 1)
            return True
    put_in_cache(teststring)
    return False


def reset_caches() -> None:
    "Reference meta.py reset hook analog: clear per-worker state."
    LRU_TEST.clear()
