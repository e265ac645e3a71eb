"""Production LSH profile pins (VERDICT r2 wrong-item 1 / next-round 3).

The s-curve P(candidate | s) = 1 - (1 - s^r)^b governs the band/row
choice; these tests pin the production profile's operating points so a
parameter change must consciously rewrite them."""

import pytest

from trafilatura_spark.operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_HASHES,
    PRODUCTION_BANDS,
    PRODUCTION_NUM_HASHES,
    _sig_expr_parts,
    lsh_candidate_probability,
    lsh_threshold,
)


def test_production_profile_shape():
    assert PRODUCTION_NUM_HASHES == 128
    assert PRODUCTION_BANDS == 32
    assert PRODUCTION_NUM_HASHES % PRODUCTION_BANDS == 0  # 4 rows per band


def test_s_curve_threshold_values():
    # gate profile: r=2, b=4 -> s* = 0.5
    assert lsh_threshold(DEFAULT_NUM_HASHES, DEFAULT_BANDS) == pytest.approx(0.5)
    # production: r=4, b=32 -> s* = (1/32)^(1/4) ~ 0.4204
    assert lsh_threshold(PRODUCTION_NUM_HASHES, PRODUCTION_BANDS) == pytest.approx(
        0.42045, abs=1e-4
    )


def test_s_curve_operating_points_production():
    p = lambda s: lsh_candidate_probability(s, PRODUCTION_NUM_HASHES, PRODUCTION_BANDS)
    # near-dups are caught essentially always
    assert p(0.9) > 0.999999
    assert p(0.8) > 0.9999
    # dissimilar pairs rarely become candidates
    assert p(0.2) < 0.052
    assert p(0.1) < 0.0032
    # monotone s-curve
    grid = [p(s / 10) for s in range(1, 10)]
    assert all(a < b for a, b in zip(grid, grid[1:]))


def test_signature_scheme_supports_128_slots():
    """128 hash slots must map to 32 md5 digests, 4 disjoint 8-hex windows
    each (the amortization the production profile relies on)."""
    parts = _sig_expr_parts(PRODUCTION_NUM_HASHES)
    assert len(parts) == 128
    assert max(src for src, _ in parts) == 31  # 32 digests
    # windows within a digest are disjoint 8-hex spans of the 32-hex md5
    for src in range(32):
        offsets = sorted(off for s, off in parts if s == src)
        assert offsets == [1, 9, 17, 25]
