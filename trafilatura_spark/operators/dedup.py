"""Deduplication operators for training-data pipelines.

All variants stay JVM-side (built-in functions, no Python UDFs) and have
exact DuckDB SQL twins for the correctness oracle:

- exact: md5-hash groupBy, survivor = min id per hash
- minhash + LSH: per-shingle md5 keyed by seed, min per seed -> signature;
  banding -> bucket join for candidate pairs
- n-gram Jaccard: shingle explode + self-join
- simhash: 16-bit signature from per-token md5 hex-digit parities

At 100 TB scale: exact dedup is one shuffle on the hash; minhash/LSH is
explode (map-side) + groupBy(doc) + groupBy(band-bucket) — candidate
pairs only materialize per bucket, never the full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SHINGLE_N = 3
DEFAULT_NUM_HASHES = 8
DEFAULT_BANDS = 4  # rows_per_band = num_hashes // bands


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", prefix: int = 0
) -> DataFrame:
    """Exact duplicate groups: (text_hash, keep_id, dup_count), groups of 2+.
    ``prefix`` > 0 hashes only the first N chars (prefix dedup, the cheap
    screen used before full-content hashing at scale)."""
    content = F.substring(F.col(text_col), 1, prefix) if prefix else F.col(text_col)
    hashed = df.select(F.md5(content).alias("text_hash"), F.col(id_col))
    return (
        hashed.groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def exact_dedup_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text", prefix: int = 0
) -> str:
    content = f"substring({text_col}, 1, {prefix})" if prefix else text_col
    return f"""
    SELECT md5({content}) AS text_hash, MIN({id_col}) AS keep_id, COUNT(*) AS dup_count
    FROM {table} GROUP BY 1 HAVING COUNT(*) > 1
    """


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct word n-gram shingles per document (lowercased, ws-tokenized).

    The shingle SET is per document, so dedup happens inside the array
    (array_distinct) BEFORE explode — no global shuffle for distinctness."""
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    ngrams = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(words) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(words, i, {n}))))"
    )
    return (
        df.select(F.col(id_col), words.alias("words"))
        .select(F.col(id_col), F.explode(ngrams).alias("shingle"))
    )


def _shingles_sql(table: str, id_col: str, text_col: str, n: int) -> str:
    return f"""
    SELECT {id_col},
           unnest(list_distinct(list_transform(
             range(1, GREATEST(len(words) - {n - 1}, 1) + 1),
             i -> array_to_string(words[i:i+{n - 1}], ' ')))) AS shingle
    FROM (SELECT {id_col},
                 string_split(regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g'), ' ') AS words
          FROM {table})
    """


def _sig_expr_parts(num_hashes: int):
    """(source_hash_index, hex_offset) per signature slot: num_hashes
    independent-ish 32-bit hash values carved as disjoint 8-hex windows
    out of ceil(num_hashes/4) md5 digests — 4 slots per digest, so the
    md5 work per shingle drops 4x vs one digest per slot."""
    return [(j // 4, (j % 4) * 8 + 1) for j in range(num_hashes)]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    "MinHash signature per doc: sig_j = min over shingles of a 32-bit md5 window."
    sh = _shingles(df, id_col, text_col, n)
    n_digests = (num_hashes + 3) // 4
    for d in range(n_digests):
        seed = "" if d == 0 else f"{d}:"
        sh = sh.withColumn(f"h{d}", F.md5(F.concat(F.lit(seed), F.col("shingle"))))
    aggs = [
        F.min(F.substring(F.col(f"h{src}"), off, 8)).alias(f"sig_{j}")
        for j, (src, off) in enumerate(_sig_expr_parts(num_hashes))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_signatures_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> str:
    n_digests = (num_hashes + 3) // 4
    digest_exprs = ", ".join(
        ("md5(shingle)" if d == 0 else f"md5('{d}:' || shingle)") + f" AS h{d}"
        for d in range(n_digests)
    )
    aggs = ", ".join(
        f"MIN(substring(h{src}, {off}, 8)) AS sig_{j}"
        for j, (src, off) in enumerate(_sig_expr_parts(num_hashes))
    )
    return (
        f"SELECT {id_col}, {aggs} FROM "
        f"(SELECT {id_col}, {digest_exprs} FROM ({_shingles_sql(table, id_col, text_col, n)})) "
        f"GROUP BY {id_col}"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    "Candidate near-dup pairs: docs sharing any LSH band bucket."
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{j}") for j in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(F.md5(F.concat_ws("|", *parts)).alias(f"band_{b}"))
    banded = sigs.select(F.col(id_col), *band_cols)
    stacked = banded.select(
        F.col(id_col),
        F.explode(
            F.array(*[F.concat(F.lit(f"{b}:"), F.col(f"band_{b}")) for b in range(bands)])
        ).alias("bucket"),
    )
    # materialize before the self-join: otherwise the whole shingle/minhash
    # lineage is recomputed once per join side
    stacked = stacked.persist()
    left = stacked.alias("l")
    right = stacked.alias("r")
    return (
        left.join(right, on="bucket")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_lsh_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> str:
    rows_per_band = num_hashes // bands
    band_exprs = []
    for b in range(bands):
        parts = " || '|' || ".join(f"sig_{j}" for j in range(b * rows_per_band, (b + 1) * rows_per_band))
        band_exprs.append(f"'{b}:' || md5({parts})")
    buckets = ", ".join(band_exprs)
    return f"""
    WITH sigs AS ({minhash_signatures_sql(table, id_col, text_col, n, num_hashes)}),
    stacked AS (
      SELECT {id_col}, unnest([{buckets}]) AS bucket FROM sigs
    )
    SELECT DISTINCT l.{id_col} AS id_a, r.{id_col} AS id_b
    FROM stacked l JOIN stacked r USING (bucket)
    WHERE l.{id_col} < r.{id_col}
    """


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
    threshold: float = 0.8,
) -> DataFrame:
    "Exact n-gram Jaccard similarity pairs above threshold."
    sh = _shingles(df, id_col, text_col, n)
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    l, r = sh.alias("l"), sh.alias("r")
    common = (
        l.join(r, on="shingle")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("ca"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("cb"))
    return (
        common.join(F.broadcast(ca), "id_a")
        .join(F.broadcast(cb), "id_b")
        .withColumn("jac_raw", F.col("n_common") / (F.col("ca") + F.col("cb") - F.col("n_common")))
        .filter(F.col("jac_raw") >= threshold)
        .select("id_a", "id_b", F.round(F.col("jac_raw"), 6).alias("jaccard"))
    )


def ngram_jaccard_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
    threshold: float = 0.8,
) -> str:
    return f"""
    WITH sh AS ({_shingles_sql(table, id_col, text_col, n)}),
    counts AS (SELECT {id_col}, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
    common AS (
      SELECT l.{id_col} AS id_a, r.{id_col} AS id_b, COUNT(*) AS n_common
      FROM sh l JOIN sh r USING (shingle)
      WHERE l.{id_col} < r.{id_col}
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(n_common * 1.0 / (ca.n_shingles + cb.n_shingles - n_common), 6) AS jaccard
    FROM common
    JOIN counts ca ON ca.{id_col} = id_a
    JOIN counts cb ON cb.{id_col} = id_b
    WHERE n_common * 1.0 / (ca.n_shingles + cb.n_shingles - n_common) >= {threshold}
    """


def ngram_jaccard_via_lsh(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """The 100 TB near-dup path: exact n-gram Jaccard computed ONLY on
    minhash-LSH candidate pairs.  The all-pairs shingle self-join of
    `ngram_jaccard_pairs` is O(sum of shingle-bucket sizes squared);
    here the expensive exact count is restricted to LSH candidates, so
    work scales with the number of near-duplicates, not documents^2."""
    candidates = minhash_lsh_pairs(df, id_col, text_col, n, num_hashes, bands)
    sh = _shingles(df, id_col, text_col, n)
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle"))
    common = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("ca"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("cb"))
    return (
        common.join(F.broadcast(ca), "id_a")
        .join(F.broadcast(cb), "id_b")
        .withColumn("jac_raw", F.col("n_common") / (F.col("ca") + F.col("cb") - F.col("n_common")))
        .filter(F.col("jac_raw") >= threshold)
        .select("id_a", "id_b", F.round(F.col("jac_raw"), 6).alias("jaccard"))
    )


def ngram_jaccard_via_lsh_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> str:
    return f"""
    WITH cand AS ({minhash_lsh_pairs_sql(table, id_col, text_col, n, num_hashes, bands)}),
    sh AS ({_shingles_sql(table, id_col, text_col, n)}),
    counts AS (SELECT {id_col}, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
    common AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM cand c
      JOIN sh a ON a.{id_col} = c.id_a
      JOIN sh b ON b.{id_col} = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(n_common * 1.0 / (ca.n_shingles + cb.n_shingles - n_common), 6) AS jaccard
    FROM common
    JOIN counts ca ON ca.{id_col} = id_a
    JOIN counts cb ON cb.{id_col} = id_b
    WHERE n_common * 1.0 / (ca.n_shingles + cb.n_shingles - n_common) >= {threshold}
    """


SIMHASH_BITS = 16
_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash: bit_j = sign of sum over tokens of +-1, where a
    token votes +1 on bit j iff hex digit j of md5(token) is odd.
    (Charikar simhash with md5-derived projections; reference analog:
    deduplication.py:86-149.)"""
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    tok = df.select(F.col(id_col), F.explode(words).alias("token"))
    tok = tok.withColumn("h", F.md5(F.col("token")))
    votes = [
        F.sum(
            F.when(F.substring(F.col("h"), j + 1, 1).isin(*_ODD_HEX), 1).otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sig = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return agg.select(F.col(id_col), sig.cast("int").alias("simhash"))


def simhash_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    in_list = "(" + ", ".join(f"'{d}'" for d in _ODD_HEX) + ")"
    votes = ", ".join(
        f"SUM(CASE WHEN substring(h, {j + 1}, 1) IN {in_list} THEN 1 ELSE -1 END) AS v_{j}"
        for j in range(SIMHASH_BITS)
    )
    bits = " + ".join(f"CASE WHEN v_{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS))
    return f"""
    WITH tok AS (
      SELECT {id_col}, md5(unnest(string_split(regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g'), ' '))) AS h
      FROM {table}
    ),
    agg AS (SELECT {id_col}, {votes} FROM tok GROUP BY {id_col})
    SELECT {id_col}, CAST({bits} AS INT) AS simhash FROM agg
    """
