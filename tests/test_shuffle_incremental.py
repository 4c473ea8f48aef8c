"""seeded_shuffle (deterministic epoch ordering) and
incremental_exact_dedup (snapshot anti-join dedup)."""

import pyspark.sql.functions as F

from datafusion_geo_spark.operators.dedup import (exact_dedup,
                                                  incremental_exact_dedup)
from datafusion_geo_spark.operators.sampling import seeded_shuffle


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shuffle_deterministic_and_partition_invariant(spark):
    rows = [(i, f"doc {i}") for i in range(200)]
    a = seeded_shuffle(_docs(spark, rows), "doc_id", "s1") \
        .select("doc_id", "shuffle_order").collect()
    b = seeded_shuffle(_docs(spark, rows).repartition(7), "doc_id", "s1") \
        .select("doc_id", "shuffle_order").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # a different seed is a different permutation of the same ids
    c = seeded_shuffle(_docs(spark, rows), "doc_id", "s2") \
        .select("doc_id", "shuffle_order").collect()
    assert sorted(r["doc_id"] for r in c) == sorted(r["doc_id"] for r in a)
    assert sorted(map(tuple, c)) != sorted(map(tuple, a))
    # dense 1..n order values
    assert sorted(r["shuffle_order"] for r in a) == list(range(1, 201))


def test_incremental_equals_full_dedup_on_union(spark):
    seen_rows = [(i, f"text {i % 10}") for i in range(30)]
    batch_rows = [(100 + i, f"text {i % 25}") for i in range(50)]
    seen = _docs(spark, seen_rows)
    batch = _docs(spark, batch_rows)
    inc = incremental_exact_dedup(batch, seen)
    # union(seen-dedup, incremental) == full dedup of union, as sets of
    # content digests (canonical ids differ: full dedup may prefer a
    # batch id; exact_dedup returns aggregated text_md5 rows)
    full = exact_dedup(seen.unionByName(batch))
    seen_canon = exact_dedup(seen)
    inc_md5 = inc.select(F.md5(F.col("text")).alias("text_md5"))
    got = {r["text_md5"] for r in
           seen_canon.select("text_md5").union(inc_md5).collect()}
    want = {r["text_md5"] for r in full.select("text_md5").collect()}
    assert got == want
    # every batch text already in seen was dropped
    inc_texts = {r["text"] for r in inc.collect()}
    seen_texts = {t for _, t in seen_rows}
    assert not (inc_texts & seen_texts)
    # within-batch duplicates keep the smallest doc_id
    kept = {r["text"]: r["doc_id"] for r in inc.collect()}
    for text, did in kept.items():
        cands = [d for d, t in batch_rows if t == text]
        assert did == min(cands)
