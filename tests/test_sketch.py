"""Sketch operators: CountMin over-count bound, Bloom no-false-negative
guarantee, HLL register equivalence vs a pure-Python replay of the same
md5 hashing."""

import hashlib

import pyspark.sql.functions as F
import pytest

from datafusion_geo_spark.operators.sketch import (
    bloom_filter_new, bloom_positions, count_min_sketch, count_min_topk,
    hll_estimate, hll_registers, seeded_h64)


def _h(tag, i, s):
    return int(hashlib.md5(f"{tag}{i}|{s}".encode()).hexdigest()[:8], 16)


def test_seeded_h64_matches_python(spark):
    df = spark.createDataFrame([("alpha",), ("beta",), ("42",)], ["s"])
    got = {r["s"]: r["h"] for r in
           df.select("s", seeded_h64("cm", 3, F.col("s")).alias("h"))
           .collect()}
    for s, h in got.items():
        assert h == _h("cm", 3, s)


def test_count_min_never_undercounts(spark):
    # skewed stream: 'hot' 50x, a long tail of 200 singletons in a
    # width-64 sketch -> collisions guaranteed, est >= exact always
    rows = [("hot",)] * 50 + [(f"w{i}",) for i in range(200)]
    toks = spark.createDataFrame(rows, ["tok"])
    exact = {r["tok"]: r["n"] for r in
             toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {r["tok"]: r["est_cnt"] for r in
           count_min_topk(toks, "tok", 1000, depth=4, width=64).collect()}
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)
    top = count_min_topk(toks, "tok", 1, depth=4, width=64).collect()[0]
    assert top["tok"] == "hot" and top["est_cnt"] >= 50


def test_count_min_sketch_is_bounded(spark):
    rows = [(f"w{i % 37}",) for i in range(500)]
    sk = count_min_sketch(spark.createDataFrame(rows, ["tok"]),
                          "tok", depth=3, width=16).collect()
    assert len(sk) <= 3 * 16
    per_row = {}
    for r in sk:
        per_row[r["row"]] = per_row.get(r["row"], 0) + r["cnt"]
    assert all(v == 500 for v in per_row.values())  # mass preserved


def test_bloom_no_false_negatives(spark):
    corpus = spark.createDataFrame([(f"doc{i}",) for i in range(300)],
                                   ["key"])
    overlap = [(f"doc{i}",) for i in range(0, 300, 3)]
    fresh = [(f"new{i}",) for i in range(100)]
    batch = spark.createDataFrame(overlap + fresh, ["key"])
    out = {r["key"] for r in
           bloom_filter_new(corpus, batch, "key", m=8192, k=4).collect()}
    # every corpus key must be dropped (no false negatives)
    assert not any(k.startswith("doc") for k in out)
    # survivors are a subset of the genuinely-new keys; with m=8192,
    # n=300, k=4 the FP rate is ~1e-5 so nearly all 100 survive
    assert out <= {k for (k,) in fresh}
    assert len(out) >= 95


def test_bloom_positions_bounded_and_deterministic(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(500)], ["key"])
    p1 = sorted(r["pos"] for r in
                bloom_positions(keys, "key", m=256, k=4).collect())
    p2 = sorted(r["pos"] for r in
                bloom_positions(keys, "key", m=256, k=4).collect())
    assert p1 == p2
    assert len(p1) <= 256 and all(0 <= v < 256 for v in p1)


def test_hll_registers_match_python_replay(spark):
    keys = [f"u{i}" for i in range(1000)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    got = {r["register"]: r["rho"]
           for r in hll_registers(df, "key", b=8).collect()}
    want = {}
    for s in keys:
        h = _h("hll", 0, s)
        reg, v = h % 256, h >> 8
        rho = 25 - v.bit_length() if v > 0 else 25
        want[reg] = max(want.get(reg, 0), rho)
    assert got == want


def test_hll_registers_merge_is_max(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(200)], ["key"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(200)], ["key"])
    both = a.unionByName(b)
    direct = {r["register"]: r["rho"]
              for r in hll_registers(both, "key", b=6).collect()}
    ra = hll_registers(a, "key", b=6)
    rb = hll_registers(b, "key", b=6)
    merged = {r["register"]: r["rho"] for r in
              ra.unionByName(rb).groupBy("register")
              .agg(F.max("rho").alias("rho")).collect()}
    assert direct == merged


def test_sketch_guards():
    import pyspark.sql.functions as _  # noqa: F401
    from datafusion_geo_spark.operators import sketch
    with pytest.raises(ValueError):
        sketch.count_min_sketch(None, "t", depth=0)
    with pytest.raises(ValueError):
        sketch.bloom_positions(None, "k", m=1)
    with pytest.raises(ValueError):
        sketch.hll_registers(None, "k", b=1)


def test_streaming_hll_equals_batch(spark, tmp_path):
    """The same hll_registers operator over a bounded stream replay must
    produce the identical register table as the batch run — constant
    2^b-row state, no watermark."""
    import pandas as pd

    pdf = pd.DataFrame({"key": [f"u{i % 137}" for i in range(1000)]})
    src = str(tmp_path / "keys")
    spark.createDataFrame(pdf).coalesce(2).write.parquet(src)
    batch = {r["register"]: r["rho"] for r in
             hll_registers(spark.read.parquet(src), "key", b=6).collect()}
    stream = (spark.readStream.schema("key string").parquet(src))
    agg = hll_registers(stream, "key", b=6)
    from datafusion_geo_spark.streaming.runner import run_bounded_complete
    got = {r["register"]: r["rho"] for r in
           run_bounded_complete(agg, "t_hll_").collect()}
    assert got == batch


def test_null_keys_carry_no_mass(spark):
    """NULL tokens/keys must not contribute cells, positions, or
    registers (null-in -> dropped, the repo-wide null discipline)."""
    toks = spark.createDataFrame([("a",), (None,), ("a",)], ["tok"])
    sk = count_min_sketch(toks, "tok", depth=2, width=8).collect()
    assert all(r["cnt"] == 2 for r in sk)  # only the two 'a' updates
    est = count_min_topk(toks, "tok", 10, depth=2, width=8).collect()
    assert [r["tok"] for r in est] == ["a"]
    keys = spark.createDataFrame([("k",), (None,)], ["key"])
    assert bloom_positions(keys, "key", m=64, k=2).count() <= 2
    regs = hll_registers(keys, "key", b=4).collect()
    assert len(regs) == 1 and regs[0]["register"] is not None
    out = bloom_filter_new(keys, keys, "key", m=64, k=2).collect()
    # the null-key batch row passes through untouched (never a dup)
    assert {r["key"] for r in out} == {None}


def test_count_min_topk_candidate_set(spark):
    """A bounded candidate frame restricts scoring without touching the
    sketch — the production scale path."""
    rows = [("hot",)] * 30 + [(f"w{i}",) for i in range(50)]
    toks = spark.createDataFrame(rows, ["tok"])
    cands = spark.createDataFrame([("hot",), ("w1",), ("absent",)], ["tok"])
    got = {r["tok"]: r["est_cnt"] for r in
           count_min_topk(toks, "tok", 10, depth=4, width=256,
                          candidates=cands).collect()}
    # 'absent' has no sketch mass only if its cells are empty; with
    # width=256 and 51 distinct tokens collisions are possible, so just
    # pin the two real candidates and that no other token appears
    assert set(got) <= {"hot", "w1", "absent"}
    assert got["hot"] >= 30 and got["w1"] >= 1


def test_hll_estimate_accuracy_and_replay(spark):
    """Estimate within the ~1.04/sqrt(m) HLL error band for a known
    cardinality, and z_scaled replays the pure-Python registers."""
    n = 5000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], ["key"])
    row = hll_estimate(df, "key", b=8).collect()[0]
    regs = {}
    for i in range(n):
        h = _h("hll", 0, f"u{i}")
        reg, v = h % 256, h >> 8
        rho = 25 - v.bit_length() if v > 0 else 25
        regs[reg] = max(regs.get(reg, 0), rho)
    want_z = sum(2 ** (25 - r) for r in regs.values())
    assert row["z_scaled"] == want_z
    assert row["n_registers"] == len(regs)
    # 3-sigma band: 1.04/sqrt(256) ~ 6.5% per sigma
    assert abs(row["est"] - n) / n < 0.20


def test_hll_estimate_sparse_uses_linear_counting(spark):
    """Regression for the empty-register mass bug: a SPARSE sketch
    (90 keys, 256 registers) must estimate near truth via linear
    counting, not orders-of-magnitude high (the omitted (m-V)*2^maxrho
    indicator term made raw ~2200 for 90 keys)."""
    df = spark.createDataFrame([(f"u{i}",) for i in range(90)], ["key"])
    row = hll_estimate(df, "key", b=8).collect()[0]
    assert abs(row["est"] - 90) / 90 < 0.30, row["est"]


def test_hll_set_ops_union_and_intersection(spark):
    from datafusion_geo_spark.operators.sketch import hll_set_ops
    a = spark.createDataFrame([(f"u{i}",) for i in range(120)], ["key"])
    b = spark.createDataFrame([(f"u{i}",) for i in range(60, 200)], ["key"])
    row = hll_set_ops(a, b, "key").collect()[0]
    # truth: |A|=120 |B|=140 |U|=200 |I|=60; b=8 sketch error ~6.5%/sigma
    assert abs(row["est_a"] - 120) / 120 < 0.30
    assert abs(row["est_b"] - 140) / 140 < 0.30
    assert abs(row["est_union"] - 200) / 200 < 0.30
    assert abs(row["est_inter"] - 60) / 60 < 0.60  # I-E compounds error
    # union register table dominates both sides register-wise
    assert row["n_reg_u"] >= max(row["n_reg_a"], row["n_reg_b"])
    assert row["z_u"] >= max(row["z_a"], row["z_b"])


def test_kmv_quantiles_matches_python_replay(spark):
    """The KMV sample is exactly the global bottom-k by (h64(id), value)
    — replayed here in pure Python — and the shard-partial merge must
    not change it. Quantiles are the sample's rank statistics; the
    distinct estimate is exact (= m) below k."""
    import hashlib

    from datafusion_geo_spark.operators.sketch import kmv_quantile_sketch
    rows = [(i, i % 7, "g", float((i * 37) % 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, "
                                     "event_type string, value double")
    out = kmv_quantile_sketch(df, "event_type", "value", "event_id",
                              "user_id", k=16).collect()
    assert len(out) == 1
    r = out[0]
    h = lambda x: int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)
    sample = sorted((h(i), v) for i, _, _, v in rows)[:16]
    vals = sorted(v for _, v in sample)
    assert r["n_events"] == 500 and r["n_sample"] == 16
    import math
    assert r["p50"] == vals[max(1, math.ceil(0.5 * 16)) - 1]
    assert r["p90"] == vals[max(1, math.ceil(0.9 * 16)) - 1]
    assert r["p99"] == vals[max(1, math.ceil(0.99 * 16)) - 1]
    # 7 distinct users < k=16 -> exact count, not the (k-1)/h_k estimate
    assert r["ndv_users"] == 7.0


def test_kmv_quantiles_ndv_estimate_above_k(spark):
    """Above k distinct users the KMV estimate (k-1)/h_k kicks in; with
    1000 uniform 32-bit hashes and k=64 this fixture's deterministic
    draw lands at ~1235 (md5 replay) — assert the exact value so any
    arithmetic drift (hash base, rounding, rank-off-by-one) trips."""
    import hashlib

    from datafusion_geo_spark.operators.sketch import kmv_quantile_sketch
    rows = [(i, i, "g", 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, "
                                     "event_type string, value double")
    r = kmv_quantile_sketch(df, "event_type", "value", "event_id",
                            "user_id", k=64).collect()[0]
    assert r["n_sample"] == 64
    hs = sorted(int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                for i in range(1000))
    want = ((2_000_000 * 63 * 4294967296 + hs[63])
            // (2 * hs[63])) / 1_000_000.0
    assert r["ndv_users"] == want
    assert abs(r["ndv_users"] - 1000) / 1000 < 0.30  # ~2 sigma at k=64


def test_kmv_state_step_batch_split_insensitive():
    """The streaming KMV's correctness claim: ANY partition of the rows
    into micro-batches folds to the same final state and estimates
    (min-k union is associative/commutative), and the final row equals
    the single-batch (= batch operator) result."""
    import hashlib

    from datafusion_geo_spark.streaming.sketch import kmv_state_step
    h = lambda x: int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)
    rows = [(h(i), float((i * 13) % 50), h(i % 9)) for i in range(300)]
    one_state, one_est = kmv_state_step(None, rows, k=16)
    for cut1, cut2 in ((100, 200), (1, 299), (150, 150)):
        st, _ = kmv_state_step(None, rows[:cut1], k=16)
        if cut2 > cut1:
            st, _ = kmv_state_step(st, rows[cut1:cut2], k=16)
        st, est = kmv_state_step(st, rows[cut2:], k=16)
        assert st == one_state and est == one_est
    # reordered rows too
    st, est = kmv_state_step(None, sorted(rows, reverse=True), k=16)
    assert st == one_state and est == one_est
