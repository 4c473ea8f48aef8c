"""memo_get: the bounded LRU wrapper every process-level fit memo
routes through (r12 — the r11 verdict flagged the memos as unbounded
driver-memory growth over a 100 TB-session lifetime)."""

from datafusion_geo_spark.operators.util import memo_get


def test_hit_returns_same_object_without_refit():
    cache: dict = {}
    calls = []
    v1 = memo_get(cache, "a", lambda: calls.append(1) or object())
    v2 = memo_get(cache, "a", lambda: calls.append(2) or object())
    assert v1 is v2
    assert calls == [1]


def test_evicts_least_recently_used_past_cap():
    cache: dict = {}
    for k in "abcd":
        memo_get(cache, k, lambda k=k: k.upper(), cap=3)
    # 'a' was the LRU entry when 'd' pushed the size past 3
    assert set(cache) == {"b", "c", "d"}
    # a hit refreshes recency: touch 'b', insert 'e' -> 'c' evicted
    memo_get(cache, "b", lambda: "X", cap=3)
    memo_get(cache, "e", lambda: "E", cap=3)
    assert set(cache) == {"d", "b", "e"}
    assert cache["b"] == "B"


def test_every_fit_memo_routes_through_the_bound():
    # grep-level pin: no module keeps a raw `cache[key] = ` insert
    import inspect

    from datafusion_geo_spark.operators import bpe, similarity, unigram
    for mod, fn in [(similarity, similarity.kmeans_centroids_cached),
                    (similarity, similarity.pq_train_cached),
                    (bpe, bpe.bpe_train_cached),
                    (unigram, unigram.unigram_train),
                    (unigram, unigram.word_token_table),
                    (unigram, unigram._dict_cached)]:
        assert "memo_get" in inspect.getsource(fn), fn.__name__
