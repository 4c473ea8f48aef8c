"""mad_outliers (operators/profile.py): exact median/MAD arithmetic,
grouped and global, against a Python reference."""

from datafusion_geo_spark.operators.profile import mad_outliers


def _ref(vals, k=3):
    s = sorted(vals)
    n = len(s)
    med = s[-(-n * 50 // 100) - 1]  # smallest v with 100*cum >= 50*n
    devs = sorted(abs(v - med) for v in s)
    mad = devs[-(-n * 50 // 100) - 1]
    out = sum(1 for v in vals if abs(v - med) > k * mad)
    return med, mad, out


def test_global_matches_reference(spark):
    import random
    rng = random.Random(9)
    vals = [rng.randint(0, 100) for _ in range(300)] + [10_000, -5000]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = mad_outliers(df, "v").collect()[0]
    med, mad, nout = _ref(vals)
    assert (got.n, got.med, got.mad, got.n_outliers) == \
        (302, med, mad, nout)
    assert nout >= 2  # the planted extremes are caught


def test_grouped_isolation(spark):
    rows = [("a", v) for v in (1, 2, 3, 4, 100)] + \
           [("b", v) for v in (50, 51, 52)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: r for r in mad_outliers(df, "v",
                                        ("g",)).collect()}
    amed, amad, aout = _ref([1, 2, 3, 4, 100])
    assert (got["a"].med, got["a"].mad, got["a"].n_outliers) == \
        (amed, amad, aout)
    assert got["b"].n_outliers == 0 and got["b"].med == 51


def test_constant_column_zero_mad(spark):
    # all-equal values: MAD 0, every value dev 0 -> no outliers
    df = spark.createDataFrame([(7,)] * 10, "v long")
    got = mad_outliers(df, "v").collect()[0]
    assert (got.med, got.mad, got.n_outliers) == (7, 0, 0)
