"""r12 query previews: the six operators deferred past the full r11
gate, each already compared against a DuckDB oracle EXACTLY the way
the driver gate will (same normalize, check_exact) — so r12's
registration is wiring, not development. Fixtures and SQL here are
the blueprints for the r12 ``queries()``/``oracle_sql()`` entries.
"""

import os

import duckdb
import pandas as pd
import pyspark.sql.functions as F
import pytest

# sf0.001 by default; the driver-scale prepass overrides with
# SPARK_GRAFT_PREVIEW_SF_DIR=/root/testdata/sf0.01 (the same
# insurance run the r11 gate block got before registration)
SF = os.environ.get("SPARK_GRAFT_PREVIEW_SF_DIR",
                    "/root/testdata/sf0.001")
TABLES = ("customer", "events", "lineitem", "part")


def _duck(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF}/{t}.parquet'")
    return con.execute(sql).df()


def _check(got_df, sql):
    got = got_df.toPandas()
    want = _duck(sql)
    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if str(df[c].dtype) == "float64":
                df[c] = df[c].round(9)
        return df.sort_values(sorted(df.columns)) \
                 .reset_index(drop=True)
    g, w = norm(got), norm(want)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                  check_exact=True)


def test_preview_trend_by_key(spark):
    from datafusion_geo_spark.operators.timeseries import trend_by_key
    from datafusion_geo_spark.sources.fixtures import load_events
    ev = (load_events(spark, SF)
          .where(F.col("value").isNotNull())
          .select("user_id",
                  F.expr("unix_micros(ts) div 3600000000")
                  .alias("hr"),
                  F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                  .cast("long").alias("cents")))
    _check(trend_by_key(ev, "user_id", "hr", "cents"), """
        WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS x,
                          CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                            AS y
                   FROM events WHERE value IS NOT NULL),
        g AS (SELECT user_id, COUNT(*)::BIGINT AS n,
                     SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
                     SUM(x * y)::BIGINT AS sxy,
                     SUM(x * x)::BIGINT AS sxx
              FROM e GROUP BY 1)
        SELECT user_id, n,
               (n * sxy - sx * sy)::BIGINT AS slope_num,
               (n * sxx - sx * sx)::BIGINT AS slope_den,
               CASE WHEN (n * sxx - sx * sx) > 0 THEN
                 (CASE WHEN ((n * sxy - sx * sy)::DOUBLE
                             / (n * sxx - sx * sx)::DOUBLE) < 0
                       THEN -1 ELSE 1 END)
                 * floor(abs((n * sxy - sx * sy)::DOUBLE
                             / (n * sxx - sx * sx)::DOUBLE)
                         * 1000000.0 + 0.5) / 1000000.0 + 0.0
               END AS slope
        FROM g
    """)


def test_preview_cusum_changepoint(spark):
    from datafusion_geo_spark.operators.timeseries import (
        cusum_changepoint)
    from datafusion_geo_spark.sources.fixtures import load_events
    ev = (load_events(spark, SF)
          .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select("user_id",
                  F.expr("unix_micros(ts) div 3600000000")
                  .alias("hr"),
                  F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                  .cast("long").alias("cents")))
    _check(cusum_changepoint(ev, "user_id", "hr", "cents"), """
        WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS x,
                          CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                            AS y
                   FROM events
                   WHERE value IS NOT NULL AND ts IS NOT NULL),
        px AS (SELECT user_id, x, SUM(y)::BIGINT AS sy
               FROM e GROUP BY 1, 2),
        scan AS (SELECT user_id, x,
                   SUM(sy) OVER (PARTITION BY user_id
                                 ORDER BY x)::BIGINT AS s_k,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY x)::BIGINT AS k,
                   SUM(sy) OVER (PARTITION BY user_id)::BIGINT AS t,
                   COUNT(*) OVER (PARTITION BY user_id)::BIGINT AS n
                 FROM px),
        cand AS (SELECT user_id, n, t, x,
                        abs(n * s_k - k * t)::BIGINT AS d
                 FROM scan WHERE k < n),
        mx AS (SELECT user_id, max(d) AS md FROM cand GROUP BY 1),
        best AS (SELECT c.user_id, c.n, c.t, mx.md,
                        min(c.x) AS cp_x
                 FROM cand c
                 JOIN mx ON mx.user_id = c.user_id AND c.d = mx.md
                 GROUP BY 1, 2, 3, 4)
        SELECT user_id, n AS n_slots, t AS total_y, cp_x,
               md AS cusum_num, n AS cusum_den,
               ((2000000 * md + n) // (2 * n)) / 1000000.0 AS cusum
        FROM best
    """)


def test_preview_seasonal_profile(spark):
    from datafusion_geo_spark.operators.timeseries import (
        seasonal_profile)
    from datafusion_geo_spark.sources.fixtures import load_events
    ev = (load_events(spark, SF)
          .select("ts",
                  F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                  .cast("long").alias("cents")))
    _check(seasonal_profile(ev, "ts", "cents", period=24), """
        WITH e AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS pos,
                          CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                            AS y
                   FROM events
                   WHERE ts IS NOT NULL AND value IS NOT NULL),
        c AS (SELECT pos, COUNT(*)::BIGINT AS n,
                     SUM(y)::BIGINT AS sum_y
              FROM e GROUP BY 1),
        t AS (SELECT COUNT(*)::BIGINT AS nn, SUM(y)::BIGINT AS ss
              FROM e),
        m AS (SELECT pos, n, sum_y,
                (CASE WHEN sum_y < 0 THEN -1 WHEN sum_y = 0 THEN 0
                      ELSE 1 END)
                  * ((2000000 * abs(sum_y) + n) // (2 * n)) AS mp,
                (CASE WHEN ss < 0 THEN -1 WHEN ss = 0 THEN 0
                      ELSE 1 END)
                  * ((2000000 * abs(ss) + nn) // (2 * nn)) AS ma
              FROM c, t)
        SELECT pos, n, sum_y, mp / 1000000.0 AS mean,
               (mp - ma) / 1000000.0 AS seasonal_idx
        FROM m
    """)


def test_preview_chi2_independence(spark):
    from datafusion_geo_spark.operators.profile import (
        chi2_independence, chi2_independence_stat)
    from datafusion_geo_spark.sources.fixtures import load_table
    cust = load_table(spark, SF, "customer")
    oracle_cells = """
        WITH obs AS (SELECT c_mktsegment::VARCHAR AS val_a,
                            c_nationkey::VARCHAR AS val_b
                     FROM customer
                     WHERE c_mktsegment IS NOT NULL
                       AND c_nationkey IS NOT NULL),
        cells AS (SELECT val_a, val_b, COUNT(*)::BIGINT AS o
                  FROM obs GROUP BY 1, 2),
        rt AS (SELECT val_a, SUM(o)::BIGINT AS row_tot
               FROM cells GROUP BY 1),
        ct AS (SELECT val_b, SUM(o)::BIGINT AS col_tot
               FROM cells GROUP BY 1),
        t AS (SELECT SUM(o)::BIGINT AS n FROM cells),
        grid AS (SELECT rt.val_a, ct.val_b, rt.row_tot, ct.col_tot
                 FROM rt, ct)
        SELECT g.val_a, g.val_b,
               COALESCE(c.o, 0)::BIGINT AS observed,
               g.row_tot, g.col_tot,
               floor((g.row_tot::DOUBLE * g.col_tot::DOUBLE
                      / t.n::DOUBLE) * 1000000.0 + 0.5)
                 / 1000000.0 + 0.0 AS expected,
               CAST(floor(
                 ((COALESCE(c.o, 0) * t.n
                   - g.row_tot * g.col_tot)::DOUBLE
                  * (COALESCE(c.o, 0) * t.n
                     - g.row_tot * g.col_tot)::DOUBLE
                  / (t.n::DOUBLE * g.row_tot::DOUBLE
                     * g.col_tot::DOUBLE)) * 1000000.0 + 0.5)
                 AS BIGINT) AS term_micro
        FROM grid g
        LEFT JOIN cells c
          ON c.val_a = g.val_a AND c.val_b = g.val_b, t
    """
    _check(chi2_independence(cust, "c_mktsegment", "c_nationkey"),
           oracle_cells)
    _check(chi2_independence_stat(cust, "c_mktsegment",
                                  "c_nationkey"), f"""
        WITH cells2 AS ({oracle_cells}),
        a AS (SELECT SUM(observed)::BIGINT AS n,
                     COUNT(*)::BIGINT AS n_cells,
                     (COUNT(DISTINCT val_a) - 1)::BIGINT AS ra,
                     (COUNT(DISTINCT val_b) - 1)::BIGINT AS cb,
                     SUM(term_micro)::BIGINT AS cm
              FROM cells2)
        SELECT n, n_cells, (ra * cb)::BIGINT AS dof,
               cm / 1000000.0 + 0.0 AS chi2,
               CASE WHEN least(ra, cb) > 0 THEN
                 floor(sqrt((cm / 1000000.0 + 0.0)
                            / (n::DOUBLE * least(ra, cb)::DOUBLE))
                       * 1000000.0 + 0.5) / 1000000.0 + 0.0
               END AS cramers_v
        FROM a
    """)


def test_preview_phonetic_blocks(spark):
    from datafusion_geo_spark.operators.linkage import (
        phonetic_blocks)
    from datafusion_geo_spark.sources.fixtures import load_table
    part = load_table(spark, SF, "part")
    _check(phonetic_blocks(part, "p_name", "p_partkey"), """
        WITH w AS (SELECT p_name AS nm, p_partkey AS id,
                          upper(regexp_extract(p_name, '[A-Za-z]+'))
                            AS w
                   FROM part),
        m AS (SELECT nm, id, w,
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(regexp_replace(regexp_replace(
                  translate(w, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                            '01230120022455012623010202'),
                  '11+', '1', 'g'), '22+', '2', 'g'),
                  '33+', '3', 'g'), '44+', '4', 'g'),
                  '55+', '5', 'g'), '66+', '6', 'g') AS mc
              FROM w WHERE length(w) > 0),
        b AS (SELECT substr(w, 1, 1)
                       || rpad(substr(replace(substr(mc, 2),
                                              '0', ''), 1, 3),
                               3, '0') AS code,
                     nm, id
              FROM m)
        SELECT code, COUNT(*)::BIGINT AS n,
               COUNT(DISTINCT nm)::BIGINT AS n_distinct_names,
               ((COUNT(*)::BIGINT * (COUNT(*)::BIGINT - 1)) // 2)
                 ::BIGINT AS n_pairs
        FROM b GROUP BY 1
    """)


def test_preview_spearman(spark):
    from datafusion_geo_spark.operators.evals import spearman_corr
    from datafusion_geo_spark.sources.fixtures import load_events
    ev = (load_events(spark, SF)
          .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select(F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                  .cast("long").alias("cents"),
                  F.expr("unix_micros(ts) div 3600000000")
                  .alias("hr")))
    _check(spearman_corr(ev, "cents", "hr"), """
        WITH e AS (SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                            AS x,
                          epoch_us(ts) // 3600000000 AS y
                   FROM events
                   WHERE value IS NOT NULL AND ts IS NOT NULL),
        cells AS (SELECT x, y, COUNT(*)::BIGINT AS c
                  FROM e GROUP BY 1, 2),
        hx AS (SELECT x, SUM(c)::BIGINT AS cx FROM cells GROUP BY 1),
        hy AS (SELECT y, SUM(c)::BIGINT AS cy FROM cells GROUP BY 1),
        hx2 AS (SELECT x, cx,
                  COALESCE(SUM(cx) OVER (ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0)::BIGINT AS cumx
                FROM hx),
        hy2 AS (SELECT y, cy,
                  COALESCE(SUM(cy) OVER (ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0)::BIGINT AS cumy
                FROM hy),
        t AS (SELECT SUM(c)::BIGINT AS n FROM cells),
        j AS (SELECT c.c,
                     (2 * hx2.cumx + hx2.cx - t.n) AS u,
                     (2 * hy2.cumy + hy2.cy - t.n) AS v
              FROM cells c
              JOIN hx2 ON hx2.x = c.x
              JOIN hy2 ON hy2.y = c.y, t),
        a AS (SELECT SUM(c)::BIGINT AS n_rows,
                     SUM(c * u * v)::BIGINT AS suv_num,
                     SUM(c * u * u)::BIGINT AS suu_num,
                     SUM(c * v * v)::BIGINT AS svv_num
              FROM j)
        SELECT n_rows, suv_num, suu_num, svv_num,
               CASE WHEN suu_num > 0 AND svv_num > 0 THEN
                 (CASE WHEN suv_num < 0 THEN -1 ELSE 1 END)
                 * floor(abs(suv_num::DOUBLE
                             / sqrt(suu_num::DOUBLE
                                    * svv_num::DOUBLE))
                         * 1000000.0 + 0.5) / 1000000.0 + 0.0
               END AS rho
        FROM a
    """)


def test_preview_stump_fit(spark):
    from datafusion_geo_spark.operators.mlfit import stump_fit
    from datafusion_geo_spark.sources.fixtures import load_events
    ev = (load_events(spark, SF)
          .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select(F.expr("(unix_micros(ts) div 3600000000) % 24")
                  .alias("hr"),
                  (F.col("user_id") % 10).alias("udig"),
                  F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                  .cast("long").alias("cents")))
    _check(stump_fit(ev, ["hr", "udig"], "cents"), """
        WITH e AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hr,
                          user_id % 10 AS udig,
                          CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                            AS y
                   FROM events
                   WHERE value IS NOT NULL AND ts IS NOT NULL),
        m AS (SELECT 'hr' AS feature, hr AS v, y FROM e
              WHERE hr IS NOT NULL AND y IS NOT NULL
              UNION ALL
              SELECT 'udig', udig, y FROM e
              WHERE udig IS NOT NULL AND y IS NOT NULL),
        hist AS (SELECT feature, v, COUNT(*)::BIGINT AS n,
                        SUM(y)::BIGINT AS s
                 FROM m GROUP BY 1, 2),
        scan AS (SELECT feature, v,
                   SUM(n) OVER (PARTITION BY feature ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)::BIGINT AS nl,
                   SUM(s) OVER (PARTITION BY feature ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)::BIGINT AS sl,
                   SUM(n) OVER (PARTITION BY feature)::BIGINT AS nt,
                   SUM(s) OVER (PARTITION BY feature)::BIGINT AS st
                 FROM hist),
        cand AS (SELECT feature, v, nl, sl, nt, st,
                   (sl::DOUBLE * sl::DOUBLE / nl::DOUBLE
                    + (st - sl)::DOUBLE * (st - sl)::DOUBLE
                      / (nt - nl)::DOUBLE) AS sc
                 FROM scan WHERE nl < nt),
        mxs AS (SELECT feature, max(sc) AS msc
                FROM cand GROUP BY 1),
        best AS (SELECT c.feature, min(c.v) AS threshold
                 FROM cand c
                 JOIN mxs ON mxs.feature = c.feature
                         AND c.sc = mxs.msc
                 GROUP BY 1),
        fin AS (SELECT c.* FROM cand c
                JOIN best b ON b.feature = c.feature
                           AND b.threshold = c.v)
        SELECT feature, v AS threshold, nl AS n_left,
               sl AS sum_left, (nt - nl)::BIGINT AS n_right,
               (st - sl)::BIGINT AS sum_right,
               (CASE WHEN (sc - st::DOUBLE * st::DOUBLE
                           / nt::DOUBLE) < 0 THEN -1 ELSE 1 END)
               * floor(abs(sc - st::DOUBLE * st::DOUBLE
                           / nt::DOUBLE) * 1000000.0 + 0.5)
                 / 1000000.0 + 0.0 AS gain
        FROM fin
    """)


def test_preview_ttest_welch(spark):
    from datafusion_geo_spark.operators.evals import ttest_welch
    from datafusion_geo_spark.sources.fixtures import load_events
    ev = (load_events(spark, SF)
          .select("event_type",
                  F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                  .cast("long").alias("cents")))
    _check(ttest_welch(ev, "cents", "event_type", "purchase",
                       "view"), """
        WITH e AS (SELECT event_type AS g,
                          CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                            AS y
                   FROM events
                   WHERE value IS NOT NULL
                     AND event_type IN ('purchase', 'view')),
        a AS (SELECT
                SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0
                    END)::BIGINT AS na,
                SUM(CASE WHEN g = 'purchase' THEN y ELSE 0
                    END)::BIGINT AS sa,
                SUM(CASE WHEN g = 'purchase' THEN y * y ELSE 0
                    END)::BIGINT AS ssa,
                SUM(CASE WHEN g = 'view' THEN 1 ELSE 0
                    END)::BIGINT AS nb,
                SUM(CASE WHEN g = 'view' THEN y ELSE 0
                    END)::BIGINT AS sb,
                SUM(CASE WHEN g = 'view' THEN y * y ELSE 0
                    END)::BIGINT AS ssb
              FROM e),
        v AS (SELECT na, nb, sa, sb,
                     (na * ssa - sa * sa)::BIGINT AS vna,
                     (nb * ssb - sb * sb)::BIGINT AS vnb,
                     (na * ssa - sa * sa)::DOUBLE
                       / (na * (na - 1))::DOUBLE / na::DOUBLE
                       AS sea,
                     (nb * ssb - sb * sb)::DOUBLE
                       / (nb * (nb - 1))::DOUBLE / nb::DOUBLE
                       AS seb
              FROM a)
        SELECT na AS n_a, nb AS n_b,
               CASE WHEN na > 0 THEN
                 (CASE WHEN sa < 0 THEN -1 WHEN sa = 0 THEN 0
                       ELSE 1 END)
                 * ((2000000 * abs(sa) + na) // (2 * na))
                 / 1000000.0 + 0.0 END AS mean_a,
               CASE WHEN nb > 0 THEN
                 (CASE WHEN sb < 0 THEN -1 WHEN sb = 0 THEN 0
                       ELSE 1 END)
                 * ((2000000 * abs(sb) + nb) // (2 * nb))
                 / 1000000.0 + 0.0 END AS mean_b,
               vna AS var_num_a, vnb AS var_num_b,
               CASE WHEN na > 1 AND nb > 1
                     AND (vna > 0 OR vnb > 0) THEN
                 (CASE WHEN (sa::DOUBLE / na::DOUBLE
                             - sb::DOUBLE / nb::DOUBLE) < 0
                       THEN -1 ELSE 1 END)
                 * floor(abs((sa::DOUBLE / na::DOUBLE
                              - sb::DOUBLE / nb::DOUBLE)
                             / sqrt(sea + seb))
                         * 1000000.0 + 0.5) / 1000000.0 + 0.0
               END AS t_stat,
               CASE WHEN na > 1 AND nb > 1
                     AND (vna > 0 OR vnb > 0) THEN
                 floor(((sea + seb) * (sea + seb)
                        / (sea * sea / (na - 1)::DOUBLE
                           + seb * seb / (nb - 1)::DOUBLE))
                       * 1000000.0 + 0.5) / 1000000.0 + 0.0
               END AS df
        FROM v
    """)


def test_preview_cuped_ttest(spark):
    from datafusion_geo_spark.operators.evals import cuped_ttest
    from datafusion_geo_spark.sources.fixtures import load_events
    ev = (load_events(spark, SF)
          .where(F.col("ts").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                  .cast("long").alias("cents"),
                  F.expr("(unix_micros(ts) div 3600000000) % 24")
                  .alias("hr24")))
    r6 = ("(CASE WHEN ({v}) < 0 THEN -1 ELSE 1 END) "
          "* floor(abs({v}) * 1000000.0 + 0.5) / 1000000.0 + 0.0")
    _check(cuped_ttest(ev, "cents", "hr24", "event_type",
                       "purchase", "view"), f"""
        WITH e AS (SELECT event_type AS g,
                          CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                            AS y,
                          (epoch_us(ts) // 3600000000) % 24 AS x
                   FROM events
                   WHERE value IS NOT NULL AND ts IS NOT NULL
                     AND event_type IN ('purchase', 'view')),
        a AS (SELECT
          SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)::BIGINT
            AS na,
          SUM(CASE WHEN g = 'purchase' THEN y ELSE 0 END)::BIGINT
            AS sya,
          SUM(CASE WHEN g = 'purchase' THEN x ELSE 0 END)::BIGINT
            AS sxa,
          SUM(CASE WHEN g = 'purchase' THEN x * y ELSE 0
              END)::BIGINT AS sxya,
          SUM(CASE WHEN g = 'purchase' THEN x * x ELSE 0
              END)::BIGINT AS sxxa,
          SUM(CASE WHEN g = 'purchase' THEN y * y ELSE 0
              END)::BIGINT AS syya,
          SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END)::BIGINT
            AS nb,
          SUM(CASE WHEN g = 'view' THEN y ELSE 0 END)::BIGINT
            AS syb,
          SUM(CASE WHEN g = 'view' THEN x ELSE 0 END)::BIGINT
            AS sxb,
          SUM(CASE WHEN g = 'view' THEN x * y ELSE 0 END)::BIGINT
            AS sxyb,
          SUM(CASE WHEN g = 'view' THEN x * x ELSE 0 END)::BIGINT
            AS sxxb,
          SUM(CASE WHEN g = 'view' THEN y * y ELSE 0 END)::BIGINT
            AS syyb
          FROM e),
        d AS (SELECT *, (na + nb)::DOUBLE AS n,
                     (sya + syb)::DOUBLE AS sy,
                     (sxa + sxb)::DOUBLE AS sx,
                     (sxya + sxyb)::DOUBLE AS sxy,
                     (sxxa + sxxb)::DOUBLE AS sxx,
                     (syya + syyb)::DOUBLE AS syy
              FROM a),
        f AS (SELECT *, n * sxy - sx * sy AS cov_n,
                     n * sxx - sx * sx AS varx_n,
                     n * syy - sy * sy AS vary_n
              FROM d),
        g2 AS (SELECT *, cov_n / varx_n AS theta,
                      sx / n AS xbar
               FROM f),
        j AS (SELECT *,
            (sya::DOUBLE / na::DOUBLE)
              - theta * ((sxa::DOUBLE / na::DOUBLE) - xbar) AS ma,
            (syb::DOUBLE / nb::DOUBLE)
              - theta * ((sxb::DOUBLE / nb::DOUBLE) - xbar) AS mb,
            (na::DOUBLE * syya::DOUBLE - sya::DOUBLE * sya::DOUBLE)
              / (na::DOUBLE * (na::DOUBLE - 1))
              + theta * theta
                * ((na::DOUBLE * sxxa::DOUBLE
                    - sxa::DOUBLE * sxa::DOUBLE)
                   / (na::DOUBLE * (na::DOUBLE - 1)))
              - (2)::DOUBLE * theta
                * ((na::DOUBLE * sxya::DOUBLE
                    - sxa::DOUBLE * sya::DOUBLE)
                   / (na::DOUBLE * (na::DOUBLE - 1))) AS va,
            (nb::DOUBLE * syyb::DOUBLE - syb::DOUBLE * syb::DOUBLE)
              / (nb::DOUBLE * (nb::DOUBLE - 1))
              + theta * theta
                * ((nb::DOUBLE * sxxb::DOUBLE
                    - sxb::DOUBLE * sxb::DOUBLE)
                   / (nb::DOUBLE * (nb::DOUBLE - 1)))
              - (2)::DOUBLE * theta
                * ((nb::DOUBLE * sxyb::DOUBLE
                    - sxb::DOUBLE * syb::DOUBLE)
                   / (nb::DOUBLE * (nb::DOUBLE - 1))) AS vb
            FROM g2),
        k AS (SELECT *,
                     (ma - mb) / sqrt(va / na::DOUBLE
                                      + vb / nb::DOUBLE) AS t,
                     (1)::DOUBLE
                       - (vary_n + theta * theta * varx_n
                          - (2)::DOUBLE * theta * cov_n)
                         / vary_n AS vr
              FROM j)
        SELECT na AS n_a, nb AS n_b,
               {r6.format(v='theta')} AS theta,
               {r6.format(v='ma')} AS mean_adj_a,
               {r6.format(v='mb')} AS mean_adj_b,
               {r6.format(v='t')} AS t_cuped,
               {r6.format(v='vr')} AS var_reduction
        FROM k
    """)


def test_preview_kaplan_meier(spark):
    from datafusion_geo_spark.operators.evals import kaplan_meier
    from datafusion_geo_spark.sources.fixtures import load_events
    ev = (load_events(spark, SF)
          .where(F.col("value").isNotNull()
                 & F.col("event_id").isNotNull())
          .select(((F.col("event_id") % 30) + 1).alias("t"),
                  (F.col("value") > 100).cast("int").alias("e")))
    _check(kaplan_meier(ev, "t", "e"), """
        WITH e AS (SELECT (event_id % 30) + 1 AS t,
                          (value > 100)::INT AS ev
                   FROM events
                   WHERE value IS NOT NULL
                     AND event_id IS NOT NULL),
        h AS (SELECT t,
                SUM(CASE WHEN ev = 1 THEN 1 ELSE 0 END)::BIGINT AS d,
                SUM(CASE WHEN ev = 1 THEN 0 ELSE 1 END)::BIGINT AS c
              FROM e GROUP BY 1),
        tt AS (SELECT SUM(d + c)::BIGINT AS n FROM h),
        r AS (SELECT t, d, c,
                (tt.n - COALESCE(SUM(d + c) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0))::BIGINT AS n_risk
              FROM h, tt),
        l AS (SELECT *, CASE WHEN d = 0 THEN 0
                WHEN d < n_risk THEN
                  (CASE WHEN ln((n_risk - d)::DOUBLE
                               / n_risk::DOUBLE) < 0 THEN -1
                        WHEN ln((n_risk - d)::DOUBLE
                                / n_risk::DOUBLE) = 0 THEN 0
                        ELSE 1 END)
                  * CAST(floor(abs(ln((n_risk - d)::DOUBLE
                                      / n_risk::DOUBLE))
                               * 1000000.0 + 0.5) AS BIGINT)
                END AS lnm
              FROM r),
        f AS (SELECT *,
                SUM(lnm) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS cum,
                SUM(CASE WHEN d > 0 THEN
                      CAST(floor(d::DOUBLE / n_risk::DOUBLE
                                 * 1000000.0 + 0.5) AS BIGINT)
                    ELSE 0 END) OVER (ORDER BY t ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) AS cumh,
                MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                  OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS dead
              FROM l)
        SELECT t, n_risk, d AS d_events, c AS n_censored,
               CASE WHEN dead = 1 THEN (0)::DOUBLE ELSE
                 floor(abs(exp(cum::DOUBLE / 1000000.0))
                       * 1000000.0 + 0.5) / 1000000.0 + 0.0
               END AS survival,
               cumh::DOUBLE / 1000000.0 + 0.0 AS cum_hazard
        FROM f
    """)


def test_preview_logrank(spark):
    from datafusion_geo_spark.operators.evals import logrank_test
    from datafusion_geo_spark.sources.fixtures import load_events
    ev = (load_events(spark, SF)
          .where(F.col("value").isNotNull()
                 & F.col("event_id").isNotNull())
          .select("event_type",
                  ((F.col("event_id") % 30) + 1).alias("t"),
                  (F.col("value") > 100).cast("int").alias("e")))
    oe = ("(da * (ra + rb) - (da + db) * ra)::DOUBLE "
          "/ (ra + rb)::DOUBLE")
    _check(logrank_test(ev, "t", "e", "event_type", "purchase",
                        "view"), f"""
        WITH e AS (SELECT event_type AS g,
                          (event_id % 30) + 1 AS t,
                          (value > 100)::INT AS ev
                   FROM events
                   WHERE value IS NOT NULL AND event_id IS NOT NULL
                     AND event_type IN ('purchase', 'view')),
        h AS (SELECT t,
                SUM(CASE WHEN g = 'purchase' AND ev = 1 THEN 1
                    ELSE 0 END)::BIGINT AS da,
                SUM(CASE WHEN g = 'purchase' AND ev = 0 THEN 1
                    ELSE 0 END)::BIGINT AS ca,
                SUM(CASE WHEN g = 'view' AND ev = 1 THEN 1
                    ELSE 0 END)::BIGINT AS db,
                SUM(CASE WHEN g = 'view' AND ev = 0 THEN 1
                    ELSE 0 END)::BIGINT AS cb
              FROM e GROUP BY 1),
        tt AS (SELECT SUM(da + ca)::BIGINT AS na,
                      SUM(db + cb)::BIGINT AS nb FROM h),
        r AS (SELECT h.*, tt.na, tt.nb,
                (tt.na - COALESCE(SUM(da + ca) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0))::BIGINT AS ra,
                (tt.nb - COALESCE(SUM(db + cb) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0))::BIGINT AS rb
              FROM h, tt),
        m AS (SELECT na, nb, da, db,
                (CASE WHEN ({oe}) < 0 THEN -1
                      WHEN ({oe}) = 0 THEN 0 ELSE 1 END)
                * CAST(floor(abs({oe}) * 1000000.0 + 0.5)
                       AS BIGINT) AS oem,
                CASE WHEN ra + rb > 1 THEN
                  CAST(floor(abs((da + db)::DOUBLE
                    * (ra::DOUBLE / (ra + rb)::DOUBLE)
                    * (rb::DOUBLE / (ra + rb)::DOUBLE)
                    * (((ra + rb) - (da + db))::DOUBLE
                       / ((ra + rb) - 1)::DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT)
                ELSE 0 END AS vm
              FROM r),
        a2 AS (SELECT MIN(na)::BIGINT AS n_a,
                      MIN(nb)::BIGINT AS n_b,
                      SUM(da)::BIGINT AS d_a,
                      SUM(db)::BIGINT AS d_b,
                      SUM(oem)::BIGINT AS oe_micro,
                      SUM(vm)::BIGINT AS v_micro
               FROM m)
        SELECT n_a, n_b, d_a, d_b, oe_micro, v_micro,
               CASE WHEN v_micro > 0 THEN
                 floor(abs((oe_micro::DOUBLE / 1000000.0)
                           * (oe_micro::DOUBLE / 1000000.0)
                           / (v_micro::DOUBLE / 1000000.0))
                       * 1000000.0 + 0.5) / 1000000.0 + 0.0
               END AS chi2
        FROM a2
    """)


def test_preview_wilson_ci(spark):
    from datafusion_geo_spark.operators.evals import wilson_ci
    from datafusion_geo_spark.sources.fixtures import load_events
    ev = (load_events(spark, SF)
          .select("event_type",
                  (F.col("value") > 100).cast("int").alias("f")))
    r6 = ("(CASE WHEN ({v}) < 0 THEN -1 ELSE 1 END) "
          "* floor(abs({v}) * 1000000.0 + 0.5) / 1000000.0 + 0.0")
    _check(wilson_ci(ev, "f", ("event_type",)), f"""
        WITH e AS (SELECT event_type, (value > 100)::INT AS f
                   FROM events WHERE value IS NOT NULL),
        a AS (SELECT event_type, COUNT(*)::BIGINT AS n,
                     COALESCE(SUM(f), 0)::BIGINT AS k
              FROM e GROUP BY 1),
        b AS (SELECT event_type, n, k,
                     (196)::DOUBLE / (100)::DOUBLE AS z,
                     k::DOUBLE / n::DOUBLE AS p
              FROM a),
        c AS (SELECT *,
                     (1)::DOUBLE + z * z / n::DOUBLE AS denom
              FROM b),
        d AS (SELECT *,
                (p + z * z / ((2)::DOUBLE * n::DOUBLE)) / denom
                  AS center,
                z * sqrt(p * ((1)::DOUBLE - p) / n::DOUBLE
                         + z * z / ((4)::DOUBLE * n::DOUBLE
                                    * n::DOUBLE)) / denom AS half
              FROM c)
        SELECT event_type, n, k,
               {r6.format(v='p')} AS p,
               {r6.format(v='center - half')} AS ci_lo,
               {r6.format(v='center + half')} AS ci_hi
        FROM d
    """)


def test_preview_ohlc_bars(spark):
    from datafusion_geo_spark.operators.timeseries import ohlc_bars
    from datafusion_geo_spark.sources.fixtures import load_events
    ev = (load_events(spark, SF)
          .select("user_id", "event_id", "ts",
                  F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                  .cast("long").alias("cents")))
    _check(ohlc_bars(ev, step_minutes=60, value_col="cents"), """
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                          epoch_us(ts) // 3600000000 AS slot,
                          CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                            AS y
                   FROM events
                   WHERE ts IS NOT NULL AND value IS NOT NULL),
        r AS (SELECT *,
                ROW_NUMBER() OVER (PARTITION BY user_id, slot
                                   ORDER BY us, event_id) AS rn_a,
                ROW_NUMBER() OVER (PARTITION BY user_id, slot
                                   ORDER BY us DESC, event_id DESC)
                  AS rn_d
              FROM e),
        g AS (SELECT user_id, slot,
                MAX(CASE WHEN rn_a = 1 THEN y END)::BIGINT AS open,
                MAX(y)::BIGINT AS high, MIN(y)::BIGINT AS low,
                MAX(CASE WHEN rn_d = 1 THEN y END)::BIGINT
                  AS close,
                COUNT(*)::BIGINT AS n_obs, SUM(y)::BIGINT AS sum_y
              FROM r GROUP BY 1, 2)
        SELECT user_id, make_timestamp(slot * 3600000000)
                 AS slot_ts,
               open, high, low, close, n_obs, sum_y
        FROM g
    """)


def test_preview_mcnemar(spark):
    from datafusion_geo_spark.operators.evals import mcnemar_test
    from datafusion_geo_spark.sources.fixtures import load_events
    # two cheap "models" of the label value>100: A = event_type-based,
    # B = user-parity-based — deterministic fixture columns
    ev = (load_events(spark, SF)
          .where(F.col("value").isNotNull())
          .select((F.col("value") > 100).cast("int").alias("y"),
                  F.col("event_type").isin("purchase", "signup")
                  .cast("int").alias("pa"),
                  (F.col("user_id") % 2 == 0).cast("int").alias("pb")))
    _check(mcnemar_test(ev, "y", "pa", "pb"), """
        WITH e AS (SELECT (value > 100)::INT AS y,
                          (event_type IN ('purchase', 'signup'))::INT
                            AS pa,
                          (user_id % 2 = 0)::INT AS pb
                   FROM events WHERE value IS NOT NULL),
        a AS (SELECT COUNT(*)::BIGINT AS n,
                     SUM((pa = y)::INT)::BIGINT AS n_correct_a,
                     SUM((pb = y)::INT)::BIGINT AS n_correct_b,
                     SUM((pa = y AND pb != y)::INT)::BIGINT
                       AS b_discordant,
                     SUM((pa != y AND pb = y)::INT)::BIGINT
                       AS c_discordant
              FROM e)
        SELECT n, n_correct_a, n_correct_b, b_discordant,
               c_discordant,
               (CASE WHEN abs(b_discordant - c_discordant) - 1 > 0
                     THEN (abs(b_discordant - c_discordant) - 1)
                          * (abs(b_discordant - c_discordant) - 1)
                     ELSE 0 END)::BIGINT AS chi2_num,
               (b_discordant + c_discordant)::BIGINT AS chi2_den,
               CASE WHEN b_discordant + c_discordant > 0 THEN
                 ((2000000 * (CASE WHEN abs(b_discordant
                                            - c_discordant) - 1 > 0
                     THEN (abs(b_discordant - c_discordant) - 1)
                          * (abs(b_discordant - c_discordant) - 1)
                     ELSE 0 END)
                   + (b_discordant + c_discordant))
                  // (2 * (b_discordant + c_discordant)))
                 / 1000000.0
               END AS chi2
        FROM a
    """)


def test_preview_triangle_count(spark):
    from datafusion_geo_spark.operators.graph import triangle_count
    from datafusion_geo_spark.sources.fixtures import load_table
    # deterministic modular graph over customers: u -> (3u+1) mod V,
    # u -> (7u+2) mod V
    cust = load_table(spark, SF, "customer")
    edges = (cust.select(F.col("c_custkey").alias("id_a"),
                         ((F.col("c_custkey") * 3 + 1) % 150)
                         .alias("id_b"))
             .unionByName(
                 cust.select(F.col("c_custkey").alias("id_a"),
                             ((F.col("c_custkey") * 7 + 2) % 150)
                             .alias("id_b"))))
    _check(triangle_count(edges), """
        WITH raw AS (
          SELECT c_custkey AS a, (c_custkey * 3 + 1) % 150 AS b
          FROM customer
          UNION ALL
          SELECT c_custkey AS a, (c_custkey * 7 + 2) % 150 AS b
          FROM customer
        ),
        e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
              FROM raw WHERE a != b),
        tri AS (
          SELECT COUNT(*)::BIGINT AS n_triangles
          FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
          JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
        ),
        deg AS (SELECT x, COUNT(*)::BIGINT AS d FROM (
                  SELECT u AS x FROM e UNION ALL SELECT v FROM e)
                GROUP BY 1),
        ek AS (SELECT e.u, e.v, du.d AS du, dv.d AS dv
               FROM e JOIN deg du ON du.x = e.u
               JOIN deg dv ON dv.x = e.v),
        orient AS (SELECT CASE WHEN (du, u) < (dv, v) THEN u ELSE v
                          END AS src,
                          CASE WHEN (du, u) < (dv, v) THEN (dv, v)
                               ELSE (du, u) END AS dk
                   FROM ek),
        wedg AS (SELECT COUNT(*)::BIGINT AS n_wedges
                 FROM orient a JOIN orient b
                   ON b.src = a.src AND a.dk < b.dk)
        SELECT (SELECT COUNT(*)::BIGINT FROM deg) AS n_vertices,
               (SELECT COUNT(*)::BIGINT FROM e) AS n_edges,
               wedg.n_wedges, tri.n_triangles
        FROM wedg, tri
    """)


def test_preview_kcore_peel(spark):
    from datafusion_geo_spark.operators.graph import kcore_peel
    from datafusion_geo_spark.sources.fixtures import load_table
    cust = load_table(spark, SF, "customer")
    edges = (cust.select(F.col("c_custkey").alias("id_a"),
                         ((F.col("c_custkey") * 3 + 1) % 150)
                         .alias("id_b"))
             .unionByName(
                 cust.select(F.col("c_custkey").alias("id_a"),
                             ((F.col("c_custkey") * 7 + 2) % 150)
                             .alias("id_b"))))
    peel = """
        SELECT u, v FROM e{i} WHERE
          u IN (SELECT x FROM (SELECT u AS x FROM e{i}
                               UNION ALL SELECT v FROM e{i})
                GROUP BY x HAVING COUNT(*) >= 3)
          AND
          v IN (SELECT x FROM (SELECT u AS x FROM e{i}
                               UNION ALL SELECT v FROM e{i})
                GROUP BY x HAVING COUNT(*) >= 3)
    """
    _check(kcore_peel(edges, k=3, rounds=2), f"""
        WITH raw AS (
          SELECT c_custkey AS a, (c_custkey * 3 + 1) % 150 AS b
          FROM customer
          UNION ALL
          SELECT c_custkey, (c_custkey * 7 + 2) % 150
          FROM customer
        ),
        e0 AS (SELECT DISTINCT least(a, b) AS u,
                               greatest(a, b) AS v
               FROM raw WHERE a != b),
        e1 AS ({peel.format(i=0)}),
        e2 AS ({peel.format(i=1)})
        SELECT x AS id, COUNT(*)::BIGINT AS deg
        FROM (SELECT u AS x FROM e2 UNION ALL SELECT v FROM e2)
        GROUP BY 1
    """)


def test_preview_fs_linkage(spark):
    from datafusion_geo_spark.operators.linkage import (
        fs_score_histogram)
    from datafusion_geo_spark.sources.fixtures import load_table
    cust = (load_table(spark, SF, "customer")
            .select("c_custkey", "c_nationkey", "c_mktsegment",
                    F.floor(F.col("c_acctbal") / F.lit(1000.0))
                    .cast("long").alias("bal_k"),
                    (F.col("c_custkey") % 10).alias("dig")))
    fields = ["c_mktsegment", "bal_k", "dig"]
    got = fs_score_histogram(cust, "c_nationkey", fields,
                             "c_custkey")
    # oracle: replay u estimation + the SAME driver-side micro weights
    # (python floats are IEEE doubles — compute literals here exactly
    # as linkage.fs_field_weights does)
    from datafusion_geo_spark.operators.linkage import fs_field_weights
    w = {r["field"]: (r["w_agree_micro"], r["w_dis_micro"])
         for r in fs_field_weights(cust, fields).collect()}
    terms = " + ".join(
        f"(CASE WHEN a.{f} IS NOT DISTINCT FROM b.{f} "
        f"AND a.{f} IS NOT NULL THEN {w[f][0]} "
        f"ELSE {w[f][1]} END)"
        for f in fields)
    _check(got, f"""
        WITH c AS (SELECT c_custkey, c_nationkey, c_mktsegment,
                          CAST(floor(c_acctbal / 1000.0) AS BIGINT)
                            AS bal_k,
                          c_custkey % 10 AS dig
                   FROM customer)
        SELECT ({terms})::BIGINT AS score_micro,
               COUNT(*)::BIGINT AS n_pairs
        FROM c a JOIN c b ON a.c_nationkey = b.c_nationkey
                         AND a.c_custkey < b.c_custkey
        GROUP BY 1
    """)


def test_preview_expectations(spark):
    from datafusion_geo_spark.operators.profile import (
        expectations_check)
    from datafusion_geo_spark.sources.fixtures import load_table
    li = load_table(spark, SF, "lineitem")
    rules = [
        ("qty_range", (F.col("l_quantity") >= 1)
         & (F.col("l_quantity") <= 50)),
        ("price_pos", F.col("l_extendedprice") > 0),
        ("flag_domain", F.col("l_returnflag").isin("A", "N", "R")),
        ("ship_after_2023",
         F.col("l_shipdate") >= F.lit("2024-01-01").cast("date")),
    ]
    got = expectations_check(li, rules)
    _check(got, """
        WITH a AS (SELECT COUNT(*)::BIGINT AS n,
          SUM(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
                   THEN 0 ELSE 1 END)::BIGINT AS v0,
          SUM(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END)
            ::BIGINT AS v1,
          SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R')
                   THEN 0 ELSE 1 END)::BIGINT AS v2,
          SUM(CASE WHEN l_shipdate >= DATE '2024-01-01'
                   THEN 0 ELSE 1 END)::BIGINT AS v3
          FROM lineitem)
        SELECT r.rule, a.n AS n_rows, r.v AS n_violations,
               CASE WHEN a.n > 0 THEN
                 ((2000000 * (a.n - r.v) + a.n) // (2 * a.n))
                 / 1000000.0 END AS pass_rate,
               (r.v = 0) AS passed
        FROM a, (
          SELECT 'qty_range' AS rule, v0 AS v FROM a
          UNION ALL SELECT 'price_pos', v1 FROM a
          UNION ALL SELECT 'flag_domain', v2 FROM a
          UNION ALL SELECT 'ship_after_2023', v3 FROM a) r
    """)


def test_preview_plans_scale_clean(spark):
    """The deferred operators' physical plans carry no scale smell
    beyond triangle_count's three vouched one-row summary crosses
    (the hll_setops pattern) — pinned now so a regression surfaces
    before r12 wires them into the audited gate."""
    from datafusion_geo_spark.operators.evals import mcnemar_test
    from datafusion_geo_spark.operators.graph import triangle_count
    from datafusion_geo_spark.operators.linkage import (
        fs_score_histogram)
    from datafusion_geo_spark.operators.profile import (
        expectations_check)
    from datafusion_geo_spark.operators.timeseries import trend_by_key
    from datafusion_geo_spark.plans.audit import assert_scalable
    from datafusion_geo_spark.sources.fixtures import (load_events,
                                                       load_table)
    ev = (load_events(spark, SF).where(F.col("value").isNotNull())
          .select("user_id", "event_type", "event_id",
                  (F.col("value") > 100).cast("int").alias("y"),
                  F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                  .cast("long").alias("cents")))
    cust = load_table(spark, SF, "customer")
    assert_scalable(trend_by_key(
        ev.withColumn("hr", F.col("event_id") % 24),
        "user_id", "hr", "cents"))
    assert_scalable(mcnemar_test(
        ev.withColumn("pa", (F.col("event_id") % 2).cast("int"))
          .withColumn("pb", (F.col("user_id") % 2).cast("int")),
        "y", "pa", "pb"))
    assert_scalable(expectations_check(
        cust, [("bal", F.col("c_acctbal") > -1000)]))
    assert_scalable(fs_score_histogram(
        cust.withColumn("dig", F.col("c_custkey") % 10),
        "c_nationkey", ["c_mktsegment", "dig"], "c_custkey"))
    assert_scalable(triangle_count(
        cust.select(F.col("c_custkey").alias("id_a"),
                    ((F.col("c_custkey") * 3 + 1) % 150)
                    .alias("id_b"))),
        allow_broadcast_cross=3)
    from datafusion_geo_spark.operators.timeseries import (
        cusum_changepoint, seasonal_profile)
    assert_scalable(cusum_changepoint(
        ev.withColumn("hr", F.col("event_id") % 24),
        "user_id", "hr", "cents"))
    assert_scalable(seasonal_profile(
        load_events(spark, SF), "ts", "value", period=24),
        allow_broadcast_cross=1)
    from datafusion_geo_spark.operators.profile import (
        chi2_independence_stat)
    assert_scalable(chi2_independence_stat(
        cust, "c_mktsegment", "c_nationkey"),
        allow_broadcast_cross=2)
    from datafusion_geo_spark.operators.linkage import (
        phonetic_blocks)
    assert_scalable(phonetic_blocks(
        load_table(spark, SF, "part"), "p_name", "p_partkey"))
    from datafusion_geo_spark.operators.evals import spearman_corr
    assert_scalable(spearman_corr(
        ev.withColumn("hr", F.col("event_id") % 24),
        "cents", "hr"), allow_broadcast_cross=1)
    from datafusion_geo_spark.operators.mlfit import stump_fit
    assert_scalable(stump_fit(
        ev.withColumn("hr", F.col("event_id") % 24)
          .withColumn("udig", F.col("user_id") % 10),
        ["hr", "udig"], "cents"))
    from datafusion_geo_spark.operators.evals import ttest_welch
    assert_scalable(ttest_welch(
        ev, "cents", "event_type", "purchase", "view"))
    from datafusion_geo_spark.operators.evals import cuped_ttest
    assert_scalable(cuped_ttest(
        ev.withColumn("hr24", F.col("event_id") % 24),
        "cents", "hr24", "event_type", "purchase", "view"))
    from datafusion_geo_spark.operators.evals import kaplan_meier
    assert_scalable(kaplan_meier(
        ev.withColumn("t", (F.col("event_id") % 30) + 1)
          .withColumn("e", (F.col("cents") > 10000).cast("int")),
        "t", "e"), allow_broadcast_cross=1)
    from datafusion_geo_spark.operators.evals import logrank_test
    assert_scalable(logrank_test(
        ev.withColumn("t", (F.col("event_id") % 30) + 1)
          .withColumn("e", (F.col("cents") > 10000).cast("int")),
        "t", "e", "event_type", "purchase", "view"),
        allow_broadcast_cross=1)
    from datafusion_geo_spark.operators.evals import wilson_ci
    assert_scalable(wilson_ci(
        ev.withColumn("f", (F.col("cents") > 10000).cast("int")),
        "f", ("event_type",)))
    from datafusion_geo_spark.operators.timeseries import ohlc_bars
    assert_scalable(ohlc_bars(
        load_events(spark, SF)
        .withColumn("cents", F.floor(F.col("value") * F.lit(100.0)
                                     + F.lit(0.5)).cast("long")),
        step_minutes=60, value_col="cents"))


def test_preview_bootstrap_ci(spark):
    from datafusion_geo_spark.operators.evals import (
        POISSON1_CDF_MICRO, bootstrap_mean_ci)
    from datafusion_geo_spark.sources.fixtures import load_events
    ev = (load_events(spark, SF).where(F.col("value").isNotNull())
          .select("event_id",
                  F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                  .cast("long").alias("cents")))
    got = bootstrap_mean_ci(ev, "cents", "event_id", n_boot=40)
    wexpr = "CASE " + " ".join(
        f"WHEN u < {c} THEN {k}"
        for k, c in enumerate(POISSON1_CDF_MICRO)) + " ELSE 9 END"
    reps = " UNION ALL ".join(f"""
        SELECT {b} AS b, SUM(w * cents)::BIGINT AS bx,
               SUM(w)::BIGINT AS bn
        FROM (SELECT cents, ({wexpr})::BIGINT AS w FROM (
          SELECT cents,
                 (('0x' || substr(md5('boot0|{b}|' ||
                    event_id::VARCHAR), 1, 8))::BIGINT % 1000000) AS u
          FROM e))""" for b in range(40))
    _check(got, f"""
        WITH e AS MATERIALIZED (
          SELECT event_id,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events WHERE value IS NOT NULL),
        reps AS ({reps}),
        m AS (SELECT b,
                     ((2000000 * bx + bn) // (2 * bn))::BIGINT AS mm
              FROM reps WHERE bn > 0),
        r AS (SELECT mm,
                     ROW_NUMBER() OVER (ORDER BY mm) AS rk,
                     COUNT(*) OVER () AS nb
              FROM m),
        t AS (SELECT COUNT(*)::BIGINT AS n_rows,
                     SUM(cents)::BIGINT AS sx FROM e)
        SELECT t.n_rows,
               CASE WHEN t.n_rows > 0 THEN
                 ((2000000 * t.sx + t.n_rows) // (2 * t.n_rows))
                 / 1000000.0 END AS mean,
               (SELECT MIN(CASE WHEN 100 * rk >= 5 * nb THEN mm END)
                FROM r) / 1000000.0 AS ci_lo,
               (SELECT MIN(CASE WHEN 100 * rk >= 95 * nb THEN mm END)
                FROM r) / 1000000.0 AS ci_hi
        FROM t
    """)
