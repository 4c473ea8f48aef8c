"""Unit tests for the Python DataSource (sources/pyds.py) and the
Python UDTF chunker (operators/udtfs.py): partition planning, NULL
geometry, overwrite semantics, degenerate chunker input."""

import json
import os

import pyspark.sql.functions as F

from datafusion_geo_spark.operators.udtfs import ChunkUDTF
from datafusion_geo_spark.sources.pyds import GeoJsonLinesDataSource

_BASE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "pyds_tests")


def _write_lines(path, lines):
    os.makedirs(path, exist_ok=True)
    for i, chunk in enumerate(lines):
        with open(os.path.join(path, f"part-{i:04d}.jsonl"), "w") as fh:
            fh.write("\n".join(chunk) + "\n")


def test_pyds_reads_multiple_partitions_and_null_geom(spark):
    path = os.path.join(_BASE, "read")
    feat = ('{"type":"Feature","geometry":{"type":"Point",'
            '"coordinates":[%d,%d]},"properties":{"k":%d}}')
    _write_lines(path, [
        [feat % (1, 2, 1), feat % (3, 4, 2)],
        ['{"type":"Feature","geometry":null,"properties":{"k":3}}'],
    ])
    spark.dataSource.register(GeoJsonLinesDataSource)
    df = (spark.read.format("geojsonl_py")
          .option("path", path).option("properties_schema", "k long")
          .load())
    # two part files -> two input partitions
    assert df.rdd.getNumPartitions() == 2
    rows = {r.k: r.geom for r in df.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3] is None and rows[1] is not None


def test_pyds_writer_overwrite_and_jvm_readback(spark):
    from datafusion_geo_spark.functions import st_astext, st_geomfromtext
    from datafusion_geo_spark.sources.geoio import read_geojsonl
    path = os.path.join(_BASE, "write")
    spark.dataSource.register(GeoJsonLinesDataSource)
    df = spark.createDataFrame([(1, "POINT(1 2)"), (2, None)],
                               "k long, wkt string")
    src = df.select("k", st_geomfromtext(F.col("wkt")).alias("geom"))
    for _ in range(2):  # second write must OVERWRITE, not append
        (src.write.format("geojsonl_py").mode("overwrite")
            .option("path", path).save())
    back = read_geojsonl(spark, path, properties_schema="k long")
    got = {r.k: r.w for r in
           back.select("k", st_astext(F.col("geom")).alias("w")).collect()}
    assert got == {1: "POINT(1 2)", 2: None}
    # every written line is a parseable Feature
    import glob
    lines = []
    for f in glob.glob(os.path.join(path, "part-*")):
        lines += [json.loads(x) for x in open(f) if x.strip()]
    assert len(lines) == 2
    assert all(x["type"] == "Feature" for x in lines)


def test_chunk_udtf_degenerate_and_tail(spark):
    spark.udtf.register("chunk_udtf_t", ChunkUDTF)
    spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(70))),  # 70 words: 2 chunks
         (2, "solo")],
        "doc_id long, text string").createOrReplaceTempView("_cu_src")
    rows = spark.sql("""
        SELECT d.doc_id, c.chunk_idx, c.n_tokens
        FROM _cu_src d, LATERAL chunk_udtf_t(d.text) c
    """).collect()
    got = sorted((r.doc_id, r.chunk_idx, r.n_tokens) for r in rows)
    # doc 1: ceil((70-16)/48)=2 chunks -> [0..64), [48..70) = 22 tokens
    assert got == [(1, 0, 64), (1, 1, 22), (2, 0, 1)]
