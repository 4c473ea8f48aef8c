#!/usr/bin/env python
"""Dump .explain("formatted") for the named queries (default: the 8
bench kernels) into plans/r11/<query>_<tag>.txt.

    python tools/explain_dump.py [--tag before|after] [names...]
"""
from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BENCH8 = ["intersects_scan", "intersects_lines", "extent_by_mktsegment",
          "cosine_topk", "wkt_roundtrip_points", "spatial_join",
          "minhash_pairs", "grid_spatial_join"]


def main():
    args = sys.argv[1:]
    tag = "before"
    if args and args[0] == "--tag":
        tag = args[1]
        args = args[2:]
    names = args or BENCH8

    from tools.sweep import build_spark
    import __spark_entry__ as entrymod
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()

    outdir = os.path.join(HERE, "plans", os.environ.get("PLANS_DIR", "r12"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qmap[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
