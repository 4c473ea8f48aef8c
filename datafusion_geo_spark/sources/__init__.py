"""Sources: parquet loaders + deterministic geometry fixture derivations
(FIXTURES.md §2). The reference only ever uses in-memory tables
(/root/reference/benches/util.rs:45-68); here the equivalent surface is
``spark.read.parquet`` over the driver's TPC-H-ish tables."""

from .fixtures import (TABLES, load_table, load_tables, points_lineitem,
                       points_customer, lines_orders, boxes_nation)

__all__ = ["TABLES", "load_table", "load_tables", "points_lineitem",
           "points_customer", "lines_orders", "boxes_nation"]
