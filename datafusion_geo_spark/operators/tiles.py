"""Vector-tile pyramid generation.

Composes the reference's ST_AsMVTGeom (#18,
/root/reference/src/function/as_mvt_geom.rs:86-95 — affine into the
4096-grid with flipped Y, no clipping) with XYZ tile addressing: every
geometry is replicated into the tiles its bbox covers and transformed
into each tile's local MVT coordinate grid — the per-tile feature list a
tile server encodes into protobuf.

Scale design (100 TB): the whole pipeline is MAP-SIDE — one bbox pass,
a bounded explode (bbox-span/tile_size + 1 per axis, same fan-out bound
as grid_join), and one pandas-UDF affine per (feature, tile). No shuffle
at all; a downstream ``.repartition(tx, ty)`` or partitioned write
groups features per tile only when the sink needs it. Tiling is
embarrassingly parallel, and Spark's scan parallelism IS the tiler.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions import st_asmvtgeom
from .spatial_join import ensure_bbox


def make_tiles(df: DataFrame, zoom: int,
               world: Tuple[float, float, float] = (0.0, 0.0, 1024.0),
               geom_col: str = "geom") -> DataFrame:
    """Explode each geometry into its covering XYZ tiles at ``zoom`` and
    attach the tile-local MVT geometry.

    ``world`` is (x0, y0, size): the square world bounds the pyramid
    subdivides — (-20037508.342789244, -20037508.342789244,
    40075016.685578488) for web mercator; the default unit world suits
    planar fixtures. XYZ convention: ty counts DOWN from the world's top
    edge (y0 + size), matching slippy-map tiles.

    Output: the input columns + (zoom, tx, ty, mvt_geom). Geometries
    with a null bbox produce no tiles. Like the reference's kernel, the
    MVT transform does NOT clip — a feature overlapping a tile edge
    keeps coordinates outside [0, 4096) in neighbouring tiles.
    """
    if zoom < 0 or zoom > 30:
        raise ValueError(f"make_tiles: zoom {zoom} out of [0, 30]")
    x0, y0, size = (float(v) for v in world)
    n = 1 << zoom
    ts = size / n
    top = y0 + size
    d = ensure_bbox(df, geom_col)

    def clamp(c):
        # clamp BOTH bounds into [0, n-1]: Spark's sequence(start, stop)
        # DESCENDS when start > stop (it does not produce an empty
        # array), so a one-sided clamp at the world edge would fabricate
        # a reversed tile range
        return F.greatest(F.least(c, F.lit(n - 1)), F.lit(0))

    txs = F.sequence(clamp(F.floor((F.col("xmin") - x0) / ts)),
                     clamp(F.floor((F.col("xmax") - x0) / ts)))
    # XYZ: ty grows downward from the top edge; a bbox's TOP (ymax) is
    # its smallest ty
    tys = F.sequence(clamp(F.floor((top - F.col("ymax")) / ts)),
                     clamp(F.floor((top - F.col("ymin")) / ts)))
    cells = F.flatten(F.transform(
        txs, lambda tx: F.transform(tys, lambda ty: F.struct(
            tx.cast("int").alias("tx"), ty.cast("int").alias("ty")))))
    # Spark's greatest/least IGNORE null operands (unlike SQL standard
    # GREATEST), so a null bbox would clamp to the full [0, n-1] range
    # and fan a null geometry into every tile — gate explicitly; the
    # same gate drops bboxes entirely outside the world (the clamp
    # would otherwise pin them to an edge tile they don't touch)
    cells = F.when(F.col("xmin").isNotNull() & F.col("ymin").isNotNull()
                   & F.col("xmax").isNotNull() & F.col("ymax").isNotNull()
                   & (F.col("xmax") >= x0) & (F.col("xmin") <= x0 + size)
                   & (F.col("ymax") >= y0) & (F.col("ymin") <= top),
                   cells)
    e = (d.withColumn("_t", F.explode(cells))
         .select(*df.columns,
                 F.lit(int(zoom)).alias("zoom"),
                 F.col("_t.tx").alias("tx"), F.col("_t.ty").alias("ty")))
    tile_xmin = x0 + F.col("tx") * ts
    tile_ymax = top - F.col("ty") * ts
    return e.withColumn(
        "mvt_geom",
        st_asmvtgeom(F.col(geom_col), tile_xmin, tile_ymax - ts,
                     tile_xmin + ts, tile_ymax))
