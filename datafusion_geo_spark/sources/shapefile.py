"""ESRI Shapefile source & sink — the classic geo interchange format.

Layout follows the public ESRI Shapefile Technical Description (July
1998 whitepaper) and the dBASE III header layout: a dataset is a trio
``.shp`` (geometry records), ``.shx`` (fixed-width record index),
``.dbf`` (attributes). The reference engine reads only in-memory
arrays; this sink/source exists for the interchange surface the
PostGIS-shaped API implies (the shp2pgsql workflow), re-expressed for
Spark's part-file model:

- **Sink**: one ``part-NNNNN`` trio per partition (the parquet part
  model — a "shapefile dataset" directory instead of one giant file,
  which the format cannot shard). Deterministic file names from the
  partition id plus write-to-tmp + atomic rename (the
  write_geoparquet_std commit protocol): a retried task overwrites its
  predecessor instead of duplicating rows; ``.shp`` is renamed LAST,
  so a trio is complete the moment its ``.shp`` appears (readers glob
  ``*.shp``). Speculative execution must be off for this sink.
- **Source**: driver reads only the tiny ``.dbf`` headers and ``.shx``
  sizes, then builds (file, record-range) SPLITS — so one huge
  third-party ``.shp`` still fans out across the cluster (the ``.shx``
  index is what makes the format splittable); executors parse their
  byte ranges into WKB + typed attribute columns.

Geometry mapping (XY only, matching the engine's 2-D model):

====================  =======================================
shapefile shape       engine geometry (WKB column)
====================  =======================================
Null (0)              NULL
Point (1)             Point
PolyLine (3)          LineString (1 part) / MultiLineString
Polygon (5)           Polygon / MultiPolygon — on write shells
                      are emitted CW and holes CCW immediately
                      after their shell (the spec's convention);
                      on read a CW ring opens a new polygon and
                      a CCW ring is a hole of the CURRENT one
                      (first ring of nonconforming writers is
                      treated as a shell regardless)
MultiPoint (8)        MultiPoint
====================  =======================================

Attribute mapping: long/int → ``N`` 18,0; double/float → ``N`` 24,6
(dBASE numerics are decimal TEXT — doubles round-trip at exactly 6
decimals, the sink's documented precision contract); string → ``C``
with a fixed declared width (UTF-8 bytes, truncated). A shapefile has
no SRID column; the format's ``.prj`` sidecar is not emitted, so
geometries read back with SRID 0 (use st_setsrid downstream).

One shape CLASS per file is the format's own constraint: a partition
holding a mix of point-like / line-like / area-like geometries is an
error at write time (NULL geometries are fine anywhere — they become
Null shape records and read back as NULL).
"""

from __future__ import annotations

import os
import struct
from typing import List, Optional, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..geo.geom import Geometry, ring_area2
from ..geo.wkb import from_wkb, to_wkb

#: shapefile shape-type codes for each engine geometry type
_SHAPE_OF = {
    "Point": 1,
    "LineString": 3, "MultiLineString": 3,
    "Polygon": 5, "MultiPolygon": 5,
    "MultiPoint": 8,
}
_CLASS_OF = {1: "point", 3: "line", 5: "area", 8: "multipoint"}

_DBF_LONG = ("N", 18, 0)
_DBF_DOUBLE = ("N", 24, 6)


# ------------------------------------------------------------------ dbf

def _dbf_fields(schema, geom_col: str,
                char_width: int) -> List[Tuple[str, str, int, int]]:
    """(name, type, width, decimals) per attribute column, in schema
    order. dBASE names are at most 10 bytes — longer column names are
    rejected rather than silently truncated into collisions."""
    out = []
    for f in schema.fields:
        if f.name == geom_col:
            continue
        if len(f.name.encode("ascii", "strict")) > 10:
            raise ValueError(
                f"write_shapefile: column name '{f.name}' exceeds the "
                "dBASE 10-byte limit — rename or drop it")
        t = f.dataType.simpleString()
        if t in ("bigint", "int", "smallint", "tinyint"):
            out.append((f.name, *_DBF_LONG))
        elif t in ("double", "float"):
            out.append((f.name, *_DBF_DOUBLE))
        elif t == "string":
            out.append((f.name, "C", int(char_width), 0))
        else:
            raise ValueError(
                f"write_shapefile: unsupported attribute type {t} for "
                f"column '{f.name}' (long/double/string only — cast "
                "or drop)")
    return out


def _dbf_header(fields, nrec: int) -> bytes:
    rec_size = 1 + sum(w for _, _, w, _ in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    head = struct.pack("<B3BIHH20x", 0x03, 126, 1, 1, nrec,
                       hdr_size, rec_size)
    descs = []
    for name, typ, width, dec in fields:
        descs.append(struct.pack(
            "<11sc4xBB14x", name.encode("ascii"), typ.encode("ascii"),
            width, dec))
    return head + b"".join(descs) + b"\x0d"


def _dbf_cell(value, typ: str, width: int, dec: int) -> bytes:
    if typ == "N":
        if value is None:
            s = b""
        elif dec == 0:
            s = b"%d" % int(value)
        else:
            s = (f"%.{dec}f" % float(value)).encode("ascii")
        if len(s) > width:
            raise ValueError(
                f"write_shapefile: numeric {value!r} does not fit the "
                f"N({width},{dec}) dBASE field")
        return s.rjust(width)
    raw = b"" if value is None else str(value).encode("utf-8")
    return raw[:width].ljust(width)


def _dbf_parse_header(buf: bytes):
    """(n_records, header_size, record_size, fields) from a dBASE
    header prefix. Field descriptors run until the 0x0D terminator."""
    nrec, hdr, rec = struct.unpack_from("<IHH", buf, 4)
    fields = []
    off = 32
    while off < hdr - 1 and buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00", 1)[0].decode("ascii")
        typ = chr(buf[off + 11])
        width = buf[off + 16]
        dec = buf[off + 17]
        fields.append((name, typ, width, dec))
        off += 32
    return nrec, hdr, rec, fields


# ------------------------------------------------------------------ shp

def _shape_records(geom: Optional[Geometry]):
    """(shape_class, content_bytes) for one geometry; None class for
    the Null shape."""
    if geom is None or geom.parts in (None, [], ()):
        return None, struct.pack("<i", 0)
    t = geom.typ
    code = _SHAPE_OF.get(t)
    if code is None:
        raise ValueError(
            f"write_shapefile: {t} has no shapefile encoding "
            "(GeometryCollection is not representable)")
    if code == 1:
        x, y = geom.parts
        return "point", struct.pack("<idd", 1, x, y)
    if code == 8:
        pts = list(geom.parts)
        return "multipoint", (
            struct.pack("<i4d i", 8, *_bbox(pts), len(pts))
            + b"".join(struct.pack("<dd", x, y) for x, y in pts))
    if code == 3:
        lines = ([geom.parts] if t == "LineString"
                 else [list(l) for l in geom.parts])
        lines = [l for l in lines if l]
        if not lines:  # all parts empty -> Null shape
            return None, struct.pack("<i", 0)
        return "line", _poly_content(3, lines)
    rings = []
    polys = ([geom.parts] if t == "Polygon"
             else [list(p) for p in geom.parts])
    for poly in polys:
        for k, ring in enumerate(poly):
            r = list(ring)
            if not r:
                continue
            # spec orientation: shell CW (negative shoelace), holes CCW
            cw = ring_area2(r) < 0
            want_cw = (k == 0)
            if cw != want_cw:
                r = r[::-1]
            rings.append(r)
    if not rings:  # all rings empty -> Null shape
        return None, struct.pack("<i", 0)
    return "area", _poly_content(5, rings)


def _bbox(pts):
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return min(xs), min(ys), max(xs), max(ys)


def _poly_content(code: int, parts: List[List[Tuple[float, float]]]):
    allp = [p for part in parts for p in part]
    starts, n = [], 0
    for part in parts:
        starts.append(n)
        n += len(part)
    return (struct.pack("<i4dii", code, *_bbox(allp), len(parts), n)
            + struct.pack(f"<{len(parts)}i", *starts)
            + b"".join(struct.pack("<dd", x, y) for x, y in allp))


def _shp_header(shape_type: int, length_bytes: int, bb) -> bytes:
    return (struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0,
                        length_bytes // 2)
            + struct.pack("<ii8d", 1000, shape_type,
                          bb[0], bb[1], bb[2], bb[3], 0, 0, 0, 0))


def _parse_shape(content: bytes) -> Optional[Geometry]:
    (code,) = struct.unpack_from("<i", content, 0)
    if code == 0:
        return None
    if code == 1:
        x, y = struct.unpack_from("<dd", content, 4)
        return Geometry.point(x, y)
    if code == 8:
        (npts,) = struct.unpack_from("<i", content, 36)
        pts = list(struct.iter_unpack(
            "<dd", content[40:40 + 16 * npts]))
        return Geometry("MultiPoint",
                        [(x, y) for x, y in pts])
    if code not in (3, 5):
        raise ValueError(f"read_shapefile: unsupported shape type "
                         f"{code}")
    nparts, npts = struct.unpack_from("<ii", content, 36)
    starts = list(struct.unpack_from(f"<{nparts}i", content, 44))
    coords = list(struct.iter_unpack(
        "<dd", content[44 + 4 * nparts:44 + 4 * nparts + 16 * npts]))
    bounds = starts + [npts]
    parts = [[(x, y) for x, y in coords[bounds[i]:bounds[i + 1]]]
             for i in range(nparts)]
    parts = [p for p in parts if p]
    if code == 3:
        if len(parts) == 1:
            return Geometry.linestring(parts[0])
        return Geometry("MultiLineString", parts)
    # rings -> polygons: CW opens a polygon, CCW is a hole of the
    # current one; a leading CCW ring (nonconforming writer) still
    # opens a polygon
    polys: List[List[List[Tuple[float, float]]]] = []
    for r in parts:
        if ring_area2(r) < 0 or not polys:
            polys.append([r])
        else:
            polys[-1].append(r)
    if len(polys) == 1:
        return Geometry("Polygon", polys[0])
    return Geometry("MultiPolygon", polys)


# ----------------------------------------------------------------- sink

def write_shapefile(df: DataFrame, path: str, geom_col: str = "geom",
                    mode: str = "overwrite",
                    char_width: int = 64) -> None:
    """Write ``df`` as a shapefile dataset directory: one
    ``part-NNNNN.{shp,shx,dbf}`` trio per non-empty partition (plus
    one empty trio for an empty input, so the attribute schema
    survives). See the module docstring for the mapping, precision,
    and commit-protocol contracts."""
    import shutil

    if mode == "overwrite" and os.path.isdir(path):
        shutil.rmtree(path)
    elif mode == "error" and os.path.exists(path):
        raise ValueError(f"write_shapefile: path exists: {path}")
    os.makedirs(path, exist_ok=True)

    if geom_col not in df.columns:
        raise ValueError(f"write_shapefile: no column '{geom_col}'")
    fields = _dbf_fields(df.schema, geom_col, char_width)
    attr_names = [n for n, _, _, _ in fields]
    field_of = {n: (t, w, d) for n, t, w, d in fields}

    def _write_one(rows, out_base: str):
        recs, classes, srids = [], set(), set()
        attrs = []
        for r in rows:
            wkb = r[geom_col]
            g = from_wkb(bytes(wkb)) if wkb is not None else None
            cls, content = _shape_records(g)
            if cls is not None:
                classes.add(cls)
                srids.add(g.srid or 0)
            recs.append(content)
            attrs.append(tuple(r[n] for n in attr_names))
        if len(classes) > 1:
            raise ValueError(
                "write_shapefile: mixed shape classes in one "
                f"partition ({sorted(classes)}) — a shapefile holds "
                "one geometry class; split the frame by type first")
        shp_type = {"point": 1, "line": 3, "area": 5,
                    "multipoint": 8}[classes.pop()] if classes else 0
        # bbox over non-null shapes
        bb = [0.0, 0.0, 0.0, 0.0]
        seen = False
        for c in recs:
            (code,) = struct.unpack_from("<i", c, 0)
            if code == 1:
                x, y = struct.unpack_from("<dd", c, 4)
                fb = (x, y, x, y)
            elif code != 0:
                fb = struct.unpack_from("<4d", c, 4)
            else:
                continue
            if not seen:
                bb, seen = list(fb), True
            else:
                bb = [min(bb[0], fb[0]), min(bb[1], fb[1]),
                      max(bb[2], fb[2]), max(bb[3], fb[3])]
        shp_len = 100 + sum(8 + len(c) for c in recs)
        shx_len = 100 + 8 * len(recs)
        # attempt-unique tmp names (the write_geoparquet_std commit
        # protocol): a speculative duplicate attempt writes its own
        # tmp files and the atomic renames race benignly — last
        # attempt wins with identical content
        from pyspark import TaskContext
        tc = TaskContext.get()
        att = tc.taskAttemptId() if tc is not None else 0
        tmp = {ext: f"{out_base}.{ext}.{att}.tmp" for ext in
               ("dbf", "shx", "shp")}
        with open(tmp["dbf"], "wb") as fh:
            fh.write(_dbf_header(fields, len(recs)))
            for a in attrs:
                fh.write(b" " + b"".join(
                    _dbf_cell(v, *field_of[n])
                    for n, v in zip(attr_names, a)))
            fh.write(b"\x1a")
        with open(tmp["shx"], "wb") as fx, open(tmp["shp"], "wb") as fp:
            fx.write(_shp_header(shp_type, shx_len, bb))
            fp.write(_shp_header(shp_type, shp_len, bb))
            off = 100
            for i, c in enumerate(recs):
                fx.write(struct.pack(">ii", off // 2, len(c) // 2))
                fp.write(struct.pack(">ii", i + 1, len(c) // 2))
                fp.write(c)
                off += 8 + len(c)
        # commit: .shp LAST — a trio is live once its .shp exists
        for ext in ("dbf", "shx", "shp"):
            os.replace(tmp[ext], f"{out_base}.{ext}")
        return len(recs), sorted(srids)

    def _task(it):
        from pyspark import TaskContext
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        rows = list(it)
        if rows:
            n, srids = _write_one(
                rows, os.path.join(path, f"part-{pid:05d}"))
            yield (pid, n, srids)

    written = df.rdd.mapPartitions(_task).collect()
    if not written:  # empty input: one empty trio carries the schema
        _write_one([], os.path.join(path, "part-00000"))
        return
    # .prj sidecars (driver-side, after commit): when every non-null
    # geometry carries the SAME registered non-zero SRID — the
    # write_geoparquet_std auto-CRS rule, detected from the per-task
    # reports at no extra pass — emit the registry's ESRI WKT next to
    # each part trio so GDAL/ArcGIS open the dataset with its CRS.
    # Mixed / zero / unregistered SRIDs write no .prj (the format's
    # no-CRS default), unchanged behavior.
    all_srids = {s for _, _, srids in written for s in srids}
    if len(all_srids) == 1:
        srid = all_srids.pop()
        if srid:
            from ..geo.proj import CRS_META, _GEOGRAPHIC_META, esri_wkt
            if srid in CRS_META or srid in _GEOGRAPHIC_META:
                wkt = esri_wkt(srid)
                for pid, _, _ in written:
                    prj = os.path.join(path, f"part-{pid:05d}.prj")
                    with open(prj + ".tmp", "w",
                              encoding="ascii") as fh:
                        fh.write(wkt)
                    os.replace(prj + ".tmp", prj)


# --------------------------------------------------------------- source

def _split_plan(path: str, records_per_split: int):
    """Driver-side: (shp_path, start_record, n_records) splits from the
    ``.shx`` sizes only — no geometry bytes touched on the driver."""
    import glob as _glob
    if os.path.isdir(path):
        shps = sorted(_glob.glob(os.path.join(path, "*.shp")))
    else:
        shps = [path]
    if not shps:
        raise ValueError(f"read_shapefile: no .shp files under {path}")
    splits = []
    for shp in shps:
        shx = shp[:-4] + ".shx"
        nrec = (os.path.getsize(shx) - 100) // 8
        s = 0
        while s < nrec:
            splits.append((shp, s, min(records_per_split, nrec - s)))
            s += records_per_split
        if nrec == 0:
            splits.append((shp, 0, 0))
    return shps, splits


def read_shapefile(spark: SparkSession, path: str,
                   geom_col: str = "geom",
                   records_per_split: int = 65536) -> DataFrame:
    """Read a shapefile dataset (a directory of part trios — ours or
    anyone's ``.shp/.shx/.dbf`` files — or a single ``.shp`` path)
    into (attributes..., ``geom_col`` WKB binary). Splits come from
    the ``.shx`` record index, so ONE large third-party file still
    parallelizes; attribute schema comes from the first file's
    ``.dbf`` header (all files must agree). Records flagged deleted
    in the ``.dbf`` are skipped (this sink never writes any)."""
    shps, splits = _split_plan(path, records_per_split)
    with open(shps[0][:-4] + ".dbf", "rb") as fh:
        head = fh.read(32 * 2049)
    _, _, _, fields = _dbf_parse_header(head)
    for other in shps[1:]:
        with open(other[:-4] + ".dbf", "rb") as fh:
            _, _, _, f2 = _dbf_parse_header(fh.read(32 * 2049))
        if f2 != fields:
            raise ValueError(
                "read_shapefile: .dbf schemas differ between "
                f"{shps[0]} and {other}")

    def spark_type(t, dec):
        if t == "N":
            return "long" if dec == 0 else "double"
        return "string"

    out_schema = ", ".join(
        [f"`{n}` {spark_type(t, d)}" for n, t, _, d in fields]
        + [f"`{geom_col}` binary"])

    def _read(iterator):
        import pandas as pd
        for pdf in iterator:
            for shp, start, n in zip(pdf["shp"], pdf["start"],
                                     pdf["n"]):
                yield _read_range(str(shp), int(start), int(n),
                                  fields, geom_col, pd)

    sdf = (spark.createDataFrame(splits, "shp string, start long, "
                                         "n long")
           .repartition(max(len(splits), 1)))
    out = sdf.mapInPandas(_read, out_schema)
    # .prj discovery: when the first trio carries a .prj whose text is
    # the canonical ESRI-WKT emission of a registered EPSG code
    # (exact match modulo whitespace — the engine stamps what it can
    # prove), re-stamp the geometry column with that SRID, restoring
    # what the coordinate-only .shp lane intentionally drops. The
    # geoparquet footer-discovery contract, .prj edition.
    prj = shps[0][:-4] + ".prj"
    if os.path.exists(prj):
        from ..geo.proj import srid_for_esri_wkt
        with open(prj, encoding="ascii", errors="replace") as fh:
            code = srid_for_esri_wkt(fh.read())
        if code:
            from ..functions import st_setsrid
            out = out.withColumn(geom_col,
                                 st_setsrid(F.col(geom_col), code))
    return out


def _read_range(shp: str, start: int, n: int, fields, geom_col, pd):
    with open(shp[:-4] + ".shx", "rb") as fh:
        fh.seek(100 + 8 * start)
        idx = struct.unpack(f">{2 * n}i", fh.read(8 * n))
    with open(shp[:-4] + ".dbf", "rb") as fh:
        head = fh.read(32 * 2049)
        _, hdr, rec, _ = _dbf_parse_header(head)
        fh.seek(hdr + rec * start)
        dbf = fh.read(rec * n)
    cols: dict = {name: [] for name, _, _, _ in fields}
    cols[geom_col] = []
    with open(shp, "rb") as fh:
        for i in range(n):
            off_words, len_words = idx[2 * i], idx[2 * i + 1]
            row = dbf[rec * i:rec * (i + 1)]
            if row[:1] == b"*":  # deleted
                continue
            fh.seek(off_words * 2 + 8)
            g = _parse_shape(fh.read(len_words * 2))
            cols[geom_col].append(
                to_wkb(g) if g is not None else None)
            p = 1
            for name, typ, width, dec in fields:
                raw = row[p:p + width]
                p += width
                if typ == "N":
                    s = raw.strip()
                    if not s:
                        cols[name].append(None)
                    elif dec == 0:
                        cols[name].append(int(s))
                    else:
                        cols[name].append(float(s))
                else:
                    cols[name].append(
                        raw.rstrip(b" \x00")
                        .decode("utf-8", "replace"))
    return pd.DataFrame(cols)
