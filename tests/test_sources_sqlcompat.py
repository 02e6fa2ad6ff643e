"""Sources + reference sql.query compatibility tests."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pythongis_spark.operators.sqlcompat import query
from pythongis_spark.sources import tables as S


def test_query_ungrouped_order(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [5, 1, 3, 2, 4]}))
    out = query([df], _select=[("a2", "a * 2")], _where="a > 1", _limit=3)
    got = out.toPandas()
    assert len(got) == 3
    assert set(got.columns) == {"a2"}
    assert (got["a2"] % 2 == 0).all()


def test_query_group_limit_counts_groups(spark):
    pdf = pd.DataFrame({"g": ["a", "a", "b", "b", "c"], "v": [1.0, 2, 3, 4, 5]})
    df = spark.createDataFrame(pdf)
    # _limit=2 caps GROUPS (reference sql.py:220-221); _where applies
    # within groups AFTER grouping (sql.py:224-226)
    out = query(
        [df],
        _groupby=["g"],
        _fieldmapping=[("sv", "v", "sum"), ("n", "v", "count")],
        _where="v > 1",
        _limit=2,
    ).toPandas().set_index("g").sort_index()
    assert list(out.index) == ["a", "b"]  # only 2 groups survive
    assert out.loc["a", "sv"] == 2.0 and out.loc["a", "n"] == 1  # v=1 filtered
    assert out.loc["b", "sv"] == 7.0


def test_query_cross_product(spark):
    a = spark.createDataFrame(pd.DataFrame({"x": [1, 2]}))
    b = spark.createDataFrame(pd.DataFrame({"y": [10, 20, 30]}))
    out = query([a, b], _where="x * 10 <= y")
    assert out.count() == 2 + 3  # x=1 matches all 3? no: 10<=y all 3; x=2: 20<=y -> 2
    # recompute: x=1 -> y in {10,20,30} (3); x=2 -> y in {20,30} (2) = 5
    assert out.count() == 5


def test_read_write_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    p = str(tmp_path / "t.parquet")
    S.write_table(df, p)
    back = S.read_table(spark, p)
    assert back.count() == 2
    with pytest.raises(ValueError):
        S.read_table(spark, "/tmp/whatever.ods")  # .shp/.xls now supported
    # a slash-less RELATIVE path with a known extension routes to the
    # file reader (regression: used to hit the iceberg branch and raise
    # about missing jars); a bare catalog identifier still does
    with pytest.raises(Exception) as ei:
        S.read_table(spark, "no_such_file_here.csv").count()
    assert "Iceberg" not in str(ei.value) and "iceberg" not in str(ei.value)
    with pytest.raises(NotImplementedError, match="[Ii]ceberg"):
        S.read_table(spark, "some_catalog_table")


def test_read_image_table_schema_gate(spark, tmp_path):
    from pythongis_spark import fixtures as FX

    p = str(tmp_path / "imgs")
    FX.images_df(spark, 10).write.parquet(p)
    ok = S.read_image_table(spark, p)
    assert ok.count() == 10
    bad = str(tmp_path / "bad")
    spark.createDataFrame(pd.DataFrame({"image_id": ["a"]})).write.parquet(bad)
    with pytest.raises(ValueError, match="missing columns"):
        S.read_image_table(spark, bad)


def test_iceberg_stub(spark):
    with pytest.raises(NotImplementedError, match="Iceberg"):
        S.read_table(spark, "catalog.db.tbl", fmt="iceberg")


def test_incremental_files(spark, tmp_path):
    base = str(tmp_path / "inc")
    os.makedirs(base)
    log = str(tmp_path / "log.txt")
    df = spark.createDataFrame(pd.DataFrame({"v": [1, 2, 3]}))
    df.coalesce(1).write.parquet(base + "/b1")
    # flatten: move part file up
    import glob
    import shutil

    for i, part in enumerate(glob.glob(base + "/b1/part-*.parquet")):
        shutil.move(part, base + f"/file{i}.parquet")
    shutil.rmtree(base + "/b1")

    got, files = S.incremental_files(spark, base, log)
    assert got is not None and got.count() == 3 and len(files) == 1
    S.mark_processed(log, files)
    got2, files2 = S.incremental_files(spark, base, log)
    assert got2 is None and files2 == []


def test_register_sql_functions(spark):
    from pythongis_spark.geometry.udfs import register_sql_functions
    from pythongis_spark.geometry.wkb import wkb_polygon
    import numpy as np

    register_sql_functions(spark)
    ring = np.array([[0.0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])
    spark.createDataFrame(pd.DataFrame({"geom": [wkb_polygon(ring)]})).createOrReplaceTempView(
        "geoms_tv"
    )
    row = spark.sql(
        "SELECT st_area(geom) AS a, st_geomtype(geom) AS t, "
        "st_haversine(0.0, 0.0, 1.0, 0.0) AS d FROM geoms_tv"
    ).first()
    assert row["a"] == 16.0 and row["t"] == "Polygon"
    assert 110000 < row["d"] < 112000


def test_geotiff_deflate_roundtrip(spark, tmp_path):
    """Deflate-compressed strips (compression=8) decode via stdlib zlib;
    writer round-trips with compress='deflate'."""
    import os

    from pythongis_spark.sources.geotiff import (parse_geotiff, read_geotiff,
                                                 write_geotiff)
    from pythongis_spark.raster.model import RasterDef

    rd = RasterDef(20, 10, (0.5, 0.0, -5.0, 0.0, -0.5, 2.5))
    pdf = pd.DataFrame({
        "x": [0, 3, 19, 7], "y": [0, 2, 9, 5], "band": [0, 0, 0, 0],
        "val": [1.5, -2.25, 7.0, 0.0],
    })
    cells = spark.createDataFrame(pdf)
    p = os.path.join(str(tmp_path), "z.tif")
    write_geotiff(cells, rd, p, compress="deflate")
    buf = open(p, "rb").read()
    import struct as st
    assert b"II" == buf[:2]
    back, rd2 = read_geotiff(spark, p)
    got = {(r["x"], r["y"]): r["val"] for r in back.collect()}
    assert got == {(0, 0): 1.5, (3, 2): -2.25, (19, 9): 7.0, (7, 5): 0.0}
    assert (rd2.xscale, rd2.yscale, rd2.xoffset, rd2.yoffset) == (
        0.5, -0.5, -5.0, 2.5)


def test_geotiff_predictor2_and_packbits(tmp_path):
    """Hand-built deflate+predictor-2 and PackBits TIFFs decode right."""
    import struct as st
    import zlib

    import numpy as np

    from pythongis_spark.sources.geotiff import parse_geotiff

    def build(w, h, raw_rows, comp, extra_tags=()):
        data = b"".join(raw_rows)
        if comp == 8:
            data = zlib.compress(data)
        entries = [
            (256, 3, 1, st.pack("<H", w).ljust(4, b"\0")),
            (257, 3, 1, st.pack("<H", h).ljust(4, b"\0")),
            (258, 3, 1, st.pack("<H", 8).ljust(4, b"\0")),
            (259, 3, 1, st.pack("<H", comp).ljust(4, b"\0")),
            (277, 3, 1, st.pack("<H", 1).ljust(4, b"\0")),
            (278, 3, 1, st.pack("<H", h).ljust(4, b"\0")),
            (279, 4, 1, st.pack("<I", len(data))),
        ] + list(extra_tags)
        n = len(entries) + 1
        ifd_off = 8
        data_off = ifd_off + 2 + 12 * n + 4
        entries.append((273, 4, 1, st.pack("<I", data_off)))
        entries.sort()
        out = b"II" + st.pack("<HI", 42, ifd_off) + st.pack("<H", n)
        for tag, t, c, v in entries:
            out += st.pack("<HHI", tag, t, c) + v
        out += st.pack("<I", 0) + data
        return out

    # predictor 2: rows stored as diffs
    row0 = bytes([10, 5, 5, 236])   # cumsum -> 10,15,20,0 (mod 256)
    row1 = bytes([1, 255, 0, 1])    # cumsum -> 1,0,0,1
    buf = build(4, 2, [row0, row1], 8,
                extra_tags=[(317, 3, 1, st.pack("<H", 2).ljust(4, b"\0"))])
    arr, rd = parse_geotiff(buf)
    assert arr[:, :, 0].astype(int).tolist() == [[10, 15, 20, 0], [1, 0, 0, 1]]

    # packbits: literal run of 3, then one byte replicated 3x
    pb = bytes([2, 7, 8, 9, 254, 5])
    from pythongis_spark.sources.geotiff import _unpackbits
    assert _unpackbits(pb) == bytes([7, 8, 9, 5, 5, 5])


def test_xlsx_roundtrip_and_points(spark, tmp_path):
    """Pure-stdlib XLSX reader (reference loader Excel branch,
    vector/loader.py:133-150): header row -> fields, xfield/yfield ->
    WKB point geom; writer round-trips inline strings/numbers/bools."""
    import os

    from pythongis_spark.geometry import wkb as GW
    from pythongis_spark.sources.xlsx import parse_xlsx, read_xlsx, write_xlsx

    pdf = pd.DataFrame({
        "name": ["a", "b", "c"],
        "v": [1, 2, 3],
        "lon": [10.5, -46.0, 0.25],
        "lat": [59.5, -23.0, -0.75],
    })
    p = os.path.join(str(tmp_path), "pts.xlsx")
    write_xlsx(spark.createDataFrame(pdf), p)
    df = read_xlsx(spark, p, xfield="lon", yfield="lat")
    rows = {r["name"]: r for r in df.collect()}
    assert rows["b"]["v"] == 2
    t, coords = GW.decode_wkb(bytes(rows["a"]["geom"]))
    assert t == "Point" and coords.tolist() == [[10.5, 59.5]]
    # skip + sheet-name errors
    import pytest as _pt
    with _pt.raises(KeyError):
        read_xlsx(spark, p, sheet="nope")


def test_stata_dta_read(spark, tmp_path):
    """Stata .dta via pandas read_stata (reference stata.py analog:
    fieldnames uppercased)."""
    import os

    p = os.path.join(str(tmp_path), "t.dta")
    pd.DataFrame({"name": ["x", "y"], "val": [1.5, -2.0]}).to_stata(
        p, write_index=False
    )
    df = S.read_table(spark, p)
    assert set(df.columns) == {"NAME", "VAL"}
    rows = {r["NAME"]: r["VAL"] for r in df.collect()}
    assert rows == {"x": 1.5, "y": -2.0}


def test_geotiff_lzw_and_tiled_roundtrip(spark, tmp_path):
    """LZW strips (compression=5, §13 early-change codes) and tiled
    layout (§15, incl. edge tiles + LZW + multiband) round-trip exactly;
    float32 values chosen dyadic so the narrowing cast is lossless."""
    import os

    import numpy as np

    from pythongis_spark.raster.model import RasterDef
    from pythongis_spark.sources.geotiff import (parse_geotiff, read_geotiff,
                                                 write_geotiff)

    w, h = 37, 23  # NOT multiples of the 16x16 tile -> padded edge tiles
    rng = np.random.Generator(np.random.PCG64(5))
    vals = (rng.integers(-100, 100, size=(h, w)) / 4.0)
    pdf = pd.DataFrame({
        "x": np.tile(np.arange(w), h), "y": np.repeat(np.arange(h), w),
        "band": 0, "val": vals.ravel(),
    })
    cells = spark.createDataFrame(pdf)
    rd = RasterDef(w, h, (0.25, 0.0, -3.0, 0.0, -0.25, 5.0))

    for kw in (dict(compress="lzw"), dict(tile=(16, 16)),
               dict(compress="lzw", tile=(16, 16)),
               dict(compress="packbits", tile=(16, 16))):
        p = os.path.join(str(tmp_path), "t.tif")
        write_geotiff(cells, rd, p, dtype="float32", **kw)
        back, rd2 = read_geotiff(spark, p)
        got = back.toPandas().sort_values(["y", "x"])
        assert len(got) == w * h, kw
        assert (got["val"].to_numpy() == vals.ravel()).all(), kw
        assert (rd2.xscale, rd2.yscale, rd2.xoffset, rd2.yoffset) == (
            0.25, -0.25, -3.0, 5.0)

    # multiband tiled + predictor-free uint8 path through int dtype
    pdf2 = pd.concat([
        pdf.assign(band=0),
        pdf.assign(band=1, val=(pdf["val"] * 2)),
    ])
    cells2 = spark.createDataFrame(pdf2)
    p2 = os.path.join(str(tmp_path), "mb.tif")
    write_geotiff(cells2, rd, p2, dtype="float64", compress="lzw", tile=(16, 16))
    arr, _ = parse_geotiff(open(p2, "rb").read())
    assert arr.shape == (h, w, 2)
    assert (arr[:, :, 0] == vals).all() and (arr[:, :, 1] == vals * 2).all()


def test_geotiff_lzw_predictor2_strips(tmp_path):
    """LZW + horizontal-differencing predictor on a hand-built stripped
    file: decode path must undo the predictor after LZW expansion."""
    import struct as st

    import numpy as np

    from pythongis_spark.sources.geotiff import _lzw_encode, parse_geotiff

    w, h = 6, 3
    base = np.arange(w * h, dtype=np.uint8).reshape(h, w) * 3
    diff = base.astype(np.int16)
    diff[:, 1:] = diff[:, 1:] - diff[:, :-1]
    data = _lzw_encode(diff.astype(np.uint8).tobytes())
    entries = [
        (256, 3, 1, st.pack("<H", w).ljust(4, b"\0")),
        (257, 3, 1, st.pack("<H", h).ljust(4, b"\0")),
        (258, 3, 1, st.pack("<H", 8).ljust(4, b"\0")),
        (259, 3, 1, st.pack("<H", 5).ljust(4, b"\0")),
        (277, 3, 1, st.pack("<H", 1).ljust(4, b"\0")),
        (278, 3, 1, st.pack("<H", h).ljust(4, b"\0")),
        (279, 4, 1, st.pack("<I", len(data))),
        (317, 3, 1, st.pack("<H", 2).ljust(4, b"\0")),
    ]
    n = len(entries) + 1
    data_off = 8 + 2 + 12 * n + 4
    entries.append((273, 4, 1, st.pack("<I", data_off)))
    entries.sort()
    out = b"II" + st.pack("<HI", 42, 8) + st.pack("<H", n)
    for tag, t, c, v in entries:
        out += st.pack("<HHI", tag, t, c) + v
    out += st.pack("<I", 0) + data
    arr, _ = parse_geotiff(out)
    assert (arr[:, :, 0] == base).all()


def _build_xls(rows_spec) -> bytes:
    """Real OLE2+BIFF8 assembly lives in sources/xls.assemble_xls; the
    test keeps this alias so fixtures read naturally."""
    from pythongis_spark.sources.xls import assemble_xls

    return assemble_xls(rows_spec)


def test_xls_biff8_read(spark, tmp_path):
    """BIFF5/8 .xls read (reference vector/loader.py:135-141 via xlrd;
    pure [MS-CFB]+[MS-XLS] here): numbers, RK/MULRK packed numbers,
    shared strings (UTF-16 + latin-1), booleans, cached formula
    results — through a hand-assembled real OLE2 container."""
    import os
    import struct as st

    from pythongis_spark.sources.xls import parse_xls, read_xls

    rk_int = (123 << 2) | 2              # integer RK: 123
    rk_cents = ((12345 << 2) | 2) | 1    # int/100 RK: 123.45
    d = st.unpack("<Q", st.pack("<d", 2.5))[0]
    rk_float = int(d >> 32) & 0xFFFFFFFC  # high-30-bit float RK: 2.5
    rows_spec = [
        (0, 0, "id"), (0, 1, "value"), (0, 2, "name"),
        (1, 0, 1.0), (1, 1, ("rk", rk_int)), (1, 2, "alpha"),
        (2, 0, 2.0), (2, 1, ("rk", rk_cents)), (2, 2, "béta"),
        (3, 0, 3.0), (3, 1, ("rk", rk_float)), (3, 2, "alpha"),
        (4, 0, 4.0), (4, 1, ("formula", 99.5)), (4, 2, "gamma"),
        (5, 0, 5.0), (5, 1, ("mulrk", [rk_int, rk_int])), (5, 3, True),
    ]
    p = os.path.join(str(tmp_path), "t.xls")
    with open(p, "wb") as fh:
        fh.write(_build_xls(rows_spec))

    rows = parse_xls(p)
    assert rows[0] == ["id", "value", "name", None]
    assert rows[1][:3] == [1.0, 123.0, "alpha"]
    assert rows[2][:3] == [2.0, 123.45, "béta"]
    assert rows[3][:3] == [3.0, 2.5, "alpha"]
    assert rows[4][:3] == [4.0, 99.5, "gamma"]
    assert rows[5] == [5.0, 123.0, 123.0, True]

    df = read_xls(spark, p)
    pdf = df.toPandas()
    assert list(pdf.columns)[:3] == ["id", "value", "name"]
    assert len(pdf) == 5
    assert pdf["value"].tolist() == [123.0, 123.45, 2.5, 99.5, 123.0]


def test_xls_sst_continue_hand_assembled():
    """SST CONTINUE parsing per [MS-XLS] 2.5.293, hand-built segments:
    (a) a compressed string split mid-rgb whose continuation restarts
    WIDE (latin-1 → UTF-16 switch), (b) rich-text run arrays spanning
    the boundary byte-wise with no flag byte, (c) a string header that
    begins exactly at a CONTINUE start (between-strings split, also no
    flag byte)."""
    import struct

    from pythongis_spark.sources.xls import _parse_sst

    s1, s2, s3, s4 = "abcdefgh", "wïde", "tail", "next"
    seg1 = struct.pack("<ii", 4, 4)
    seg1 += struct.pack("<HB", len(s1), 0) + s1[:3].encode("latin-1")
    # continuation of s1's rgb: fresh grbit says WIDE from here on
    seg2 = bytes([1]) + s1[3:].encode("utf-16-le")
    # s2: wide + fRichSt with 2 runs; 5 of the 8 run bytes in this
    # segment, the rest spill into the next with no flag byte
    seg2 += (
        struct.pack("<HB", len(s2), 0x08 | 0x01)
        + struct.pack("<H", 2)
        + s2.encode("utf-16-le")
        + b"\x00" * 5
    )
    seg3 = b"\x00" * 3  # remainder of s2's run array
    seg3 += struct.pack("<HB", len(s3), 0) + s3.encode("latin-1")
    # s4 header at the very start of a CONTINUE record
    seg4 = struct.pack("<HB", len(s4), 0) + s4.encode("latin-1")
    assert _parse_sst([seg1, seg2, seg3, seg4]) == [s1, s2, s3, s4]


def test_xls_cfb_directory_tree_reaches_workbook():
    """Conformant MS-CFB readers walk the directory red-black tree from
    the root entry's CHILD pointer — a root with child = NOSTREAM (-1)
    presents an empty container even though a linear scan finds the
    Workbook. The writer must emit root.child → the Workbook entry."""
    import struct

    from pythongis_spark.sources.xls import assemble_xls

    blob = assemble_xls([(0, 0, "hi"), (1, 0, 2.5)])
    dir_off = 1024  # header sector + one FAT sector
    name = blob[dir_off:dir_off + 20].decode("utf-16-le")
    assert name == "Root Entry"
    (child,) = struct.unpack_from("<i", blob, dir_off + 76)
    assert child == 1  # → the Workbook stream entry
    wb_off = dir_off + 128
    assert blob[wb_off:wb_off + 16].decode("utf-16-le") == "Workbook"
    left, right = struct.unpack_from("<2i", blob, wb_off + 68)
    assert left == -1 and right == -1
    assert blob[dir_off + 67] == 1 and blob[wb_off + 67] == 1  # black


def test_xls_sst_continue_roundtrip(spark, tmp_path):
    """>8KB of distinct SST strings (plus one 9000-char string that
    must split mid-rgb) forces the writer to emit real CONTINUE
    records; the reader reassembles every string byte-exactly."""
    import os

    from pythongis_spark.sources.xls import assemble_xls, parse_xls

    vals = [f"cell value {i:05d} " + "x" * 200 for i in range(60)]
    big = "Y" * 9000
    rows_spec = (
        [(0, 0, "header")]
        + [(i + 1, 0, vals[i]) for i in range(60)]
        + [(61, 0, big)]
    )
    blob = assemble_xls(rows_spec)
    p = os.path.join(str(tmp_path), "big.xls")
    with open(p, "wb") as fh:
        fh.write(blob)
    rows = parse_xls(p)
    assert rows[0][0] == "header"
    assert [rows[i + 1][0] for i in range(60)] == vals
    assert rows[61][0] == big


def test_xls_write_read_roundtrip(spark, tmp_path):
    """write_xls → read_xls round-trips a mixed-type table (numbers,
    strings incl. non-latin-1, None holes)."""
    import os

    from pythongis_spark.sources.xls import read_xls, write_xls

    pdf = pd.DataFrame({
        "name": ["alpha", "béta", "日本語", None],
        "qty": [1.5, -2.0, 0.25, 7.0],
        "flag": [True, False, True, False],
    })
    p = os.path.join(str(tmp_path), "rt.xls")
    write_xls(pdf, p)
    out = read_xls(spark, p).toPandas()
    assert list(out.columns) == ["name", "qty", "flag"]
    assert out["qty"].tolist() == [1.5, -2.0, 0.25, 7.0]
    assert out["name"].tolist()[:3] == ["alpha", "béta", "日本語"]
    assert out["flag"].tolist() == [True, False, True, False]
