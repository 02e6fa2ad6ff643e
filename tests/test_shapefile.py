"""Pure-struct shapefile reader/writer (ESRI spec; reference loads via
PyShp, pythongis/vector/loader.py:42-115)."""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
import pytest

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W
from pythongis_spark.sources.shapefile import (
    parse_dbf,
    parse_shp,
    read_shapefile,
    read_shapefiles,
    write_shapefile,
)


def test_parse_handcrafted_point_shp():
    # one point record built byte-by-byte from the spec (independent of
    # our writer)
    rec = struct.pack("<i", 1) + struct.pack("<dd", 12.5, -3.25)
    content = struct.pack(">ii", 1, len(rec) // 2) + rec
    hdr = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(
        ">i", (100 + len(content)) // 2
    )
    hdr += struct.pack("<ii", 1000, 1)
    hdr += struct.pack("<8d", 12.5, -3.25, 12.5, -3.25, 0, 0, 0, 0)
    geoms = parse_shp(hdr + content)
    assert len(geoms) == 1
    g = W.decode_wkb(geoms[0])
    assert g[0] == "Point" and g[1][0, 0] == 12.5 and g[1][0, 1] == -3.25


def _roundtrip(tmp_path, pdf, name):
    path = os.path.join(str(tmp_path), name + ".shp")
    write_shapefile(pdf, path)
    with open(path, "rb") as fh:
        geoms = parse_shp(fh.read())
    with open(path[:-4] + ".dbf", "rb") as fh:
        attrs = parse_dbf(fh.read())
    return geoms, attrs


def test_roundtrip_points_attrs(tmp_path):
    pdf = pd.DataFrame(
        {
            "fid": [1, 2, 3],
            "name": ["alpha", "beta", "gamma"],
            "score": [1.5, -2.25, 0.0],
            "geom": [W.wkb_point(0, 0), W.wkb_point(10.5, -4.5), W.wkb_point(-170, 80)],
        }
    )
    geoms, attrs = _roundtrip(tmp_path, pdf, "pts")
    assert [W.decode_wkb(g)[1][0].tolist() for g in geoms] == [
        [0, 0], [10.5, -4.5], [-170, 80]
    ]
    assert list(attrs["fid"]) == [1, 2, 3]
    assert list(attrs["name"]) == ["alpha", "beta", "gamma"]
    assert attrs["score"].tolist() == pytest.approx([1.5, -2.25, 0.0])


def test_roundtrip_polygon_with_hole(tmp_path):
    ext = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], float)
    pdf = pd.DataFrame({"fid": [7], "geom": [W.wkb_polygon(ext, [hole])]})
    geoms, attrs = _roundtrip(tmp_path, pdf, "poly")
    g = W.decode_wkb(geoms[0])
    assert g[0] == "Polygon" and len(g[1]) == 2
    assert G.polygon_area(g) == pytest.approx(100 - 4)
    # spec orientation on disk: exterior CW, hole CCW
    with open(os.path.join(str(tmp_path), "poly.shp"), "rb") as fh:
        raw = fh.read()
    # re-decode and check our grouping put the hole back inside
    assert attrs["fid"].tolist() == [7]


def test_roundtrip_multipolygon_and_lines(tmp_path):
    mp = W.wkb_multipolygon(
        [
            (np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float), []),
            (np.array([[5, 5], [7, 5], [7, 7], [5, 7], [5, 5]], float), []),
        ]
    )
    pdf = pd.DataFrame({"fid": [1], "geom": [mp]})
    geoms, _ = _roundtrip(tmp_path, pdf, "mp")
    g = W.decode_wkb(geoms[0])
    assert g[0] == "MultiPolygon" and G.polygon_area(g) == pytest.approx(5.0)

    line = W.wkb_linestring(np.array([[0, 0], [5, 5], [10, 0]], float))
    pdf = pd.DataFrame({"fid": [1], "geom": [line]})
    geoms, _ = _roundtrip(tmp_path, pdf, "ln")
    g = W.decode_wkb(geoms[0])
    assert g[0] == "LineString" and len(g[1]) == 3


def test_null_geometry_roundtrip(tmp_path):
    pdf = pd.DataFrame({"fid": [1, 2], "geom": [W.wkb_point(1, 1), None]})
    geoms, attrs = _roundtrip(tmp_path, pdf, "nulls")
    assert geoms[1] is None and len(attrs) == 2


def test_spark_read_single_and_glob(spark, tmp_path):
    from pythongis_spark import fixtures as FX

    zones = FX.oracle_zones_pdf()[["zone_id", "name", "geom"]].iloc[:8]
    p1 = os.path.join(str(tmp_path), "za.shp")
    p2 = os.path.join(str(tmp_path), "zb.shp")
    write_shapefile(zones.iloc[:4], p1)
    write_shapefile(zones.iloc[4:], p2)

    df = read_shapefile(spark, p1)
    assert df.count() == 4
    got = {r["zone_id"]: bytes(r["geom"]) for r in df.collect()}
    for zid, blob in got.items():
        src = W.decode_wkb(zones.set_index("zone_id").loc[zid, "geom"])
        back = W.decode_wkb(blob)
        assert G.polygon_area(src) == pytest.approx(G.polygon_area(back))

    many = read_shapefiles(spark, os.path.join(str(tmp_path), "z*.shp"))
    assert many.count() == 8
    assert set(r["source_file"] for r in many.select("source_file").distinct().collect()) == {
        "za.shp", "zb.shp"
    }


def test_ascii_grid_roundtrip(spark, tmp_path):
    from pythongis_spark import fixtures as FX
    from pythongis_spark.raster.model import RasterDef
    from pythongis_spark.sources.ascii_grid import read_ascii_grid, write_ascii_grid

    rd = RasterDef(36, 18, (10.0, 0.0, -180.0, 0.0, -10.0, 90.0))
    cells = FX.raster_cells(spark, 36, 18, 1)
    path = os.path.join(str(tmp_path), "grid.asc")
    write_ascii_grid(cells, rd, path)
    back, rd2 = read_ascii_grid(spark, path)
    assert (rd2.width, rd2.height) == (36, 18)
    assert rd2.affine == rd.affine
    a = cells.filter("band = 0 AND val IS NOT NULL").toPandas().set_index(["x", "y"])["val"]
    b = back.toPandas().set_index(["x", "y"])["val"]
    assert len(a) == len(b)
    assert (a.sort_index() == b.sort_index()).all()  # repr round-trip is exact


def test_ascii_grid_parse_header_variants():
    from pythongis_spark.sources.ascii_grid import parse_ascii_grid

    txt = """ncols 3
nrows 2
xllcenter 0.5
yllcenter 0.5
cellsize 1.0
NODATA_value -9999
1 2 -9999
4 5 6
"""
    grid, rd = parse_ascii_grid(txt)
    assert grid.shape == (2, 3)
    assert np.isnan(grid[0, 2])
    assert rd.xoffset == 0.0 and rd.yoffset == 2.0  # llcenter -> corner + north-up
    assert rd.yscale == -1.0


def test_geotiff_roundtrip(spark, tmp_path):
    from pythongis_spark import fixtures as FX
    from pythongis_spark.raster.model import RasterDef
    from pythongis_spark.sources.geotiff import parse_geotiff, read_geotiff, write_geotiff

    rd = RasterDef(36, 18, (10.0, 0.0, -180.0, 0.0, -10.0, 90.0))
    cells = FX.raster_cells(spark, 36, 18, 2)  # two bands, ~5% nodata
    path = os.path.join(str(tmp_path), "grid.tif")
    write_geotiff(cells, rd, path)
    back, rd2 = read_geotiff(spark, path)
    assert (rd2.width, rd2.height) == (36, 18)
    assert rd2.affine == rd.affine
    assert rd2.nodata == rd.nodata
    a = (
        cells.filter("val IS NOT NULL").toPandas()
        .set_index(["band", "x", "y"])["val"].sort_index()
    )
    b = back.toPandas().set_index(["band", "x", "y"])["val"].sort_index()
    assert len(a) == len(b)
    assert (a == b).all()  # float64 samples round-trip bit-exact


def test_geotiff_rejects_unsupported(tmp_path):
    from pythongis_spark.sources.geotiff import parse_geotiff

    with pytest.raises(ValueError):
        parse_geotiff(b"XX\x00\x00not a tiff")


def test_deleted_dbf_rows_drop_paired_geometries(tmp_path):
    """A soft-deleted (0x2A-flagged) dbf record keeps its paired .shp
    record in the file; the reader must drop BOTH instead of raising a
    length-mismatch (or worse, zipping attributes to wrong geometries)."""
    import struct

    from pythongis_spark.sources.shapefile import _read_one, write_shapefile

    pdf = pd.DataFrame(
        {
            "fid": [1, 2, 3],
            "geom": [W.wkb_point(0, 0), W.wkb_point(5, 5), W.wkb_point(9, 9)],
        }
    )
    base = str(tmp_path / "del")
    write_shapefile(pdf, base + ".shp")
    dbf = bytearray(open(base + ".dbf", "rb").read())
    _, hsize, rsize = struct.unpack_from("<iHH", dbf, 4)
    dbf[hsize + rsize] = 0x2A  # delete the SECOND record
    open(base + ".dbf", "wb").write(bytes(dbf))
    out = _read_one(base + ".shp")
    assert list(out["fid"]) == [1, 3]
    assert [W.decode_wkb(g)[1][0].tolist() for g in out["geom"]] == [
        [0, 0], [9, 9]]


def test_geotiff_planar_config_raises(spark, tmp_path):
    """PlanarConfiguration=2 (band-sequential) must raise instead of
    silently scrambling bands through the chunky reshape."""
    import struct

    from pythongis_spark.raster.model import RasterDef
    from pythongis_spark.sources.geotiff import parse_geotiff, write_geotiff

    rd = RasterDef(4, 3, (1.0, 0.0, 0.0, 0.0, -1.0, 3.0), nodata=-1.0)
    cells = spark.createDataFrame(
        [(x, y, 0, float(x + y)) for y in range(3) for x in range(4)],
        "x int, y int, band int, val double")
    p = str(tmp_path / "planar.tif")
    write_geotiff(cells, rd, p)
    buf = bytearray(open(p, "rb").read())
    # patch SamplesPerPixel (277) 1→2 and PlanarConfiguration (284) 1→2
    for tag in (277, 284):
        pat = struct.pack("<HHI", tag, 3, 1) + struct.pack("<HH", 1, 0)
        i = buf.find(pat)
        assert i >= 0, tag
        buf[i + 8 : i + 12] = struct.pack("<HH", 2, 0)
    with pytest.raises(NotImplementedError, match="[Pp]lanar"):
        parse_geotiff(bytes(buf))


def test_geotiff_dims_past_short_range(spark, tmp_path):
    """Width/height/rows-per-strip are written as LONG so rasters wider
    than 65535 cells don't overflow the 16-bit pack."""
    import numpy as np

    from pythongis_spark.raster.model import RasterDef
    from pythongis_spark.sources.geotiff import parse_geotiff, write_geotiff

    w = 70000
    rd = RasterDef(w, 1, (1.0, 0.0, 0.0, 0.0, -1.0, 1.0), nodata=-1.0)
    cells = spark.createDataFrame(
        [(x, 0, 0, float(x % 251)) for x in range(0, w, 997)],
        "x int, y int, band int, val double")
    p = str(tmp_path / "wide.tif")
    write_geotiff(cells, rd, p)
    arr, rd2 = parse_geotiff(open(p, "rb").read())
    assert rd2.width == w and rd2.height == 1
    assert arr.shape[:2] == (1, w)
    assert arr[0, 997 * 3, 0] == float((997 * 3) % 251)
    assert np.isnan(arr[0, 1, 0])  # unset cell → nodata → NaN


def test_writer_emits_valid_shx(tmp_path):
    """The mandatory .shx index: one BE (offset-words, length-words) pair
    per record, offsets consistent with the .shp record stream (ESRI
    whitepaper 'Index File')."""
    import struct

    pdf = pd.DataFrame(
        {
            "fid": [1, 2],
            "geom": [W.wkb_point(1, 2), W.wkb_point(3, 4)],
        }
    )
    shp = os.path.join(str(tmp_path), "idx.shp")
    write_shapefile(pdf, shp)
    shx = os.path.join(str(tmp_path), "idx.shx")
    assert os.path.exists(shx)
    buf = open(shx, "rb").read()
    assert struct.unpack(">i", buf[:4])[0] == 9994
    assert struct.unpack(">i", buf[24:28])[0] * 2 == len(buf)  # own length
    n = (len(buf) - 100) // 8
    assert n == 2
    shp_buf = open(shp, "rb").read()
    for i in range(n):
        off_w, len_w = struct.unpack(">ii", buf[100 + 8 * i : 108 + 8 * i])
        # record header at byte offset: recnum (1-based) + content length
        rn, cl = struct.unpack(">ii", shp_buf[off_w * 2 : off_w * 2 + 8])
        assert rn == i + 1 and cl == len_w
