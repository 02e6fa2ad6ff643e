"""Raster load/save for image formats + world-file georeferencing —
the reference's image branch of ``pythongis/raster/loader.py:35-115``
(its ``land_shallow_topo_2048.png`` + ``.wld`` fixture pattern).

PNG and BMP decode through the REAL pure-stdlib codecs in
:mod:`pythongis_spark.images.codec`; the world file (generic ``.wld``
or type-specific ``.pgw``/``.bpw``) supplies the affine. Like the
reference, the six world-file values are used directly as
(xscale, xskew, xoff, yskew, yscale, yoff) — no half-pixel
center-to-corner shift (``loader.py:76-79``; divergence from the
strict ESRI center convention, kept for reference parity). Bands are
the image channels (R, G, B), matching the reference's
``image.split()``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pythongis_spark.images import codec
from pythongis_spark.raster.model import RasterDef

_WORLD_EXT = {".png": ".pgw", ".bmp": ".bpw", ".jpg": ".jgw", ".jpeg": ".jgw"}


def _world_file_path(path: str) -> str | None:
    root, ext = os.path.splitext(path)
    if os.path.lexists(root + ".wld"):
        return root + ".wld"
    spec = _WORLD_EXT.get(ext.lower())
    if spec and os.path.lexists(root + spec):
        return root + spec
    return None


def read_world_file(path: str) -> tuple[float, float, float, float, float, float]:
    """Six world-file lines → affine (xscale, xskew, xoff, yskew,
    yscale, yoff) with the reference's value reordering
    (``loader.py:76-79``: file order is xscale, yskew, xskew, yscale,
    xoff, yoff)."""
    with open(path) as fh:
        xscale, yskew, xskew, yscale, xoff, yoff = map(float, fh.read().split())
    return (xscale, xskew, xoff, yskew, yscale, yoff)


def write_world_file(path: str, affine) -> None:
    xscale, xskew, xoff, yskew, yscale, yoff = affine
    with open(path, "w") as fh:
        fh.write("\n".join(
            repr(float(v)) for v in (xscale, yskew, xskew, yscale, xoff, yoff)
        ) + "\n")


def read_image_raster(spark: SparkSession, path: str) -> tuple[DataFrame, RasterDef]:
    """image file (+ world-file sidecar) → ((x, y, band, val) cell table,
    RasterDef). Without a world file the identity-ish affine is used and
    a warning raised, mirroring ``loader.py:from_image``."""
    with open(path, "rb") as fh:
        px = codec.decode_image(fh.read())
    h, w, nch = px.shape
    wf = _world_file_path(path)
    if wf is not None:
        affine = read_world_file(wf)
    else:
        import warnings

        warnings.warn("no world file found; using unit affine (loader.py:44)")
        affine = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)
    rd = RasterDef(width=w, height=h, affine=affine)
    xs = np.tile(np.arange(w), h)
    ys = np.repeat(np.arange(h), w)
    frames = [
        pd.DataFrame({
            "x": xs.astype(np.int32), "y": ys.astype(np.int32),
            "band": np.full(h * w, b, dtype=np.int32),
            "val": px[:, :, b].ravel().astype(np.float64),
        })
        for b in range(nch)
    ]
    pdf = pd.concat(frames, ignore_index=True)
    return spark.createDataFrame(pdf, "x int, y int, band int, val double"), rd


def write_image_raster(cells: DataFrame, rd: RasterDef, path: str,
                       fmt: str | None = None) -> None:
    """(x, y, band, val) cell table → image file + world-file sidecar.
    Values clipped to uint8; missing cells → 0; bands beyond 3 rejected
    (image formats carry exactly R, G, B here)."""
    ext = os.path.splitext(path)[1].lower()
    fmt = fmt or {".png": "png", ".bmp": "bmp",
                  ".jpg": "jpeg-real", ".jpeg": "jpeg-real"}.get(ext)
    if fmt not in ("png", "bmp", "jpeg-real"):
        raise NotImplementedError(
            f"image raster export supports png/bmp/jpg, not {fmt!r}"
        )
    pdf = cells.select("x", "y", "band", "val").toPandas()
    nb = int(pdf["band"].max()) + 1 if len(pdf) else 1
    if nb > 3:
        raise ValueError("image export supports at most 3 bands")
    px = np.zeros((rd.height, rd.width, 3), dtype=np.uint8)
    ok = pdf["val"].notna()
    vals = np.clip(pdf["val"][ok].to_numpy(np.float64), 0, 255).astype(np.uint8)
    px[pdf["y"][ok].to_numpy(int), pdf["x"][ok].to_numpy(int),
       pdf["band"][ok].to_numpy(int)] = vals
    if nb == 1:  # grayscale input: replicate like the reference's "L" mode
        px[:, :, 1] = px[:, :, 0]
        px[:, :, 2] = px[:, :, 0]
    blob = codec.encode_image(px, fmt)
    with open(path, "wb") as fh:
        fh.write(blob)
    root = os.path.splitext(path)[0]
    write_world_file(root + _WORLD_EXT.get(ext, ".wld"), rd.affine)
