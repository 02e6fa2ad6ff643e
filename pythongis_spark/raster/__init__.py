from pythongis_spark.raster.model import (  # noqa: F401
    RasterDef,
    cell_center_exprs,
    geo_to_cell_exprs,
    with_tile_ids,
    tile_windows,
)
