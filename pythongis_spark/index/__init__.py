from pythongis_spark.index.quadkey import (  # noqa: F401
    cell_of_points,
    cells_of_bbox,
    morton_encode,
    morton_decode,
    quadkey_str,
    neighbors,
    ring_cells,
    pick_level_for_bbox,
)
