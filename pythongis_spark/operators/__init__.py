from pythongis_spark.operators.spatial_join import (  # noqa: F401
    point_in_polygon_join,
    spatial_join,
    spatial_semi_join,
    spatial_anti_join,
)
