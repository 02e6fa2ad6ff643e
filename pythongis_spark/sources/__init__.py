from pythongis_spark.sources.tables import (  # noqa: F401
    read_table,
    read_image_table,
    write_table,
    incremental_files,
)
