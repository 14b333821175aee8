from crankshaft_spark.streaming.ingest import (  # noqa: F401
    stream_cell_density,
    stream_quality_screen,
)
