from crankshaft_spark.streaming.ingest import (  # noqa: F401
    stream_cell_density,
    stream_quality_screen,
)
from crankshaft_spark.streaming.sessions import sessionize  # noqa: F401
