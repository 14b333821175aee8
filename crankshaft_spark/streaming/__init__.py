from crankshaft_spark.streaming.dedup import (  # noqa: F401
    stream_dedup_exact,
    stream_dedup_near,
)
from crankshaft_spark.streaming.ingest import (  # noqa: F401
    stream_cell_density,
    stream_quality_screen,
)
from crankshaft_spark.streaming.sessions import (  # noqa: F401
    sessionize,
    sessionize_batch,
)
