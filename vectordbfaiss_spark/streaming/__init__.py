from vectordbfaiss_spark.streaming.ingest_stream import (  # noqa: F401
    stream_ingest_text,
    stream_windowed_event_counts,
)
