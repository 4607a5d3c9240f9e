from vectordbfaiss_spark.sources.ingest import (  # noqa: F401
    chunk_documents,
    ingest_text_dir,
    load_text_dir,
    write_dedup_append,
)
