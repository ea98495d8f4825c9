from .ingest import (  # noqa: F401
    stream_log_lines,
    hourly_bytes_stream,
    dedup_stream,
    write_partitioned_parquet,
    run_to_memory_sink,
)
