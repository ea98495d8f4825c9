"""PySpark-native analytics engine with the capabilities of
aws-samples/aws-cloudfront-realtime-monitoring.

The reference is a serverless pipeline (CloudFront realtime logs -> Kinesis ->
Lambda parser -> Amazon Timestream -> Timestream SQL / Grafana). This package
re-expresses the same data model and query surface Spark-first:

- ``schema``     -- the 40-field CloudFront realtime-log schema (typed, wide).
- ``sources``    -- TSV wire-format parser (batch + streaming), parquet loaders.
- ``functions``  -- Timestream SQL sugar (``bin``, ``ago``,
                    ``create_time_series``), Grafana macro expansion, shared
                    deterministic hashing.
- ``operators``  -- narrow (Timestream-shaped) view, dedup family (exact,
                    MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine),
                    similarity search, text analysis, multimodal column
                    plumbing.
- ``plans``      -- the query registry: every supported query as a DataFrame
                    builder plus its ANSI-SQL oracle.
- ``streaming``  -- Structured Streaming ingest mirroring the reference's
                    Kinesis->Lambda->Timestream hot path.
"""

__version__ = "0.1.0"
