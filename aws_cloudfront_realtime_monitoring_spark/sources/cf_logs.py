"""CloudFront realtime-log wire-format parser, Spark-first.

The reference parses one record at a time in Python inside a Lambda
(``log-processor/lambda_function.py:66-119``): base64 -> bytes -> str ->
``split('\\t')`` -> positional zip against an ordered field->type config ->
per-field cast with a ``-`` null sentinel -> drop header columns -> rename
``-``->``_``. Here the whole chain is declarative Catalyst expressions --
one ``from_csv`` call performs tokenize + positional schema apply + cast +
null-sentinel handling for every row, JVM-side, inside whole-stage codegen.
The same function works identically on a batch DataFrame and a streaming
DataFrame (Structured Streaming), which is how the engine scales the
reference's 1-shard/1000-rec-s ceiling to a 1000-executor cluster: the parse
is a narrow map, no shuffle.

Deliberate deviations (SURVEY.md section 7, D2-D4):
- ``-`` parses to true SQL NULL (reference keeps the literal string,
  lambda_function.py:85-86); ``strict_compat`` in the narrow view re-renders.
- millisecond precision kept (reference truncates to seconds, :115-116).
- UTF-8 payload decode (reference's ``"".join(map(chr, b))`` is Latin-1,
  :72); both agree on CloudFront's URL-encoded payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import CF_FIELDS, DROPPED_BY_DEFAULT, storage_name, wire_ddl


def decode_kinesis_payload(col: Column, charset: str = "UTF-8") -> Column:
    """Kinesis envelope payload -> text line (A2+A3).

    Reference: base64-decode (lambda_function.py:69) then per-byte chr()
    join (:72, accidental Latin-1). Pass ``charset='ISO-8859-1'`` for
    byte-exact reference behavior on non-ASCII payloads.
    """
    return F.decode(F.unbase64(col), charset)


def _csv_options() -> dict:
    # quote disabled: the wire format is raw TSV, no quoting/escaping.
    return {
        "sep": "\t",
        "quote": "",
        "nullValue": "-",          # null sentinel, lambda_function.py:85-86 (D2)
        "mode": "PERMISSIVE",
        # the reference strips every token (lambda_function.py:81-93
        # `.strip()` on each field); trim on both edges to match. Note the
        # CSV reader trims every char <= 0x20 (incl. control chars) where
        # Python strip() removes only whitespace -- immaterial on real
        # CloudFront wires (fields are URL-encoded).
        "ignoreLeadingWhiteSpace": "true",
        "ignoreTrailingWhiteSpace": "true",
    }


def parse_cs_headers(col: Column) -> Column:
    """Encoded ``cs-headers`` -> array<struct<Name,Value>> (A9).

    Reference: URL-decode, split on ``\\n``, drop empties, split each on the
    FIRST ``:`` only, skip entries without ``:``
    (lambda_function.py:40-49). Golden shape: test.json:39-72.
    """
    lines = F.filter(
        F.split(F.url_decode(col), "\n"),
        lambda x: (x != F.lit("")) & x.contains(":"),
    )
    return F.transform(
        lines,
        lambda x: F.struct(
            F.split_part(x, F.lit(":"), F.lit(1)).alias("Name"),
            F.substr(x, F.instr(x, ":") + F.lit(1)).alias("Value"),
        ),
    )


def parse_cs_header_names(col: Column) -> Column:
    """Encoded ``cs-header-names`` -> array<string> (A10,
    lambda_function.py:50-52; golden shape test.json:73-82)."""
    return F.filter(F.split(F.url_decode(col), "\n"), lambda x: x != F.lit(""))


def parse_log_lines(
    lines: DataFrame,
    value_col: str = "value",
    drop_headers: bool = True,
    parse_headers: bool = False,
    sample_fraction: float | None = None,
    sample_seed: int = 42,
) -> DataFrame:
    """Raw TSV-line DataFrame -> wide typed CloudFront log DataFrame.

    One expression chain covering reference operators A4-A15:
    tokenize+schema+cast via ``from_csv`` (A4-A8), header parsing (A9-A10) or
    drop (A11), rename (A12), timestamp conversion (A15 sans truncation).
    ``sample_fraction`` mirrors CloudFront's source-side sampling
    (template.yaml:9-14; A19) -- applied BEFORE parsing, like the edge
    applies it before emitting.

    Works on batch and streaming DataFrames alike.
    """
    if sample_fraction is not None:
        # Hash-based sampling instead of .sample(): works identically on
        # batch AND streaming DataFrames (sample() is unsupported on
        # streams), and is deterministic per record -- replay/retry safe,
        # which at-scale ingest wants anyway. The reference's sampling is
        # random at the edge (template.yaml:9-14); keyed sampling preserves
        # the rate while making tests and backfills reproducible.
        bucket = F.pmod(
            F.hash(F.col(value_col), F.lit(sample_seed)), F.lit(1_000_000)
        )
        lines = lines.where(bucket < int(sample_fraction * 1_000_000))

    parsed = lines.select(
        F.from_csv(F.col(value_col), wire_ddl(), _csv_options()).alias("r")
    ).select("r.*")

    # Rename every wire field to its storage name (A12) and convert the
    # float epoch-seconds timestamp to a true TIMESTAMP keeping ms (A15/D3).
    cols: list[Column] = []
    for wire_name, _ in CF_FIELDS:
        col = storage_name(wire_name)
        if wire_name == "timestamp":
            cols.append(F.timestamp_seconds(F.col("`timestamp`")).alias("timestamp"))
        elif wire_name == "cs-headers" and parse_headers:
            cols.append(parse_cs_headers(F.col("`cs-headers`")).alias(col))
        elif wire_name == "cs-header-names" and parse_headers:
            cols.append(parse_cs_header_names(F.col("`cs-header-names`")).alias(col))
        else:
            cols.append(F.col(f"`{wire_name}`").alias(col))
    out = parsed.select(*cols)

    if drop_headers and not parse_headers:
        # Reference deletes both header fields pre-ingest for cost
        # (lambda_function.py:96-101, README.md:31).
        out = out.drop(*DROPPED_BY_DEFAULT)
    return out


def to_wire_line(row: dict) -> str:
    """Inverse helper for tests/fixtures: typed dict (wire names) -> one
    TSV line, absent values rendered as the ``-`` sentinel."""
    toks = []
    for name, _ in CF_FIELDS:
        v = row.get(name)
        toks.append("-" if v is None else str(v))
    return "\t".join(toks)
