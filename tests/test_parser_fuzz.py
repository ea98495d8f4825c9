"""Property-based parser fuzzing (SURVEY.md section 5 plan): random field
values, random ``-`` placement, unicode -- parse never crashes, typed fields
round-trip, null sentinel always maps to NULL."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_cloudfront_realtime_monitoring_spark.schema import CF_FIELDS, storage_name
from aws_cloudfront_realtime_monitoring_spark.sources import parse_log_lines
from aws_cloudfront_realtime_monitoring_spark.sources.cf_logs import to_wire_line
from tests.test_parser import lines_df

# strings must avoid the wire format's structural chars (tab/newline) and the
# lone '-' sentinel; CloudFront URL-encodes payload fields so this matches
# reality.
safe_str = (
    st.text(
        # no control chars (Cc): the CSV reader trims ALL chars <= 0x20 at
        # token edges (documented deviation from the reference's .strip(),
        # which removes only whitespace; CloudFront URL-encodes fields so
        # raw control chars never occur on real wires)
        alphabet=st.characters(
            blacklist_characters="\t\n\r", blacklist_categories=("Cs", "Cc")
        ),
        min_size=1,
        max_size=24,
    )
    # parser trims token edges (reference .strip() parity) -- normalize the
    # expectation; interior whitespace stays covered
    .map(lambda s: s.strip())
    .filter(lambda s: s not in ("", "-"))
)


def field_value(name: str, typ: str):
    absent = st.none()
    if typ == "int":
        return st.one_of(absent, st.integers(min_value=-(2**40), max_value=2**40))
    if typ == "float":
        if name == "timestamp":
            return st.floats(min_value=1.0e9, max_value=2.0e9).map(
                lambda f: round(f, 3)
            )
        return st.one_of(
            absent,
            st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
            ).map(lambda f: round(f, 6)),
        )
    return st.one_of(absent, safe_str)


record_strategy = st.fixed_dictionaries(
    {name: field_value(name, typ) for name, typ in CF_FIELDS}
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(record_strategy, min_size=1, max_size=6))
def test_fuzzed_lines_roundtrip(spark, records):
    # unique timestamps by construction: the parsed-row <-> record matching
    # below keys on timestamp. Integer parts are reassigned (generated ones
    # can collide even after offsetting); the generated fractional part is
    # kept so sub-second parsing stays fuzzed.
    records = [
        dict(r, timestamp=1.5e9 + i * 7 + round(r["timestamp"] % 1, 3))
        for i, r in enumerate(records)
    ]
    lines = [to_wire_line(r) for r in records]
    rows = (
        parse_log_lines(lines_df(spark, *lines))
        .orderBy("timestamp", "c_ip")
        .collect()
    )
    assert len(rows) == len(records)
    # re-derive expected per parsed row via its reconstructed key fields
    for row in rows:
        matches = [
            r
            for r in records
            if (r["timestamp"] is not None)
            and abs(row.timestamp.timestamp() - r["timestamp"]) < 0.002
        ]
        assert matches, "parsed row lost its timestamp"
        r = matches[0]
        for name, typ in CF_FIELDS:
            col = storage_name(name)
            if col in ("cs_headers", "cs_header_names", "timestamp"):
                continue
            got = getattr(row, col)
            want = r[name]
            if want is None:
                assert got is None, f"{col}: sentinel must parse to NULL"
            elif typ == "int":
                assert got == want
            elif typ == "float":
                assert got is not None and math.isclose(got, want, rel_tol=1e-9)
            else:
                assert got == want
