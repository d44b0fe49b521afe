"""EDTF (Extended Date/Time Format) helpers — native Columns.

The reference stores dates as EDTF strings in WOF properties
(`edtf:deprecated`, process.go:351-356 writes today's date; the
deprecated filter matches any value, whosonfirst/iterator.go:38-41) and
compares record recency via int64 `wof:lastmodified`
(process.go:268-332). This module gives the engine real EDTF ordering
semantics (SURVEY §2.8 X9) instead of raw string compare:

- level-0/1 dates ``YYYY``, ``YYYY-MM``, ``YYYY-MM-DD``
- uncertainty/approximation qualifiers ``? ~ %`` (stripped for ordering)
- unknown/open values ``uuuu``, ``..``, ``open``, ``''`` -> NULL
  (sort last under NULLS LAST, i.e. never win a recency contest)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNKNOWN = ("", "uuuu", "..", "open")


def edtf_sort_key(col: Column | str) -> Column:
    """Sortable ``YYYY-MM-DD`` key for an EDTF string column; missing
    month/day pad to '00' (so '2021' < '2021-01' < '2021-01-01' — the
    EDTF level-0 containment order); unknown/open -> NULL."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.trim(c), r"[?~%]", "")
    year = F.regexp_extract(cleaned, r"^(-?\d{4})", 1)
    month = F.regexp_extract(cleaned, r"^-?\d{4}-(\d{2})", 1)
    day = F.regexp_extract(cleaned, r"^-?\d{4}-\d{2}-(\d{2})", 1)
    key = F.concat_ws(
        "-",
        year,
        F.when(month == "", "00").otherwise(month),
        F.when(day == "", "00").otherwise(day),
    )
    return F.when(
        c.isNull() | cleaned.isin(*_UNKNOWN) | (year == ""),
        F.lit(None).cast("string"),
    ).otherwise(key)


def edtf_is_deprecated(col: Column | str) -> Column:
    """The F2 predicate: ANY present (non-null) value marks the record
    deprecated — INCLUDING the unknown sentinels ``uuuu``/``..``/
    ``open``/``''`` — matching the reference's any-value regex filter
    ``?exclude=properties.edtf:deprecated=.*`` (whosonfirst/
    iterator.go:38-41): a writer that stored 'uuuu' meant "deprecated
    at an unknown date", not "not deprecated". (The unknown sentinels
    map to NULL only for ORDERING, in ``edtf_sort_key``.) This is also
    exactly the filter read_geojson_dir applies (`IS NULL`) and the
    WOF oracle reproduces.

    The reference carries TWO deprecation semantics (ADVICE r4): this
    iterator-parity one (`=.*` regex — empty string counts), and the
    duplicates-survivorship check (process.go uses ``d != ""`` — empty
    string does NOT count). Use this predicate for ingest exclusion;
    use :func:`edtf_is_deprecated_strict` for the resolve pre-filter /
    deprecated-side-loses precedence column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull()


def edtf_is_deprecated_strict(col: Column | str) -> Column:
    """The survivorship-side deprecation check: present AND non-empty
    — parity with the reference's duplicates precedence rule (a)
    deprecated-side-loses, which tests ``d != ""`` (process.go), NOT
    the iterator's any-present-value regex. Pass as the leading
    ``not_deprecated`` column of ``resolve_clusters(order_cols=...)``
    via ``~edtf_is_deprecated_strict(...)``. Exact ``d != ""``: a
    whitespace-only value IS deprecated (Go compares the raw string —
    trimming first would flip survivor choice on records carrying
    ``edtf:deprecated=' '``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (c != "")
