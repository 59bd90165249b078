"""Query registry: every operator's showcase query + its DuckDB oracle.

Each module defines ``QUERIES: dict[str, QuerySpec]``; ``registry.py``
merges them into the single dict ``__spark_entry__.py`` exposes to the
driver. A ``QuerySpec`` pairs a Spark callable ``(spark, sf_dir) ->
DataFrame`` with the ANSI-SQL string DuckDB runs on the same parquet
tables (or ``None`` for non-SQL-expressible / approximate ops, which
get a rows-only check).

Oracle-parity ground rules (see SURVEY.md §7 hard parts):
- column names identical on both sides (alias everything);
- no raw timestamps/dates in outputs — format to strings (UTC);
- exact big sums via decimal accumulation cast back to double;
- every LIMIT/top-k ordered by a unique tiebreak on both sides;
- regexes must behave identically under Java regex and RE2 (no
  lookbehind/lookahead in anything oracle-checked).
"""
