"""SQL-surface registration of the engine's text metrics.

Spark 4 SQL scalar UDFs (``CREATE TEMPORARY FUNCTION ... RETURNS ...
RETURN <expr>``) with pure SQL expression bodies: they inline into the
Catalyst plan with full whole-stage codegen — nothing crosses the
Python boundary — so ``spark.sql`` users get the same deterministic
metrics the DataFrame operators compute, at identical cost.

Bodies are hand-mirrored from operators/text.py; the equivalence test
(tests/test_sql_udfs.py) compares every function against its DataFrame
twin on the fixture corpus, so drift cannot ship silently.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# token count of raw text (empty/whitespace-only -> 0), used inline in
# the quality body because a SQL UDF body is one expression
_TOK = "CASE WHEN length(trim({t})) = 0 THEN 0 ELSE size(split(trim({t}), '\\\\s+')) END"

_DDL = [
    # normalized content form (lowercase, collapsed whitespace, trimmed)
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_norm_text(t STRING)
       RETURNS STRING
       RETURN trim(regexp_replace(lower(t), '\\\\s+', ' '))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION eng_token_count(t STRING)
       RETURNS INT
       RETURN {_TOK.format(t='t')}""",
    # content fingerprint: md5 of the normalized form
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_fingerprint(t STRING)
       RETURNS STRING
       RETURN md5(trim(regexp_replace(lower(t), '\\\\s+', ' ')))""",
    # heuristic quality in [0,1] — mirrors operators/text.quality_score
    f"""CREATE OR REPLACE TEMPORARY FUNCTION eng_quality(t STRING)
       RETURNS DOUBLE
       RETURN round(
         least(CAST({_TOK.format(t='t')} AS DOUBLE) / 64.0, 1.0) * 0.5
         + CASE WHEN (CASE WHEN {_TOK.format(t='t')} = 0 THEN 0.0
                      ELSE CAST(length(t) AS DOUBLE) / {_TOK.format(t='t')} END)
                 BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END * 0.3
         + (1.0 - CASE WHEN length(t) = 0 THEN 0.0
                  ELSE least(CAST(length(regexp_replace(t, '[^\\\\.,;:!\\\\?]', ''))
                                  AS DOUBLE)
                             / CAST(length(t) AS DOUBLE) * 4.0, 1.0) END) * 0.2,
         6)""",
]


def register_sql_functions(spark: SparkSession) -> None:
    """Install the ``eng_*`` SQL functions into the current session."""
    for ddl in _DDL:
        spark.sql(ddl)
