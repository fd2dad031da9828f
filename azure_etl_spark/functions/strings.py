"""String functions (SURVEY.md §2.9 F3-F5).

The reference scrapes CI logs with Python ``re``/``str`` chains
(etl-vini-azure.py:134,175-180); the engine's equivalents are the
vectorized JVM built-ins — regexp_extract / regexp_replace / trim /
split — which stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def regex_extract(col: str | Column, pattern: str, group: int = 1) -> Column:
    """F3 (etl-vini-azure.py:175-176)."""
    return F.regexp_extract(col, pattern, group)


def clean_token(col: str | Column) -> Column:
    """F4: trim + strip quotes/spaces (etl-vini-azure.py:179-180)."""
    return F.regexp_replace(F.trim(col), r'["\s]', "")


def split_get(col: str | Column, sep: str, index: int) -> Column:
    """F5: split chain ``x.split(sep)[i]`` (etl-vini-azure.py:134).
    Negative index counts from the end (element_at semantics)."""
    arr = F.split(col, sep)
    return F.element_at(arr, index + 1 if index >= 0 else index)
