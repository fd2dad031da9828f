"""K4: document-store sink (CosmosDB-shaped, locally JSON).

The reference's serving write (goldToCosmosdb.scala:26-38) requires an
all-string frame plus a unique string ``id`` and appends via the
``cosmos.oltp`` connector. The engine models the *semantics* —
``prepare_documents`` — separately from the transport:

- locally / in tests: ``format("json")`` directory sink (one JSON doc
  per row, same shape Cosmos stores);
- on Azure: pass ``fmt="cosmos.oltp"`` + connector options through
  unchanged (option passthrough documented, untested offline —
  SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from azure_etl_spark.operators.derive import add_id, cast_all


def prepare_documents(
    df: DataFrame, id_col: str = "id", deterministic_order: list[str] | None = None
) -> DataFrame:
    """goldToCosmosdb.scala:26-33: synthetic id + cast-all-string.

    Default id is monotonically_increasing_id (parallel, scale-safe);
    pass deterministic_order for reproducible serving outputs.
    """
    return cast_all(add_id(df, name=id_col, deterministic_order=deterministic_order))


def write_documents(
    df: DataFrame,
    path_or_container: str,
    mode: str = "append",
    fmt: str = "json",
    prepare: bool = True,
    **options: str,
) -> None:
    out = prepare_documents(df) if prepare else df
    w = out.write.mode(mode).format(fmt)
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path_or_container)


def read_documents(spark: SparkSession, path: str, fmt: str = "json", **options: str) -> DataFrame:
    r = spark.read.format(fmt)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)
