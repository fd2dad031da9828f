"""azure_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL (camposvinicius/azure-etl): medallion
batch pipeline (ingest -> bronze -> silver -> gold -> serving) plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.

Everything is declared through the DataFrame API so Catalyst/Tungsten pick
the physical strategy; Python UDFs appear only where built-ins genuinely
cannot express the semantics (and then always Arrow-batched).
"""

from azure_etl_spark.session import get_session, session_builder

__all__ = ["get_session", "session_builder"]
__version__ = "0.1.0"
