"""Azure connector configuration builders (offline-testable).

The reference wires its Azure connectors with hand-assembled option
maps and conf keys scattered across notebooks and Terraform
(goldToCosmosdb.scala:6-16, goldToSynapse.scala:1-16,
k8s/resources/resources_2/linked_services.tf:1-8). This module captures
those shapes as pure functions: each returns the exact option/conf
dictionary the corresponding Spark connector expects, so the engine's
generic sinks (``sources/document.py``, ``sources/warehouse.py``,
``sources/jdbc.py``) can run against Azure by passing the result
through unchanged. No function here performs IO — everything is
unit-testable without Azure, and nothing below is imported by any
local execution path.

Secrets are the caller's problem by design: these builders take keys
as arguments and never read env vars or files, so credential handling
stays in one auditable place in the calling application.
"""

from __future__ import annotations

# ------------------------------------------------------------ path schemes


def abfss_path(container: str, account: str, path: str = "") -> str:
    """ADLS Gen2 URI (`abfss://container@account.dfs.core.windows.net/...`)."""
    p = path.lstrip("/")
    return f"abfss://{container}@{account}.dfs.core.windows.net/{p}"


def wasbs_path(container: str, account: str, path: str = "") -> str:
    """Blob-storage URI, the scheme the reference's tempDir uses
    (goldToSynapse.scala:12)."""
    p = path.lstrip("/")
    return f"wasbs://{container}@{account}.blob.core.windows.net/{p}"


# ------------------------------------------------------- storage credentials


def storage_account_key_conf(account: str, key: str, gen2: bool = True) -> dict[str, str]:
    """Hadoop conf entries for account-key auth — the
    ``sc.hadoopConfiguration.set("fs.azure.account.key...")`` pattern
    (goldToSynapse.scala:15-17), plus the dfs endpoint for abfss."""
    conf = {f"fs.azure.account.key.{account}.blob.core.windows.net": key}
    if gen2:
        conf[f"fs.azure.account.key.{account}.dfs.core.windows.net"] = key
    return conf


# ------------------------------------------------------------------- Cosmos


def cosmos_options(
    endpoint: str,
    key: str,
    database: str,
    container: str,
    infer_schema: bool = True,
) -> dict[str, str]:
    """Option map for ``format("cosmos.oltp")`` reads/writes — the exact
    keys of the reference's cfg map (goldToCosmosdb.scala:6-12). Use
    with ``write_documents(..., fmt="cosmos.oltp", **cosmos_options(...))``."""
    return {
        "spark.cosmos.accountEndpoint": endpoint,
        "spark.cosmos.accountKey": key,
        "spark.cosmos.database": database,
        "spark.cosmos.container": container,
        "spark.cosmos.read.inferSchema.enabled": str(infer_schema).lower(),
    }


def cosmos_catalog_conf(
    endpoint: str, key: str, catalog: str = "cosmosCatalog"
) -> dict[str, str]:
    """Spark-3 catalog plugin registration (S7, goldToCosmosdb.scala:14-16);
    apply via ``session_builder`` configs or ``spark.conf.set``."""
    return {
        f"spark.sql.catalog.{catalog}": "com.azure.cosmos.spark.CosmosCatalog",
        f"spark.sql.catalog.{catalog}.spark.cosmos.accountEndpoint": endpoint,
        f"spark.sql.catalog.{catalog}.spark.cosmos.accountKey": key,
    }


# ------------------------------------------------------------------ Synapse


def sqlserver_jdbc_url(
    server: str,
    database: str,
    user: str,
    password: str,
    port: int = 1433,
    encrypt: bool = True,
) -> str:
    """SQL Server / Synapse JDBC URL in the reference's shape
    (goldToSynapse.scala:8-10, linked_services.tf:1-8)."""
    extra = (
        "encrypt=true;trustServerCertificate=true;"
        "hostNameInCertificate=*.database.windows.net;loginTimeout=30;"
        if encrypt
        else ""
    )
    return (
        f"jdbc:sqlserver://{server}:{port};database={database};"
        f"user={user};password={password};{extra}"
    )


def synapse_sqldw_options(jdbc_url: str, table: str, temp_dir: str) -> dict[str, str]:
    """Option map for the staged ``com.databricks.spark.sqldw`` writer
    (goldToSynapse.scala:39-46): parquet staged to ``temp_dir``, COPY'd
    into ``table`` by the warehouse — the same staged-copy pattern
    ``sources/warehouse.write_warehouse(mode="staged")`` implements
    locally."""
    return {
        "url": jdbc_url,
        "forwardSparkAzureStorageCredentials": "true",
        "dbTable": table,
        "tempDir": temp_dir,
    }
