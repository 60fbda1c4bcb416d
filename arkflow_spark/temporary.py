"""Lookup ("temporary") tables: stream-side enrichment joins.

Reference: trait Temporary::get(keys) (crates/arkflow-core/src/temporary/
mod.rs:40-44) + the SQL processor's fetch-register-join flow
(processor/sql.rs:148-183) with key expressions evaluated against the batch
(crates/arkflow-plugin/src/expr/mod.rs). The redis implementation
(temporary/redis.rs) is a keyed KV fetch.

Spark-first mapping: the lookup is a DataFrame (inline rows, file, or JDBC),
optionally key-filtered by a SQL expression over the batch (a semi join —
the distributed analog of MGET on the batch's keys), registered as a temp
view for the user's join SQL, and broadcast when small.

Interface: ``register(session, batch_df) -> None``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arkflow_spark.registry import TEMPORARIES


class _BaseTemporary:
    def __init__(self, conf: dict):
        self.name = conf["name"]
        # key expression evaluated against the batch (expr/mod.rs parity);
        # key_column names the lookup-side column holding the same key
        self.key_expr = conf.get("key_expr")
        self.key_column = conf.get("key_column")
        self.broadcast = bool(conf.get("broadcast", True))

    def _load(self, session: SparkSession) -> DataFrame:
        raise NotImplementedError

    def register(self, session: SparkSession, batch_df: DataFrame) -> None:
        lookup = self._load(session)
        if self.key_expr and self.key_column:
            keys = batch_df.select(
                F.expr(self.key_expr).alias("__key__")
            ).distinct()
            lookup = lookup.join(
                F.broadcast(keys),
                lookup[self.key_column] == keys["__key__"],
                "left_semi",
            )
        if self.broadcast:
            lookup = F.broadcast(lookup)
        lookup.createOrReplaceTempView(self.name)


@TEMPORARIES.register("static")
class StaticTemporary(_BaseTemporary):
    """Inline rows: ``rows`` (list of dicts) + ``schema`` (DDL)."""

    def __init__(self, conf: dict):
        super().__init__(conf)
        self.rows = conf["rows"]
        self.schema = conf["schema"]

    def _load(self, session: SparkSession) -> DataFrame:
        return session.createDataFrame(
            [tuple(r.values()) if isinstance(r, dict) else tuple(r) for r in self.rows],
            self.schema,
        )


@TEMPORARIES.register("file")
class FileTemporary(_BaseTemporary):
    """File-backed lookup (parquet/csv/json) refreshed per batch —
    the replacement for the reference's redis KV table."""

    def __init__(self, conf: dict):
        super().__init__(conf)
        self.path = conf["path"]
        self.format = conf.get("format", "parquet")
        self.options = dict(conf.get("options", {}))

    def _load(self, session: SparkSession) -> DataFrame:
        r = session.read.format(self.format)
        for k, v in self.options.items():
            r = r.option(k, v)
        return r.load(self.path)


@TEMPORARIES.register("jdbc")
class JdbcTemporary(_BaseTemporary):
    """JDBC-backed lookup (needs driver jar on classpath)."""

    def __init__(self, conf: dict):
        super().__init__(conf)
        self.url = conf["url"]
        self.table = conf["table"]

    def _load(self, session: SparkSession) -> DataFrame:
        return (
            session.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .load()
        )
