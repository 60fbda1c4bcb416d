"""Query registry: importing this package registers every named query.

Modules self-register into :data:`arkflow_spark.queries.base.QUERIES` /
``ORACLE`` via the ``@query`` decorator; ``__spark_entry__.py`` re-exports
them for the driver contract.
"""

from arkflow_spark.queries.base import ORACLE, QUERIES  # noqa: F401

# Import order is unimportant; each module registers on import.
from arkflow_spark.queries import relational  # noqa: F401,E402
from arkflow_spark.queries import stats  # noqa: F401,E402
from arkflow_spark.queries import windows_q  # noqa: F401,E402

for _mod in (
    "tpch",
    "relational2",
    "udf_q",
    "scalar_q",
    "scalar2_q",
    "events_q",
    "text_q",
    "dedup_q",
    "vector_q",
    "multimodal_q",
    "streaming_q",
    "ml_q",
):
    try:  # modules land incrementally; missing ones are fine, bugs are not
        __import__(f"arkflow_spark.queries.{_mod}")
    except ModuleNotFoundError as e:
        if e.name != f"arkflow_spark.queries.{_mod}":
            raise
