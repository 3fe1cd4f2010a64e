"""Query corpus: one named query per implemented operator (SURVEY.md §2,
§5) plus the training-data pipeline extensions (§7 phase 7).

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with
an equivalent ANSI-SQL oracle string for DuckDB.  The driver hash-compares
them at sf0.01 — that is the correctness gate.  Entries without SQL get a
weaker rows-only check (genuinely non-SQL-expressible ops only).
"""

from pigout_spark.queries.registry import REGISTRY, Q, query  # noqa: F401

# Importing the modules populates REGISTRY via the @query decorator.
from pigout_spark.queries import core  # noqa: F401,E402
from pigout_spark.queries import functions_q  # noqa: F401,E402
from pigout_spark.queries import pipeline_q  # noqa: F401,E402
from pigout_spark.queries import streaming_q  # noqa: F401,E402
from pigout_spark.queries import udf_q  # noqa: F401,E402


def queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
