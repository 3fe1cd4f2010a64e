"""Data model & type system mapping (SURVEY.md §1) + the divergence
register (D1–D5) as code.

Pig's model: relation = outer bag of tuples; fields may be bags, tuples,
or string-keyed maps; schemas optional/gradual with `bytearray` as the
undeclared default that lazily casts at first use.  Spark's model:
always-schematized DataFrames.  This module pins the type mapping used
everywhere (latin.py AS-clauses, io.py schemas) and provides the
explicit-cast helper that replaces gradual typing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Pig type → Spark DDL type (SURVEY.md §1.2).  D3: biginteger/bigdecimal
#: (arbitrary precision) are bounded to DECIMAL(38,*) — documented.
PIG_TO_SPARK_TYPE: dict[str, str] = {
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "chararray": "string",
    "bytearray": "binary",
    "boolean": "boolean",
    "datetime": "timestamp",
    "biginteger": "decimal(38,0)",
    "bigdecimal": "decimal(38,18)",
    # nested types parameterize: bag{...} → array<struct<...>>,
    # tuple(...) → struct<...>, map[] → map<string, T> (§1.1)
}

#: Divergence register — the engine documents these, never hides them.
DIVERGENCES: dict[str, str] = {
    "D1": "variable-arity tuples → fixed StructType (schemaless mode "
          "narrowed to schema-on-read)",
    "D2": "bytearray gradual typing (lazy cast at first use) → explicit "
          "cast at point of use (lazy_cast below)",
    "D3": "biginteger/bigdecimal unbounded precision → DECIMAL(38,*)",
    "D4": "0-based, stop-exclusive string indexing → wrapped in "
          "functions/strings.py so user-facing semantics match Pig",
    "D5": "federation by plan partitioning (PigOut) → federation by "
          "cross-cluster reads in one Spark plan (catalog.py)",
}


def lazy_cast(col: Column | str, pig_type: str) -> Column:
    """D2 replacement for Pig's implicit bytearray→T cast: the explicit
    cast a LoadTypeCastInserter would have inserted.  Accepts Pig type
    names."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(PIG_TO_SPARK_TYPE.get(pig_type.lower(), pig_type))


def positional(df: DataFrame, i: int) -> Column:
    """Pig `$i` positional field access on any relation."""
    return F.col(df.columns[i])


def describe(df: DataFrame) -> str:
    """Pig DESCRIBE: the inferred/declared schema of a relation."""
    return df.schema.simpleString()
