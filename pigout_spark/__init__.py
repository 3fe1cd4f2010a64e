"""pigout_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of PigOut (kyunghoj/pigout).

PigOut is a federation layer over Apache Pig: its query surface IS Pig
Latin's (relations/bags/tuples/maps, LOAD/STORE, FOREACH, FILTER, GROUP/
COGROUP, JOIN variants, ORDER/RANK/LIMIT, UNION, CUBE, builtin EvalFuncs)
plus a dataset catalog spanning multiple clusters.  See SURVEY.md.

This engine re-expresses that surface Spark-first:

- declarative DataFrame/SQL plans (Catalyst plans the physical strategy),
- the federation layer collapses to a table registry whose URIs may point
  at many clusters (one SparkSession reads them all),
- Pig's physical machinery (combiners, spillable bags, skew handling,
  sample+range-partition sort) is subsumed by Tungsten/AQE.

Layout:
    session     SparkSession factory with scale-oriented defaults
    catalog     dataset registry (the PigOut catalog analog)
    functions   Pig builtin-function semantics over pyspark.sql.functions
    operators   relational operator helpers (joins, grouping, sorting, ...)
    pipeline    training-data extensions (dedup, similarity, text, multimodal)
    streaming   beyond-reference streaming surface (windows, stateful)
"""

from pigout_spark.session import get_spark
from pigout_spark.catalog import Catalog, load_table

__all__ = ["get_spark", "Catalog", "load_table"]
__version__ = "0.1.0"
