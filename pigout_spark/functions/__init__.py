"""Pig builtin-function surface (SURVEY.md §2.7) over pyspark.sql.functions.

Everything here is a thin, JVM-side Column expression — no Python UDFs —
so the whole layer stays inside whole-stage codegen.  The wrappers exist
to preserve *Pig's* semantics where they differ from Spark's (divergence
D4: 0-based/stop-exclusive string indexing; REPLACE-is-regex; TOKENIZE's
delimiter class; CONCAT null propagation is already identical).
"""

from pigout_spark.functions.strings import (
    CONCAT,
    ENDSWITH,
    EQUALS_IGNORE_CASE,
    INDEXOF,
    LAST_INDEX_OF,
    LCFIRST,
    LOWER,
    LTRIM,
    REGEX_EXTRACT,
    REGEX_EXTRACT_ALL,
    REPLACE,
    RTRIM,
    SPRINTF,
    STARTSWITH,
    STRSPLIT,
    STRSPLITTOBAG,
    SUBSTRING,
    TOKENIZE,
    TRIM,
    UCFIRST,
    UNIQUE_ID,
    UPPER,
)
from pigout_spark.functions.datetime_fns import (
    ADD_DURATION,
    CURRENT_TIME,
    DAYS_BETWEEN,
    GET_DAY,
    GET_HOUR,
    GET_MINUTE,
    GET_MONTH,
    GET_SECOND,
    GET_WEEK,
    GET_YEAR,
    HOURS_BETWEEN,
    MILLISECONDS_BETWEEN,
    MINUTES_BETWEEN,
    MONTHS_BETWEEN,
    SECONDS_BETWEEN,
    SUBTRACT_DURATION,
    TO_DATE,
    TO_STRING,
    TO_UNIX_TIME,
    YEARS_BETWEEN,
)
from pigout_spark.functions.math_fns import ROUND_TO
from pigout_spark.functions.bags import (
    BAG_TO_STRING,
    DIFF,
    IS_EMPTY,
    KEYSET,
    SIZE,
    SUBTRACT,
    TO_BAG,
    TO_MAP,
    TO_TUPLE,
    VALUELIST,
    VALUESET,
)

__all__ = [n for n in dir() if n.isupper()]
