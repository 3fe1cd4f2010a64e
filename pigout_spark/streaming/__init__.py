"""Streaming surface — beyond-reference extension (SURVEY.md §2.8).

The reference stack is batch MapReduce: Pig/PigOut have no streams,
watermarks, or stateful operators.  This package adds the Structured
Streaming surface a modern pipeline needs; every windowed aggregation is
expressed so the SAME code runs in batch mode (how the DuckDB oracle
checks it) and in a readStream/writeStream pipeline.
"""

from pigout_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
    with_watermark,
)
from pigout_spark.streaming.stateful import sessionize_stateful

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "with_watermark",
    "sessionize_stateful",
]
