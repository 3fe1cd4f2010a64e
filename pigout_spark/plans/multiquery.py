"""Multi-sink scan sharing — the MultiQueryOptimizer analog
(SURVEY.md §4.1, hard-point H5).

A Pig script with several STOREs runs as one plan with shared scans
(Pig's MultiQueryOptimizer merges the MR DAGs).  Spark re-executes the
lineage per action, so a script like

    A = LOAD ...; B = FILTER A ...; STORE B ...; C = GROUP A ...; STORE C ...

would scan A twice.  ``MultiSinkPlan`` persists the shared parent(s)
for the duration of the sinks and unpersists after — library-level, no
Catalyst rule needed.

At scale, prefer MEMORY_AND_DISK (the default here): a 100 TB shared
input won't fit in memory and silently recomputing is worse than
spilling.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class MultiSinkPlan:
    """Share computed sub-DAGs across multiple sink actions.

        plan = MultiSinkPlan(shared=[filtered_lineitem])
        with plan:
            store(branch_a, ...)   # both reuse the persisted parent
            store(branch_b, ...)
    """

    def __init__(
        self,
        shared: list[DataFrame],
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    ) -> None:
        self._shared = shared
        self._level = storage_level

    def __enter__(self) -> "MultiSinkPlan":
        for df in self._shared:
            df.persist(self._level)
        return self

    def __exit__(self, *exc) -> None:
        for df in self._shared:
            df.unpersist()


def store_many(
    shared: DataFrame,
    sinks: list[Callable[[DataFrame], None]],
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> None:
    """Run every sink action against a persisted ``shared`` parent —
    the one-parent/many-STOREs shape of a typical multi-sink script."""
    with MultiSinkPlan([shared], storage_level):
        for sink in sinks:
            sink(shared)
