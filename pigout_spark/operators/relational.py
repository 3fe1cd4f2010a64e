"""Pig per-row operators (SURVEY.md §2.2): FOREACH/GENERATE, FLATTEN,
FILTER, SPLIT, SAMPLE, ASSERT, STREAM THROUGH.

All declarative except STREAM, which by definition runs an external
process — implemented over mapInPandas so rows move in Arrow batches,
not one Python object at a time.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def foreach(df: DataFrame, *exprs: Column | str) -> DataFrame:
    """Pig `FOREACH A GENERATE e1, e2 AS x, ...` → select.  Alias with
    Column.alias, project ranges with df.columns slicing at call site."""
    return df.select(*exprs)


def flatten(df: DataFrame, col: str, outer: bool = False, prefix: str | None = None) -> DataFrame:
    """Pig FLATTEN inside GENERATE.

    - bag/array column → one row per element (empty bag drops the row;
      `outer=True` keeps it with nulls — explode vs explode_outer),
    - tuple/struct column → fields become top-level columns,
    - map column → (key, value) rows.
    """
    dtype = dict(df.dtypes)[col]
    if dtype.startswith("struct"):
        others = [c for c in df.columns if c != col]
        return df.select(*others, f"{col}.*")
    ex = F.explode_outer if outer else F.explode
    if dtype.startswith("map"):
        others = [c for c in df.columns if c != col]
        kk = f"{prefix or col}_key"
        vv = f"{prefix or col}_value"
        return df.select(*others, ex(col).alias(kk, vv))
    others = [c for c in df.columns if c != col]
    return df.select(*others, ex(col).alias(prefix or col))


def filter_by(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Pig `FILTER A BY p` — `matches` → rlike, CASE → when/otherwise,
    all expressible in the predicate Column."""
    return df.filter(predicate)


def split(df: DataFrame, branches: dict[str, Column], otherwise: str | None = None,
          persist: bool = False) -> dict[str, DataFrame]:
    """Pig `SPLIT A INTO X IF p1, Y IF p2 [, Z OTHERWISE];`

    Rows may match several branches (same as Pig).  Pass ``persist=True``
    when the branches feed separate downstream actions (each action
    rescans the parent otherwise — the MultiQueryOptimizer concern,
    SURVEY.md §4.1/H5) and manage the lifetime with
    ``plans.MultiSinkPlan``: a persist left dangling pollutes Spark's
    global cache — the cached fragment silently substitutes into ANY
    later plan sharing it, e.g. bypassing parquet filter pushdown.
    """
    if persist:
        df = df.persist()
    out = {name: df.filter(pred) for name, pred in branches.items()}
    if otherwise is not None:
        none_match = None
        for pred in branches.values():
            none_match = ~pred if none_match is None else (none_match & ~pred)
        # Pig OTHERWISE: rows where every predicate is false or null.
        out[otherwise] = df.filter(F.coalesce(none_match, F.lit(True)))
    return out


def sample(df: DataFrame, fraction: float, seed: int | None = None) -> DataFrame:
    """Pig `SAMPLE A f` — Bernoulli row sample (Pig rewrites to
    FILTER BY RANDOM() <= f; df.sample is the same semantics)."""
    return df.sample(fraction=fraction, seed=seed)


def hash_sample(
    df: DataFrame, fraction: float, key_cols: list[str], buckets: int = 10_000
) -> DataFrame:
    """Deterministic SAMPLE: keep rows whose md5 bucket of the key
    falls under ``fraction·buckets``.

    The engine-neutral complement to Bernoulli :func:`sample` — md5 is
    identical everywhere, so any engine (DuckDB:
    ``('0x'||substring(md5(k),1,8))::BIGINT % buckets`` over the same
    coalesced key) selects the SAME rows, making the sample
    oracle-checkable, reproducible across runs/partitionings, and
    consistent for the same key across tables (sample orders and their
    lineitems together by sampling both on orderkey).  A narrow per-row
    filter — no shuffle, no state — and the md5 prefix is uniform, so
    the kept fraction concentrates tightly around ``fraction`` at any
    scale.

    NULL key components are coalesced to a ``\\x00`` sentinel BEFORE
    concatenation: ``concat_ws`` would otherwise silently skip NULLs
    (``(NULL,'x')`` and ``('x',NULL)`` collide) while DuckDB's ``||``
    nulls the whole key (NULL-keyed rows dropped by the oracle, kept by
    Spark).  The DuckDB twin is
    ``md5(coalesce(k1::VARCHAR, chr(0)) || '|' || ...)`` — same bytes,
    same rows, on any engine, for nullable keys too.
    """
    key = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in key_cols
        ],
    )
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % buckets
    return df.filter(bucket < int(round(fraction * buckets)))


def assert_by(df: DataFrame, predicate: Column, message: str = "assertion failed") -> DataFrame:
    """Pig `ASSERT A BY p` — job fails if any row violates p.

    Implemented as a filter over assert_true so the check is distributed,
    pipelined, and — crucially — not prunable: a checked-then-dropped
    column would be eliminated by Catalyst before it ever evaluated.
    assert_true returns NULL on success, so isNull keeps every row."""
    return df.filter(F.assert_true(predicate, F.lit(message)).isNull())


def stream_through(df: DataFrame, cmd: list[str], output_schema: str,
                   serializer=None, deserializer=None) -> DataFrame:
    """Pig `STREAM A THROUGH \\`cmd\\`` — pipe rows through an external
    executable with a tab-delimited line protocol (PigStreaming default).

    mapInPandas: a writer thread feeds the subprocess one Arrow batch at
    a time while the main thread reads its stdout incrementally in
    chunks — a true pipe, never the whole partition as one in-memory
    string on either side (a partition holds GBs at 100 TB; peak memory
    here is one Arrow batch + one read chunk).  The subprocess is
    per-partition, matching Pig's one-process-per-task."""
    import subprocess

    def run(batches: Iterable) -> Iterator:
        import io
        import threading

        import pandas as pd

        proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True
        )

        # The writer thread must not die silently: a serialization error
        # mid-feed truncates the subprocess's input, and if the command
        # still exits 0 the task would yield silently-partial output.
        # Captured here and re-raised in the task thread after join().
        feed_err: list[BaseException] = []

        def feed() -> None:
            try:
                for pdf in batches:
                    for row in pdf.itertuples(index=False):
                        proc.stdin.write(
                            "\t".join("" if pd.isna(v) else str(v) for v in row)
                            + "\n"
                        )
            except BrokenPipeError:
                # the command closed stdin early (e.g. `head`) — legal in
                # the Pig streaming protocol, not a feed failure
                pass
            except BaseException as e:  # noqa: BLE001 — re-raised below
                feed_err.append(e)
            finally:
                try:
                    proc.stdin.close()
                except BrokenPipeError:
                    pass

        writer = threading.Thread(target=feed, daemon=True)
        writer.start()
        names = [
            f.strip().replace(":", " ").split()[0] for f in output_schema.split(",")
        ]
        # stream stdout in bounded chunks; emit a pandas batch per chunk
        chunk_rows = 10_000
        buf: list[str] = []
        for line in proc.stdout:
            buf.append(line)
            if len(buf) >= chunk_rows:
                yield pd.read_csv(
                    io.StringIO("".join(buf)), sep="\t", names=names,
                    header=None, dtype=str,
                )
                buf = []
        writer.join()
        if feed_err:
            raise RuntimeError(
                f"STREAM feed thread failed for {cmd}"
            ) from feed_err[0]
        rc = proc.wait()
        if rc != 0:
            raise RuntimeError(f"STREAM command {cmd} exited {rc}")
        if buf:
            yield pd.read_csv(
                io.StringIO("".join(buf)), sep="\t", names=names,
                header=None, dtype=str,
            )

    return df.mapInPandas(run, schema=output_schema)
