"""Randomized engine-vs-DuckDB differential testing (a sqllogictest-ish
fuzz over the mapping layer).

Generates random scan→filter→group→agg plans over the fixture schema as
BOTH a DataFrame expression and the equivalent SQL, runs them on Spark
and DuckDB, and hash-compares results with the same normalization the
selfcheck uses.  Catches mapping bugs broadly instead of per-curated-
query.  Also fuzzes the Latin compiler (gen_latin) and the late-r5
pipeline ops (gen_pipeline: passage spans/stats, mixture sampling,
corpus stats, DSIR weights) over RANDOM inline corpora with NULL/empty/
unicode/boilerplate edge cases — the fixture corpus never exercises
those.

    python tools/fuzz_oracle.py [n_queries] [seed] [sf_dir]
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from pyspark.sql import functions as F

from pigout_spark.catalog import load_table
from pigout_spark.session import get_spark
from tools.selfcheck import _normalize, value_hash

#: (table, group-able string cols, filterable numeric cols, aggregable
#: double cols, int-ish cols)
TABLES = {
    "lineitem": (
        ["l_returnflag", "l_linestatus"],
        [("l_quantity", 1.0, 50.0), ("l_discount", 0.0, 0.1), ("l_tax", 0.0, 0.1)],
        ["l_quantity", "l_extendedprice", "l_discount"],
        ["l_orderkey", "l_partkey", "l_suppkey"],
    ),
    "orders": (
        ["o_orderstatus", "o_orderpriority"],
        [("o_totalprice", 1000.0, 500000.0)],
        ["o_totalprice"],
        ["o_orderkey", "o_custkey"],
    ),
    "customer": (
        ["c_mktsegment"],
        [("c_acctbal", -1000.0, 10000.0)],
        ["c_acctbal"],
        ["c_custkey", "c_nationkey"],
    ),
    "events": (
        ["event_type"],
        [("value", 0.0, 200.0)],
        ["value"],
        ["user_id", "event_id"],
    ),
}

_CMP = ["<", "<=", ">", ">="]

#: unique-key tuples per table (top-k tiebreaks must be total orders)
UNIQUE_KEYS = {
    "lineitem": ["l_orderkey", "l_linenumber"],
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id"],
}

#: join edges: (left, lkey, right, rkey)
JOINS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
]


def gen_topk(rng: random.Random):
    """Random ORDER BY ... LIMIT with a unique tiebreak."""
    table = rng.choice(list(TABLES))
    strs, nums, doubles, ints = TABLES[table]
    sortcol = rng.choice(doubles)
    direction = rng.choice(["ASC", "DESC"])
    n = rng.randint(3, 25)
    keys = UNIQUE_KEYS[table]
    cols = keys + [sortcol]
    where = ""
    if rng.random() < 0.5:
        col, lo, hi = rng.choice(nums)
        where = f"{col} {rng.choice(_CMP)} {round(rng.uniform(lo, hi), 2)}"
    order_sql = f"{sortcol} {direction}, " + ", ".join(keys)
    sql = f"SELECT {', '.join(cols)} FROM {table}"
    if where:
        sql += f" WHERE {where}"
    sql += f" ORDER BY {order_sql} LIMIT {n}"

    def build(spark, sf_dir):
        df = load_table(spark, sf_dir, table).select(*cols)
        if where:
            df = df.filter(where)
        oc = [F.col(sortcol).desc() if direction == "DESC" else F.col(sortcol).asc()]
        oc += [F.col(k) for k in keys]
        return df.orderBy(*oc).limit(n)

    return build, sql


def gen_join(rng: random.Random):
    """Random two-table equi-join + group + aggs."""
    lt, lk, rt, rk = rng.choice(JOINS)
    lstrs, lnums, ldoubles, _ = TABLES[lt]
    rstrs, rnums, rdoubles, _ = TABLES[rt]
    keys = [rng.choice(lstrs), rng.choice(rstrs)]
    preds = []
    if rng.random() < 0.7:
        col, lo, hi = rng.choice(lnums + rnums)
        preds.append(f"{col} {rng.choice(_CMP)} {round(rng.uniform(lo, hi), 2)}")
    where = " AND ".join(preds)
    c = rng.choice(ldoubles + rdoubles)
    aggs_sql = [
        "COUNT(*) AS a0",
        f"CAST(SUM(CAST({c} AS DECIMAL(20,4))) AS DOUBLE) AS a1",
    ]
    sql = (
        f"SELECT {', '.join(keys)}, {', '.join(aggs_sql)} "
        f"FROM {lt} JOIN {rt} ON {lt}.{lk} = {rt}.{rk}"
    )
    if where:
        sql += f" WHERE {where}"
    sql += f" GROUP BY {', '.join(keys)}"

    def build(spark, sf_dir):
        ldf = load_table(spark, sf_dir, lt)
        rdf = load_table(spark, sf_dir, rt)
        df = ldf.join(rdf, ldf[lk] == rdf[rk])
        if where:
            df = df.filter(where)
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("a0"),
            F.sum(F.col(c).cast("decimal(20,4)")).cast("double").alias("a1"),
        )

    return build, sql


#: (SQL set op, DataFrame method) — SQL INTERSECT/EXCEPT are DISTINCT
#: semantics in both engines (Spark: intersect/subtract); UNION ALL is
#: the Pig bag union (dup-keeping).
_SETOPS = [("UNION ALL", "unionAll"), ("INTERSECT", "intersect"), ("EXCEPT", "subtract")]


def gen_setop(rng: random.Random):
    """Random UNION ALL / INTERSECT / EXCEPT of two filtered projections."""
    table = rng.choice(list(TABLES))
    strs, nums, doubles, ints = TABLES[table]
    cols = [rng.choice(strs), rng.choice(ints)]

    def pred() -> str:
        col, lo, hi = rng.choice(nums)
        return f"{col} {rng.choice(_CMP)} {round(rng.uniform(lo, hi), 2)}"

    p1, p2 = pred(), pred()
    op_sql, op_df = rng.choice(_SETOPS)
    sql = (
        f"SELECT {', '.join(cols)} FROM {table} WHERE {p1} "
        f"{op_sql} SELECT {', '.join(cols)} FROM {table} WHERE {p2}"
    )

    def build(spark, sf_dir):
        df = load_table(spark, sf_dir, table)
        a = df.filter(p1).select(*cols)
        b = df.filter(p2).select(*cols)
        return getattr(a, op_df)(b)

    return build, sql


def gen_string(rng: random.Random):
    """Random Pig string-shim compositions vs DuckDB-native SQL: fuzzes
    the D4 index conventions (SUBSTRING 0-based stop-exclusive, INDEXOF
    0-based/-1-missing) at random offsets incl. out-of-range (SURVEY
    §7-H4)."""
    start = rng.randint(0, 12)
    stop = start + rng.randint(0, 10)
    needle = rng.choice(["_", "0", "1", "Cust", "zz"])
    sql = (
        "SELECT c_custkey, "
        f"substring(c_name, {start + 1}, {max(stop - start, 0)}) AS s1, "
        f"strpos(c_name, '{needle}') - 1 AS i1, "
        "upper(c_mktsegment) || '/' || c_name AS s2, "
        "length(trim(c_name)) AS n1 "
        "FROM customer"
    )

    def build(spark, sf_dir):
        from pigout_spark.functions.strings import (
            CONCAT,
            INDEXOF,
            SUBSTRING,
            TRIM,
            UPPER,
        )

        df = load_table(spark, sf_dir, "customer")
        return df.select(
            "c_custkey",
            SUBSTRING("c_name", start, stop).alias("s1"),
            INDEXOF("c_name", needle).alias("i1"),
            CONCAT(UPPER("c_mktsegment"), F.lit("/"), "c_name").alias("s2"),
            F.length(TRIM("c_name")).cast("long").alias("n1"),
        )

    return build, sql


def gen_window(rng: random.Random):
    """Random partitioned window function with a total-order tiebreak
    (rank values must be engine-deterministic)."""
    table = rng.choice(list(UNIQUE_KEYS))
    strs, nums, doubles, ints = TABLES[table]
    part = rng.choice(strs)
    sortcol = rng.choice(doubles)
    keys = UNIQUE_KEYS[table]
    fn = rng.choice(["ROW_NUMBER", "RANK", "DENSE_RANK"])
    direction = rng.choice(["ASC", "DESC"])
    cols = list(dict.fromkeys(keys + [part, sortcol]))
    order_sql = f"{sortcol} {direction}, " + ", ".join(keys)
    sql = (
        f"SELECT {', '.join(cols)}, CAST({fn}() OVER (PARTITION BY {part} "
        f"ORDER BY {order_sql}) AS BIGINT) AS w FROM {table}"
    )

    def build(spark, sf_dir):
        from pyspark.sql import Window

        df = load_table(spark, sf_dir, table).select(*cols)
        oc = [F.col(sortcol).desc() if direction == "DESC" else F.col(sortcol).asc()]
        oc += [F.col(k) for k in keys]
        w = Window.partitionBy(part).orderBy(*oc)
        fns = {
            "ROW_NUMBER": F.row_number, "RANK": F.rank, "DENSE_RANK": F.dense_rank,
        }
        return df.withColumn("w", fns[fn]().over(w).cast("long"))

    return build, sql


def _latin_session(spark, sf_dir, script, params=None):
    from pigout_spark.catalog import Catalog
    from pigout_spark.latin import run_script

    return run_script(
        spark, script, Catalog().register_fixture_dir(sf_dir), params=params
    )


def gen_latin(rng: random.Random):
    """Random Pig Latin scripts through the FRONT END (parse → translate
    → plan) vs hand-written SQL — fuzzes the compiler itself, not just
    the DataFrame layer underneath it."""
    table = rng.choice([t for t in TABLES if t != "events"])  # raw ts is ns
    strs, nums, doubles, ints = TABLES[table]
    shape = rng.randint(0, 3)

    if shape == 0:
        # FILTER + FOREACH arithmetic projection
        col, lo, hi = rng.choice(nums)
        val = round(rng.uniform(lo, hi), 2)
        op = rng.choice(_CMP)
        a, b = rng.choice(doubles), rng.choice(ints)
        k = rng.choice(strs)
        mult = rng.randint(2, 9)
        script = f"""
        t = LOAD '{table}';
        f = FILTER t BY {col} {op} {val};
        p = FOREACH f GENERATE {k}, {b}, {a} * {mult}.0 + {b} AS e1;
        """
        sql = (
            f"SELECT {k}, {b}, {a} * {mult}.0 + {b} AS e1 "
            f"FROM {table} WHERE {col} {op} {val}"
        )

        def build(spark, sf_dir):
            return _latin_session(spark, sf_dir, script).df("p")

        return build, sql

    if shape == 1:
        # GROUP (1-2 keys) + COUNT_STAR/MIN/MAX aggregate
        ks = rng.sample(strs, min(len(strs), rng.randint(1, 2)))
        c = rng.choice(doubles + ints)
        mfn = rng.choice(["MIN", "MAX"])
        if len(ks) == 1:
            gen, sel = "group", f'{ks[0]} AS "group"'
        else:
            gen = f"FLATTEN(group) AS ({', '.join(ks)})"
            sel = ", ".join(ks)
        script = f"""
        t = LOAD '{table}';
        g = GROUP t BY {ks[0] if len(ks) == 1 else '(' + ', '.join(ks) + ')'};
        out = FOREACH g GENERATE {gen}, COUNT_STAR(t) AS n, {mfn}(t.{c}) AS m;
        """
        sql = (
            f"SELECT {sel}, COUNT(*) AS n, {mfn}({c}) AS m "
            f"FROM {table} GROUP BY {', '.join(ks)}"
        )

        def build(spark, sf_dir):
            return _latin_session(spark, sf_dir, script).df("out")

        return build, sql

    if shape == 2:
        # ORDER + LIMIT with unique tiebreak, via -param for the limit
        keys = UNIQUE_KEYS[table]
        d = rng.choice(doubles)
        n = rng.randint(3, 20)
        direction = rng.choice(["ASC", "DESC"])
        cols = list(dict.fromkeys(keys + [d]))
        script = f"""
        t = LOAD '{table}';
        p = FOREACH t GENERATE {', '.join(cols)};
        s = ORDER p BY {d} {direction}, {', '.join(keys)};
        l = LIMIT s $N;
        """
        sql = (
            f"SELECT {', '.join(cols)} FROM {table} "
            f"ORDER BY {d} {direction}, {', '.join(keys)} LIMIT {n}"
        )

        def build(spark, sf_dir):
            return _latin_session(
                spark, sf_dir, script, params={"N": str(n)}
            ).df("l")

        return build, sql

    # nested FOREACH top-k: ORDER+LIMIT inside a GROUP block
    k = rng.choice(strs)
    d = rng.choice(doubles)
    keys = UNIQUE_KEYS[table]
    n = rng.randint(1, 4)
    cols = list(dict.fromkeys([k] + keys + [d]))
    script = f"""
    t = LOAD '{table}';
    g = GROUP t BY {k};
    top = FOREACH g {{
      s = ORDER t BY {d} DESC, {', '.join(keys)};
      l = LIMIT s {n};
      GENERATE group, FLATTEN(l);
    }};
    """
    sql = (
        f"WITH r AS (SELECT {', '.join(cols)}, ROW_NUMBER() OVER "
        f"(PARTITION BY {k} ORDER BY {d} DESC, {', '.join(keys)}) AS rn "
        f"FROM {table}) SELECT {', '.join(cols)} FROM r WHERE rn <= {n}"
    )

    def build(spark, sf_dir):
        return _latin_session(spark, sf_dir, script).df("top").select(*cols)

    return build, sql


def gen_query(rng: random.Random):
    """One random plan → (builder(spark, sf_dir) -> DataFrame, sql)."""
    r = rng.random()
    if r < 0.16:
        return gen_topk(rng)
    if r < 0.32:
        return gen_join(rng)
    if r < 0.42:
        return gen_setop(rng)
    if r < 0.52:
        return gen_string(rng)
    if r < 0.60:
        return gen_window(rng)
    if r < 0.70:
        return gen_latin(rng)
    if r < 0.80:
        return gen_pipeline(rng)
    if r < 0.88:
        return gen_temporal(rng)
    if r < 0.94:
        return gen_behavioral(rng)
    if r < 0.96:
        return gen_graph(rng)
    if r < 0.98:
        return gen_sketch(rng)
    if r < 0.985:
        return gen_attribution(rng)
    if r < 0.99:
        return gen_r7(rng)
    if r < 0.994:
        return gen_r8(rng)
    if r < 0.996:
        return gen_r9(rng)
    if r < 0.999:
        return gen_r12(rng)
    table = rng.choice(list(TABLES))
    strs, nums, doubles, ints = TABLES[table]
    preds, fexprs = [], []
    for _ in range(rng.randint(0, 2)):
        col, lo, hi = rng.choice(nums)
        op = rng.choice(_CMP)
        val = round(rng.uniform(lo, hi), 2)
        preds.append(f"{col} {op} {val}")
    if rng.random() < 0.4:
        col = rng.choice(strs)
        preds.append(f"{col} IS NOT NULL")
    where = " AND ".join(preds)

    keys = rng.sample(strs, rng.randint(1, len(strs)))
    aggs_sql, aggs_df = [], []
    for i, _ in enumerate(range(rng.randint(1, 3))):
        kind = rng.choice(["count", "dsum", "min", "max", "cd"])
        if kind == "count":
            aggs_sql.append(f"COUNT(*) AS a{i}")
            aggs_df.append(F.count(F.lit(1)).alias(f"a{i}"))
        elif kind == "dsum":
            c = rng.choice(doubles)
            aggs_sql.append(
                f"CAST(SUM(CAST({c} AS DECIMAL(20,4))) AS DOUBLE) AS a{i}"
            )
            aggs_df.append(
                F.sum(F.col(c).cast("decimal(20,4)")).cast("double").alias(f"a{i}")
            )
        elif kind in ("min", "max"):
            c = rng.choice(doubles + ints)
            aggs_sql.append(f"{kind.upper()}({c}) AS a{i}")
            aggs_df.append(getattr(F, kind)(c).alias(f"a{i}"))
        else:
            c = rng.choice(ints)
            aggs_sql.append(f"COUNT(DISTINCT {c}) AS a{i}")
            aggs_df.append(F.count_distinct(c).alias(f"a{i}"))

    sql = f"SELECT {', '.join(keys)}, {', '.join(aggs_sql)} FROM {table}"
    if where:
        sql += f" WHERE {where}"
    sql += f" GROUP BY {', '.join(keys)}"

    def build(spark, sf_dir):
        df = load_table(spark, sf_dir, table)
        if where:
            df = df.filter(where)
        return df.groupBy(*keys).agg(*aggs_df)

    return build, sql


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    rng = random.Random(seed)
    spark = get_spark("fuzz-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for i in range(n):
        build, sql = gen_query(rng)
        spdf = build(spark, sf_dir).toPandas()
        opdf = con.execute(sql).df()
        ok = (
            len(spdf) == len(opdf)
            and list(_normalize(spdf).columns) == list(_normalize(opdf).columns)
            and value_hash(spdf) == value_hash(opdf)
        )
        if not ok:
            bad += 1
            print(f"MISMATCH #{i}: {sql}")
        else:
            print(f"ok #{i}: {len(spdf)} rows :: {sql[:100]}")
    print(f"\n{bad} mismatches of {n}")
    return 1 if bad else 0




# ---------------------------------------------------------------- pipeline ---
#: SQL twin of pipeline.dedup.ws_tokens (same as queries/pipeline_q.py)
_P_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


def _values_cte(rows) -> str:
    """Inline random corpus as a CTE shadowing the `documents` view."""
    vals = []
    for i, text, src in rows:
        t = "NULL" if text is None else "'" + text.replace("'", "''") + "'"
        vals.append(f"({i}, {t}, '{src}')")
    return (
        "WITH documents AS (SELECT * FROM (VALUES "
        + ", ".join(vals)
        + ") AS __t(doc_id, text, source))"
    )


def _rand_corpus(rng: random.Random):
    """Random docs with edge cases: NULL text, empties, multi-space,
    unicode tokens, and an injected repeated boilerplate span."""
    vocab = [f"w{i}" for i in range(rng.randint(3, 8))] + ["é", "ß"]
    boiler = [rng.choice(vocab) for _ in range(rng.randint(3, 5))]
    rows = []
    for i in range(rng.randint(6, 40)):
        r = rng.random()
        if r < 0.05:
            text = None
        elif r < 0.12:
            text = ""
        else:
            toks = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
            if rng.random() < 0.5:
                pos = rng.randint(0, len(toks))
                toks[pos:pos] = boiler
            sep = "  " if rng.random() < 0.15 else " "
            text = sep.join(toks)
        rows.append((i, text, f"s{rng.randint(0, 3)}"))
    # guarantee a non-empty target slice for the DSIR case
    rows.append((len(rows), " ".join(boiler), "s0"))
    return rows


def _gen_semantic(rng: random.Random):
    """Differential-fuzz SemDeDup pairs: random embeddings, the seeded
    k-means cell assignment replayed by the unrolled SQL chain, exact
    in-cell cosine at a random threshold."""
    from pigout_spark.queries.pipeline_q import _kmeans_cells_sql, _sql_dot

    dim = rng.randint(2, 5)
    n = rng.randint(6, 24)
    nc = rng.randint(2, min(4, n))
    t = round(rng.uniform(0.3, 0.9), 2)
    vecs = []
    for i in range(n):
        v = [round(rng.uniform(-1, 1), 4) for _ in range(dim)]
        if all(abs(x) < 1e-9 for x in v):
            v[0] = 1.0  # no zero vectors (norm divide)
        vecs.append((i, v))
    vals = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in v)}])" for i, v in vecs
    )
    base = _kmeans_cells_sql(n_centroids=nc, n_iters=3, dim=dim)
    assert base.startswith("WITH e AS (")
    sql = (
        base.replace(
            "WITH e AS (",
            "WITH embeddings AS (SELECT * FROM (VALUES "
            + vals
            + ") AS __t(vec_id, embedding)), e AS (",
            1,
        )
        + f"""
        , p AS (
          SELECT a.vec_id AS a, b.vec_id AS b,
                 {_sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm) AS cos
          FROM cells a JOIN cells b
            ON a.cell = b.cell AND a.vec_id < b.vec_id
        )
        SELECT a, b, ROUND(cos, 6) AS cos6 FROM p WHERE cos >= {t!r}
        """
    )

    def build(spark, sf_dir):
        from pigout_spark.pipeline.dedup import semantic_dedup_pairs

        emb = spark.createDataFrame(
            vecs, "vec_id long, embedding array<double>"
        )
        out = semantic_dedup_pairs(emb, n_centroids=nc, threshold=t)
        return out.select("a", "b", F.round("cos", 6).alias("cos6"))

    return build, sql


def _gen_r13(rng: random.Random, kind: str, rows, cte: str, mkdf):
    """r13 pipeline additions: token entropy (ln on NULL/unicode/empty
    corpora), Good-Turing counts-of-counts (spectrum gaps), and
    blocked-Levenshtein fuzzy pairs (ASCII mutation corpus — the
    char-vs-byte engine divergence makes unicode out of contract)."""
    from pyspark.sql import functions as F  # noqa: F401

    if kind == "entropy":
        sql = (
            cte
            + f"""
            , toks AS (SELECT doc_id, unnest({_P_TOKS}) AS tok
                       FROM documents),
            c AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
                  FROM toks GROUP BY doc_id, tok),
            t AS (SELECT doc_id, c,
                         CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT)
                           AS n FROM c),
            s AS (SELECT doc_id, n,
                         CAST(ROUND(-(c / CAST(n AS DOUBLE))
                                    * ln(c / CAST(n AS DOUBLE)), 6) + 0.0
                              AS DECIMAL(20,6)) AS term FROM t)
            SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(SUM(term) AS DOUBLE) AS entropy6
            FROM s GROUP BY doc_id
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.text import token_entropy

            return token_entropy(mkdf(spark))

        return build, sql
    if kind == "gturing":
        max_r = rng.choice([None, rng.randint(1, 6)])
        cap = "" if max_r is None else f"WHERE r <= {max_r}"
        sql = (
            cte
            + f"""
            , toks AS (SELECT unnest({_P_TOKS}) AS tok FROM documents),
            f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
                  FROM toks GROUP BY tok),
            nr0 AS (SELECT n AS r, CAST(COUNT(*) AS BIGINT) AS n_r
                    FROM f GROUP BY n),
            nr AS (SELECT * FROM nr0 {cap})
            SELECT a.r, a.n_r,
                   CASE WHEN b.n_r IS NOT NULL THEN
                     ROUND((a.r + 1) * CAST(b.n_r AS DOUBLE)
                           / CAST(a.n_r AS DOUBLE), 6) + 0.0
                   END AS r_star6
            FROM nr a LEFT JOIN nr0 b ON b.r = a.r + 1
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.text import good_turing_counts

            return good_turing_counts(mkdf(spark), max_r=max_r)

        return build, sql
    # fuzzy: a DEDICATED ASCII mutation corpus — random base strings,
    # random single-char substitutions/inserts/deletes at random sites
    # (prefix, middle, suffix), so the block-miss contract and the -1
    # sentinel path both get adversarial coverage.
    alpha = "abcdefghijklmnopqrstuvwxyz"
    bases = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(4, 14)))
        for _ in range(rng.randint(2, 5))
    ]
    strs = []
    for i in range(rng.randint(6, 30)):
        b = rng.choice(bases)
        for _ in range(rng.randint(0, 3)):
            pos = rng.randrange(max(1, len(b)))
            op = rng.random()
            if op < 0.34 and len(b) > 2:
                b = b[:pos] + b[pos + 1:]
            elif op < 0.67:
                b = b[:pos] + rng.choice(alpha) + b[pos:]
            else:
                b = b[:pos] + rng.choice(alpha) + b[pos + 1:]
        strs.append((i, b))
    d = rng.randint(1, 3)
    bl = rng.randint(2, 5)
    mb = rng.choice([None, rng.randint(3, 40)])
    vals = ", ".join(f"({i}, '{t}')" for i, t in strs)
    cap_cte = (
        """, k2 AS (SELECT * FROM k)""" if mb is None else f"""
        , big AS (SELECT side, bk FROM k GROUP BY side, bk
                  HAVING COUNT(*) > {mb}),
        k2 AS (SELECT k.* FROM k ANTI JOIN big USING (side, bk))"""
    )
    fsql = f"""
    WITH p AS (SELECT * FROM (VALUES {vals}) AS __p(id, s)),
    k AS (
      SELECT id, s, 'p' AS side, substring(s, 1, {bl}) AS bk FROM p
      UNION ALL
      SELECT id, s, 's' AS side,
             substring(s, length(s) - {bl - 1}, {bl}) AS bk
      FROM p WHERE length(s) >= {bl}
    ){cap_cte},
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
      FROM k2 a JOIN k2 b ON a.side = b.side AND a.bk = b.bk
                         AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(levenshtein(sa, sb) AS BIGINT) AS dist
    FROM cand
    WHERE abs(length(sa) - length(sb)) <= {d}
      AND levenshtein(sa, sb) <= {d}
    """

    def build(spark, sf_dir):
        from pigout_spark.pipeline.dedup import fuzzy_pairs

        df = spark.createDataFrame(strs, "id long, s string")
        return fuzzy_pairs(
            df, "id", "s", max_dist=d, block_len=bl, max_block=mb
        )

    return build, fsql


def _gen_r14(rng: random.Random, kind: str, rows, cte: str, mkdf):
    """r14 pipeline additions: readability (regex-count formulas over
    random punctuation/unicode/empty corpora) and the WAV/AVI RIFF
    codecs (random header fields + random raw samples: the oracle
    computes channel sums from a VALUES relation of the SAME samples,
    so the encoder+decoder round-trip is the thing under differential
    test, not the arithmetic)."""
    if kind == "readability":
        sql = (
            cte
            + f"""
            , c AS (
              SELECT doc_id,
                     CAST(len({_P_TOKS}) AS BIGINT) AS w,
                     CAST(greatest(1, len(regexp_extract_all(text,
                          '[.!?]+'))) AS BIGINT) AS s,
                     CAST(len(regexp_extract_all(lower(text),
                          '[aeiouy]+')) AS BIGINT) AS y
              FROM documents
            )
            SELECT doc_id, w AS n_words, s AS n_sentences,
                   y AS n_syllables,
                   CASE WHEN w > 0 THEN
                     ROUND(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                                   - 84.6 * (CAST(y AS DOUBLE) / w), 6)
                   END AS flesch6,
                   CASE WHEN w > 0 THEN
                     ROUND(0.39 * (CAST(w AS DOUBLE) / s)
                           + 11.8 * (CAST(y AS DOUBLE) / w) - 15.59, 6)
                   END AS fk_grade6
            FROM c
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.text import readability_scores

            return readability_scores(mkdf(spark))

        return build, sql
    if kind == "wav":
        # random PCM payloads; oracle sums the SAME samples from a
        # VALUES relation — differential over encode_wav ∘ decode_wav
        cases = []
        sample_rows = []
        for i in range(rng.randint(2, 6)):
            sr = rng.choice([8000, 11025, 16000, 22050, 44100])
            ch = rng.randint(1, 2)
            bits = rng.choice([8, 16])
            nf = rng.randint(0, 40)  # zero-frame payloads in contract
            samples = []
            for f_i in range(nf):
                for c_i in range(ch):
                    v = (
                        rng.randint(0, 255) if bits == 8
                        else rng.randint(-32768, 32767)
                    )
                    samples.append((f_i, c_i, v))
                    sample_rows.append((i, c_i, v))
            cases.append((i, sr, ch, bits, nf, samples))
        hdr_vals = ", ".join(
            f"({i}, {sr}, {ch}, {bits}, {nf})"
            for i, sr, ch, bits, nf, _ in cases
        )
        samp_vals = ", ".join(
            f"({d}, {c}, {v})" for d, c, v in sample_rows
        ) or "(0, 0, 0)"
        samp_where = "" if sample_rows else " WHERE FALSE"
        sql = f"""
        WITH h AS (SELECT * FROM (VALUES {hdr_vals})
                   AS __h(doc_id, sr, ch, bits, nf)),
        sm AS (SELECT * FROM (VALUES {samp_vals})
               AS __s(doc_id, c, v){samp_where}),
        agg AS (
          SELECT doc_id,
                 SUM(CASE WHEN c = 0 THEN v END) AS s0,
                 SUM(CASE WHEN c = 1 THEN v END) AS s1
          FROM sm GROUP BY doc_id
        )
        SELECT h.doc_id,
               CAST(sr AS INT) AS sample_rate,
               CAST(ch AS INT) AS channels,
               CAST(bits AS INT) AS bits,
               CAST(nf AS BIGINT) AS n_frames,
               CAST(nf * 1000000 // sr AS BIGINT) AS duration_us,
               CAST(COALESCE(agg.s0, 0) AS BIGINT) AS sum_ch0,
               CAST(CASE WHEN ch = 2 THEN COALESCE(agg.s1, 0) END
                    AS BIGINT) AS sum_ch1
        FROM h LEFT JOIN agg USING (doc_id)
        """

        def build(spark, sf_dir):
            from pigout_spark.pipeline.multimodal import (
                decode_wav_audio,
                encode_wav,
            )

            payloads = []
            for i, sr, ch, bits, nf, samples in cases:
                buf = bytearray()
                for _fi, _ci, v in samples:
                    if bits == 8:
                        buf.append(v)
                    else:
                        buf += int(v).to_bytes(2, "little", signed=True)
                payloads.append((i, bytearray(encode_wav(sr, ch, bits, bytes(buf)))))
            df = spark.createDataFrame(payloads, "doc_id long, payload binary")
            return decode_wav_audio(df)

        return build, sql
    # avi: random header fields, oracle replays them from VALUES
    cases = [
        (
            i,
            rng.randint(1, 4096),
            rng.randint(1, 4096),
            rng.randint(0, 100000),
            rng.randint(1, 10_000_000),
            rng.randint(1, 4),
        )
        for i in range(rng.randint(2, 8))
    ]
    vals = ", ".join(
        f"({i}, {w}, {h}, {tf}, {upf}, {st})"
        for i, w, h, tf, upf, st in cases
    )
    sql = f"""
    WITH h AS (SELECT * FROM (VALUES {vals})
               AS __h(doc_id, w, ht, tf, upf, st))
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(ht AS INT) AS height,
           CAST(tf AS BIGINT) AS total_frames,
           CAST(upf AS BIGINT) AS us_per_frame,
           CAST(st AS INT) AS streams,
           CAST(tf * upf AS BIGINT) AS duration_us,
           CAST(1000000000 // upf AS BIGINT) AS fps_milli
    FROM h
    """

    def build(spark, sf_dir):
        from pigout_spark.pipeline.multimodal import (
            decode_avi_videos,
            encode_avi_header,
        )

        payloads = [
            (i, bytearray(encode_avi_header(w, h, tf, upf, streams=st)))
            for i, w, h, tf, upf, st in cases
        ]
        df = spark.createDataFrame(payloads, "doc_id long, payload binary")
        return decode_avi_videos(df)

    return build, sql


def _gen_r6(rng: random.Random, kind: str, rows, cte: str, mkdf):
    """r6 pipeline additions: weighted sampling (pow), surprisal (ln),
    z-order keys (integer bit ops), incremental dedup (band probe) —
    the transcendental paths especially need randomized cross-engine
    coverage."""
    from pyspark.sql import functions as F

    if kind == "wsample":
        n = rng.randint(1, 12)
        seed = str(rng.randint(0, 99))
        sql = (
            cte
            + f"""
            , w AS (SELECT doc_id,
                           CAST(len({_P_TOKS}) AS BIGINT) AS wt
                    FROM documents),
            e AS (SELECT doc_id, wt,
                         pow((('0x' || substring(md5('{seed}|' ||
                                CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                               + 0.5) / 1152921504606846976.0,
                             1.0 / wt) AS k
                  FROM w WHERE wt > 0)
            SELECT doc_id, wt FROM e ORDER BY k DESC, doc_id LIMIT {n}
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.curation import sample_weighted
            from pigout_spark.pipeline.dedup import ws_tokens

            d = mkdf(spark).select(
                "doc_id",
                F.size(ws_tokens("text", distinct=False))
                .cast("long")
                .alias("wt"),
            )
            return sample_weighted(d, n, "wt", ["doc_id"], seed=seed)

        return build, sql
    if kind == "surprisal":
        alpha = rng.choice([0.1, 0.5, 1.0, 2.0])
        sql = (
            cte
            + f"""
            , toks AS (SELECT doc_id, unnest({_P_TOKS}) AS tok
                       FROM documents),
            tf_ AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tfn
                    FROM toks GROUP BY tok),
            sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v,
                          CAST(SUM(tfn) AS DOUBLE) AS n FROM tf_),
            s AS (SELECT t.doc_id,
                         -ln((tf_.tfn + {alpha}) / (sc.n + {alpha} * sc.v))
                           AS srp
                  FROM toks t JOIN tf_ ON t.tok = tf_.tok, sc)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   ROUND(SUM(srp) / COUNT(*), 6) AS ms6
            FROM s GROUP BY doc_id
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.text import surprisal_score

            out = surprisal_score(mkdf(spark), alpha=alpha)
            return out.select(
                "doc_id", "n_tokens",
                F.round("mean_surprisal", 6).alias("ms6"),
            )

        return build, sql
    if kind == "zorder":
        bits = rng.randint(2, 8)
        top = (1 << bits) - 1

        def sc_sql(col, i):
            return (
                f"coalesce(least({top}, greatest(0, CAST(floor("
                f"(CAST({col} AS DOUBLE) - mn{i}) * {top}.0 / "
                f"(CASE WHEN mx{i} > mn{i} THEN mx{i} - mn{i} ELSE 1.0 END)"
                f") AS BIGINT))), 0)"
            )

        terms = " + ".join(
            f"(((s{j} >> {b}) & 1) << {b * 2 + j})"
            for b in range(bits)
            for j in (0, 1)
        )
        sql = (
            cte
            + f"""
            , d AS (SELECT doc_id,
                           CAST(length(coalesce(text, '')) AS BIGINT) AS ln_
                    FROM documents),
            st AS (SELECT MIN(CAST(doc_id AS DOUBLE)) AS mn0,
                          MAX(CAST(doc_id AS DOUBLE)) AS mx0,
                          MIN(CAST(ln_ AS DOUBLE)) AS mn1,
                          MAX(CAST(ln_ AS DOUBLE)) AS mx1 FROM d),
            scd AS (SELECT doc_id, {sc_sql("doc_id", 0)} AS s0,
                           {sc_sql("ln_", 1)} AS s1 FROM d, st)
            SELECT doc_id, CAST({terms} AS BIGINT) AS zkey FROM scd
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.plans.partitioning import zorder_layout

            d = mkdf(spark).select(
                "doc_id",
                F.length(F.coalesce(F.col("text"), F.lit("")))
                .cast("long")
                .alias("ln_"),
            )
            laid, key = zorder_layout(d, ["doc_id", "ln_"], bits=bits)
            return laid.select("doc_id", F.col(key).alias("zkey"))

        return build, sql
    # kind == "incr": split the random corpus, probe the index
    mod = rng.randint(2, 4)
    from pigout_spark.queries.pipeline_q import _bands_sql

    nh, rb = rng.choice([(16, 8), (8, 4)])
    sql = (
        cte
        + f"""
        , nb AS (SELECT * FROM ({_bands_sql(
            f"(SELECT * FROM documents WHERE doc_id % {mod} = 0)", nh, rb)})),
        cb AS (SELECT * FROM ({_bands_sql(
            f"(SELECT * FROM documents WHERE doc_id % {mod} <> 0)", nh, rb)})),
        hits AS (SELECT DISTINCT nb.doc_id FROM nb
                 JOIN cb ON nb.band = cb.band AND nb.bv = cb.bv)
        SELECT d.doc_id, d.source FROM documents d
        WHERE d.doc_id % {mod} = 0
          AND d.doc_id NOT IN (SELECT doc_id FROM hits)
        """
    )

    def build(spark, sf_dir):
        from pigout_spark.pipeline.dedup import (
            dedup_incremental,
            lsh_band_index,
        )

        d = mkdf(spark)
        idx = lsh_band_index(
            d.filter(F.col("doc_id") % mod != 0), "doc_id", "text", nh, rb
        )
        out = dedup_incremental(
            d.filter(F.col("doc_id") % mod == 0), idx,
            num_hashes=nh, rows_per_band=rb,
        )
        return out.select("doc_id", "source")

    return build, sql


def gen_pipeline(rng: random.Random):
    """Differential-fuzz the late-r5 pipeline ops on a random corpus."""
    rows = _rand_corpus(rng)
    cte = _values_cte(rows)

    def mkdf(spark):
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )

    kind = rng.choice(
        ["spans", "stats", "mixture", "corpus", "dsir", "tfidf", "pmi",
         "repn", "semantic", "bpe",
         "wsample", "surprisal", "zorder", "incr",
         "entropy", "gturing", "fuzzy",
         "readability", "wav", "avi",
         "mk", "chao1f", "fs", "png", "jw", "winnow", "dhash",
         "cox"]
    )
    if kind == "semantic":
        return _gen_semantic(rng)
    if kind in ("entropy", "gturing", "fuzzy"):
        return _gen_r13(rng, kind, rows, cte, mkdf)
    if kind in ("readability", "wav", "avi"):
        return _gen_r14(rng, kind, rows, cte, mkdf)
    if kind in ("mk", "chao1f", "fs", "png", "jw", "winnow", "dhash",
                "cox"):
        return _gen_r14b(rng, kind, rows, cte, mkdf)
    if kind in ("wsample", "surprisal", "zorder", "incr"):
        return _gen_r6(rng, kind, rows, cte, mkdf)
    if kind in ("spans", "stats"):
        n = rng.randint(2, 4)
        md = rng.randint(2, 3)
        if kind == "spans":
            sql = (
                cte
                + f"""
                , f AS (SELECT doc_id, {_P_TOKS} AS toks FROM documents),
                s AS (SELECT doc_id, toks, len(toks) AS n FROM f
                      WHERE len(toks) >= {n}),
                p AS (SELECT doc_id, unnest(range(0, n - {n - 1})) AS start,
                             toks FROM s),
                h AS (SELECT doc_id, CAST(start AS BIGINT) AS start,
                             md5(array_to_string(list_slice(toks, start + 1,
                                 start + {n}), ' ')) AS sh FROM p),
                c AS (SELECT sh, CAST(COUNT(DISTINCT doc_id) AS BIGINT)
                             AS ndocs FROM h GROUP BY sh)
                SELECT doc_id, start, sh, ndocs
                FROM h JOIN c USING (sh) WHERE ndocs >= {md}
                """
            )

            def build(spark, sf_dir):
                from pigout_spark.pipeline.dedup import duplicate_passage_spans

                return duplicate_passage_spans(mkdf(spark), n=n, min_docs=md)

            return build, sql
        sql = (
            cte
            + f"""
            , f AS (SELECT doc_id, {_P_TOKS} AS toks FROM documents),
            s AS (SELECT doc_id, toks, len(toks) AS n FROM f
                  WHERE len(toks) >= {n}),
            p AS (SELECT doc_id, unnest(range(0, n - {n - 1})) AS start,
                         toks FROM s),
            h AS (SELECT doc_id, md5(array_to_string(list_slice(toks,
                         start + 1, start + {n}), ' ')) AS sh FROM p),
            c AS (SELECT sh, COUNT(DISTINCT doc_id) AS nd FROM h GROUP BY sh),
            pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
                          CAST(SUM(CASE WHEN nd >= {md} THEN 1 ELSE 0 END)
                               AS BIGINT) AS n_dup_shingles
                   FROM h JOIN c USING (sh) GROUP BY doc_id)
            SELECT d.doc_id, coalesce(n_shingles, 0) AS n_shingles,
                   coalesce(n_dup_shingles, 0) AS n_dup_shingles,
                   CASE WHEN coalesce(n_shingles, 0) > 0
                        THEN n_dup_shingles / n_shingles ELSE 0.0
                   END AS dup_fraction
            FROM documents d LEFT JOIN pd USING (doc_id)
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.dedup import passage_dup_stats

            return passage_dup_stats(mkdf(spark), n=n, min_docs=md)

        return build, sql

    if kind == "mixture":
        doms = sorted({r[2] for r in rows})
        recipe = {d: round(rng.uniform(0.1, 1.0), 2) for d in rng.sample(doms, rng.randint(1, len(doms)))}
        tw = sum(recipe.values())
        target = rng.randint(1, len(rows))
        seed = str(rng.randint(0, 99))
        vals = ", ".join(
            f"('{d}', {w / tw * target!r})" for d, w in recipe.items()
        )
        sql = (
            cte
            + f"""
            , counts AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nd
                         FROM documents GROUP BY source),
            recipe(source, wt) AS (VALUES {vals})
            SELECT d.doc_id, d.source FROM documents d
            JOIN counts USING (source) JOIN recipe USING (source)
            WHERE ('0x' || substring(md5('{seed}' || '|' ||
                     coalesce(d.doc_id::VARCHAR, chr(0))), 1, 8))::BIGINT
                  / 4294967296.0 < least(1.0, wt / nd)
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.curation import mixture_sample

            return mixture_sample(
                mkdf(spark), "source", recipe, target, ["doc_id"], seed=seed
            ).select("doc_id", "source")

        return build, sql

    if kind == "corpus":
        sql = (
            cte
            + f"""
            , d AS (SELECT doc_id, text, {_P_TOKS} AS toks FROM documents),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(CASE WHEN length(trim(text)) = 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_docs,
                         CAST(SUM(length(text)) AS BIGINT) AS n_chars,
                         CAST(SUM(len(toks)) AS BIGINT) AS n_tokens FROM d),
            v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT)
                         AS n_distinct_tokens
                  FROM (SELECT unnest(toks) AS tok FROM d)),
            du AS (SELECT CAST(SUM(c - 1) AS BIGINT) AS n_exact_dup_docs
                   FROM (SELECT COUNT(*) AS c FROM documents
                         GROUP BY md5(text)))
            SELECT * FROM a, v, du
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.text import corpus_stats

            return corpus_stats(mkdf(spark))

        return build, sql

    if kind == "bpe":
        sql = (
            cte
            + f"""
            , f AS (SELECT {_P_TOKS} AS toks FROM documents),
            w AS (SELECT unnest(toks) AS word FROM f),
            wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
                   FROM w GROUP BY word),
            i AS (SELECT word, n, unnest(range(1, length(word))) AS i
                  FROM wc WHERE length(word) >= 2)
            SELECT substring(word, i, 2) AS pair,
                   CAST(SUM(n) AS BIGINT) AS cnt
            FROM i GROUP BY pair
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.text import bpe_pair_counts

            return bpe_pair_counts(mkdf(spark))

        return build, sql

    if kind == "tfidf":
        k = rng.randint(1, 4)
        sql = (
            cte
            + f"""
            , b AS (SELECT doc_id, unnest({_P_TOKS}) AS term FROM documents),
            tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM b GROUP BY doc_id, term),
            dfq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                    FROM b GROUP BY term),
            nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
            s AS (SELECT doc_id, term, tf, df, tf * ln(n / df) AS tfidf,
                         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY tf * ln(n / df) DESC, term) AS BIGINT) AS rk
                  FROM tf JOIN dfq USING (term) CROSS JOIN nd)
            SELECT doc_id, term, tf, df, ROUND(tfidf, 6) AS tfidf6, rk
            FROM s WHERE rk <= {k}
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.text import tfidf_top_terms

            out = tfidf_top_terms(mkdf(spark), k=k)
            return out.select(
                "doc_id", "term", "tf", "df",
                F.round("tfidf", 6).alias("tfidf6"), "rk",
            )

        return build, sql

    if kind == "pmi":
        mc = rng.randint(1, 4)
        sql = (
            cte
            + f"""
            , f AS (SELECT {_P_TOKS} AS t FROM documents),
            s AS (SELECT t FROM f WHERE len(t) >= 2),
            p AS (SELECT unnest(list_transform(range(1, len(t)),
                         i -> struct_pack(x := t[i], y := t[i + 1]))) AS pr
                  FROM s),
            pairs AS (SELECT pr.x AS x, pr.y AS y FROM p),
            pc AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS pair_n
                   FROM pairs GROUP BY x, y HAVING COUNT(*) >= {mc}),
            uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
                    FROM (SELECT unnest({_P_TOKS}) AS tok FROM documents)
                    GROUP BY tok),
            tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS T FROM pairs)
            SELECT x, y, pair_n,
                   ROUND(ln(pair_n * T / (ux.c * uy.c)), 6) AS pmi6
            FROM pc JOIN uni ux ON pc.x = ux.tok
            JOIN uni uy ON pc.y = uy.tok CROSS JOIN tot
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.text import pmi_pairs

            out = pmi_pairs(mkdf(spark), min_count=mc)
            return out.select(
                "x", "y", "pair_n", F.round("pmi", 6).alias("pmi6")
            )

        return build, sql

    if kind == "repn":
        cap = rng.randint(2, 10)
        sql = (
            cte
            + f"""
            , f AS (SELECT doc_id, list_slice({_P_TOKS}, 1, {cap}) AS t,
                           list_filter(string_split(text, chr(10)),
                                       x -> x <> '') AS lines
                    FROM documents),
            g AS (SELECT doc_id, lines,
                         CASE WHEN len(t) >= 2
                              THEN list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])
                              ELSE [] END AS grams
                  FROM f)
            SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_2grams,
                   CAST(coalesce(list_max(list_transform(grams,
                        g -> len(list_filter(grams, x -> x = g)))), 0)
                        AS BIGINT) AS top_2gram_n,
                   CASE WHEN len(grams) > 0 THEN
                     list_max(list_transform(grams,
                       g -> len(list_filter(grams, x -> x = g)))) / len(grams)
                   ELSE 0.0 END AS top_2gram_frac,
                   CASE WHEN len(lines) > 0
                        THEN 1.0 - len(list_distinct(lines)) / len(lines)
                        ELSE 0.0 END AS dup_line_frac
            FROM g
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.text import repetition_features_narrow

            out = repetition_features_narrow(
                mkdf(spark).select("doc_id", "text"), max_tokens=cap
            )
            return out.select(
                "doc_id", "n_2grams", "top_2gram_n",
                "top_2gram_frac", "dup_line_frac",
            )

        return build, sql

    # dsir: weights vs the s0 slice (guaranteed non-empty)
    sql = (
        cte
        + f"""
        , ct AS (SELECT doc_id, unnest({_P_TOKS}) AS tok FROM documents),
        cf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cfn
               FROM ct GROUP BY tok),
        tt AS (SELECT unnest({_P_TOKS}) AS tok FROM documents
               WHERE source = 's0'),
        tfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tfn
                FROM tt GROUP BY tok),
        vv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v
               FROM (SELECT tok FROM cf UNION SELECT tok FROM tfq)),
        sc AS (SELECT (SELECT CAST(SUM(cfn) AS DOUBLE) FROM cf) AS nc,
                      (SELECT CAST(SUM(tfn) AS DOUBLE) FROM tfq) AS nt,
                      (SELECT v FROM vv) AS v)
        SELECT doc_id,
               ROUND(SUM(ln((coalesce(tfn, 0) + 0.5) / (nt + 0.5 * v))
                         - ln((cfn + 0.5) / (nc + 0.5 * v))), 6)
                 AS log_weight6,
               CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM ct JOIN cf USING (tok) LEFT JOIN tfq USING (tok)
        CROSS JOIN sc GROUP BY doc_id
        """
    )

    def build(spark, sf_dir):
        from pigout_spark.pipeline.curation import importance_weights

        df = mkdf(spark)
        out = importance_weights(df, df.filter(F.col("source") == "s0"))
        return out.select(
            "doc_id",
            F.round("log_weight", 6).alias("log_weight6"),
            "n_tokens",
        )

    return build, sql




# ---------------------------------------------------------------- temporal ---
def _rand_event_rows(rng: random.Random, n: int, keys: int):
    """(k, ts, v) rows with UNIQUE (k, ts) — tie-free so ASOF matches
    are total functions in both engines."""
    seen = set()
    rows = []
    while len(rows) < n:
        k = rng.randint(0, keys - 1)
        s = rng.randint(0, 7200)
        if (k, s) in seen:
            continue
        seen.add((k, s))
        rows.append((k, s, round(rng.uniform(-100, 100), 3)))
    return rows


def _ts_sql(s: int) -> str:
    return f"TIMESTAMP '2024-01-01 00:00:00' + INTERVAL {s} SECOND"


def _events_cte(name: str, rows) -> str:
    vals = ", ".join(
        f"({k}, {_ts_sql(s)}, {v!r})" for k, s, v in rows
    )
    return f"{name} AS (SELECT * FROM (VALUES {vals}) AS __{name}(k, ts, v))"


def _events_df(spark, rows):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(k, t0 + dt.timedelta(seconds=s), v) for k, s, v in rows],
        "k long, ts timestamp, v double",
    )


def gen_temporal(rng: random.Random):
    """Differential-fuzz the temporal operators: as-of join vs DuckDB's
    NATIVE ASOF JOIN, bin-bucketed range join vs the plain BETWEEN
    join, resample/rollup vs direct SQL aggregation."""
    kind = rng.choice(["asof", "range", "resample", "rollup", "twa"])
    keys = rng.randint(1, 4)

    if kind == "asof":
        l_rows = _rand_event_rows(rng, rng.randint(5, 25), keys)
        r_rows = _rand_event_rows(rng, rng.randint(3, 25), keys)
        sql = (
            "WITH " + _events_cte("l", l_rows) + ", " + _events_cte("r", r_rows)
            + """
            SELECT l.k, CAST(epoch(l.ts) AS BIGINT) AS ts_s,
                   CAST(epoch(r.ts) AS BIGINT) AS matched_s,
                   ROUND(r.v, 6) AS rv6
            FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.operators.joins import asof_join

            out = asof_join(
                _events_df(spark, l_rows),
                _events_df(spark, r_rows).withColumnRenamed("v", "rv"),
                by="k",
            )
            return out.select(
                "k",
                F.unix_timestamp("ts").alias("ts_s"),
                F.unix_timestamp("matched_ts").alias("matched_s"),
                F.round("rv", 6).alias("rv6"),
            )

        return build, sql

    if kind == "range":
        p_rows = _rand_event_rows(rng, rng.randint(5, 25), keys)
        i_rows = [
            (k, s, rng.randint(0, 900))
            for k, s, _ in _rand_event_rows(rng, rng.randint(3, 15), keys)
        ]
        bin_s = rng.choice([60, 300, 600])
        ivals = ", ".join(
            f"({k}, {_ts_sql(s)}, {_ts_sql(s + span)}, {i})"
            for i, (k, s, span) in enumerate(i_rows)
        )
        sql = (
            "WITH " + _events_cte("p", p_rows)
            + f", iv AS (SELECT * FROM (VALUES {ivals})"
            "  AS __iv(k, iv_start, iv_end, ivid))"
            + """
            SELECT p.k, CAST(epoch(p.ts) AS BIGINT) AS ts_s, iv.ivid
            FROM p JOIN iv
              ON p.k = iv.k AND p.ts BETWEEN iv.iv_start AND iv.iv_end
            """
        )

        def build(spark, sf_dir):
            import datetime as dt

            from pigout_spark.operators.joins import range_join

            t0 = dt.datetime(2024, 1, 1)
            iv = spark.createDataFrame(
                [
                    (k, t0 + dt.timedelta(seconds=s),
                     t0 + dt.timedelta(seconds=s + span), i)
                    for i, (k, s, span) in enumerate(i_rows)
                ],
                "k long, iv_start timestamp, iv_end timestamp, ivid long",
            )
            out = range_join(
                _events_df(spark, p_rows), iv,
                "ts", "iv_start", "iv_end", bin_seconds=bin_s, by="k",
            )
            return out.select(
                "k", F.unix_timestamp("ts").alias("ts_s"), "ivid"
            )

        return build, sql

    if kind == "twa":
        rows = _rand_event_rows(rng, rng.randint(4, 30), keys)
        bkt = rng.choice([60, 300, 600])
        # (k, ts) unique by construction, so ts alone is the total order
        vals = ", ".join(
            f"({k}, {s_}, {v!r})" for k, s_, v in rows
        )
        sql = (
            f"WITH raw AS (SELECT * FROM (VALUES {vals}) AS __r(k, s, v)), "
            + f"""
            e AS (
              -- 1704067200 = epoch(2024-01-01), the _events_df base
              SELECT k, CAST(s + 1704067200 AS BIGINT) AS s,
                     CAST(CAST(v AS DECIMAL(20,4)) * 10000 AS BIGINT) AS cents
              FROM raw WHERE v IS NOT NULL
            ), w AS (
              SELECT k, s AS st, cents,
                     lead(s) OVER (PARTITION BY k ORDER BY s) AS en
              FROM e
            ), seg AS (
              SELECT k, st, en, cents FROM w WHERE en IS NOT NULL AND en > st
            ), ex AS (
              SELECT k, cents, st, en,
                     unnest(range(CAST(floor(st / {bkt}) AS BIGINT),
                                  CAST(floor((en - 1) / {bkt}) AS BIGINT) + 1)) AS b
              FROM seg
            ), c AS (
              SELECT k, b * {bkt} AS bucket,
                     LEAST(en, (b + 1) * {bkt}) - GREATEST(st, b * {bkt}) AS wsec,
                     cents
              FROM ex
            )
            SELECT k, bucket, CAST(SUM(wsec) AS BIGINT) AS w_seconds,
                   CAST(SUM(CAST(cents * wsec AS DECIMAL(38,0))) AS DOUBLE)
                     / (10000.0 * CAST(SUM(wsec) AS BIGINT)) AS twa
            FROM c GROUP BY k, bucket
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.streaming.windows import time_weighted_avg

            df = _events_df(spark, rows)
            out = time_weighted_avg(df, "ts", "k", "v", bkt)
            return out

        return build, sql

    rows = _rand_event_rows(rng, rng.randint(5, 40), keys)
    if kind == "resample":
        iv = rng.choice([60, 300, 600])
        sql = (
            "WITH " + _events_cte("ev", rows)
            + f"""
            , e AS (
              SELECT k,
                     CAST(floor(epoch(ts) / {iv}) AS BIGINT) * {iv} AS bucket,
                     v FROM ev
            ), agg AS (
              SELECT k, bucket, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s
              FROM e GROUP BY k, bucket
            ), spans AS (
              SELECT k, MIN(bucket) AS lo, MAX(bucket) AS hi FROM e GROUP BY k
            ), grid AS (
              SELECT k, unnest(range(lo, hi + {iv}, {iv})) AS bucket FROM spans
            ), j AS (
              SELECT g.k, g.bucket, a.n, a.s
              FROM grid g LEFT JOIN agg a ON g.k = a.k AND g.bucket = a.bucket
            )
            SELECT k, bucket, coalesce(n, 0) AS n_events, ROUND(s, 6) AS s6,
                   ROUND(last_value(s IGNORE NULLS) OVER (
                     PARTITION BY k ORDER BY bucket
                     ROWS UNBOUNDED PRECEDING), 6) AS f6
            FROM j
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.streaming.windows import resample_events

            out = resample_events(
                _events_df(spark, rows), iv, key_col="k", val_col="v"
            )
            return out.select(
                "k",
                F.unix_timestamp("bucket_ts").alias("bucket"),
                "n_events",
                F.round("sum_value", 6).alias("s6"),
                F.round("ffill_value", 6).alias("f6"),
            )

        return build, sql

    base = rng.choice([60, 300])
    m1, m2 = rng.choice([(2, 3), (6, 4), (5, 2)])
    i0, i1, i2 = base, base * m1, base * m1 * m2
    sql = (
        "WITH " + _events_cte("ev", rows)
        + f"""
        , h AS (
          SELECT {i0} AS resolution, k,
                 CAST(floor(epoch(ts) / {i0}) AS BIGINT) * {i0} AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s
          FROM ev GROUP BY k, 3
        ), m AS (
          SELECT {i1} AS resolution, k,
                 CAST(floor(bucket / {i1}) AS BIGINT) * {i1} AS bucket,
                 CAST(SUM(n) AS BIGINT) AS n, SUM(s) AS s
          FROM h GROUP BY k, 3
        ), c AS (
          SELECT {i2} AS resolution, k,
                 CAST(floor(bucket / {i2}) AS BIGINT) * {i2} AS bucket,
                 CAST(SUM(n) AS BIGINT) AS n, SUM(s) AS s
          FROM m GROUP BY k, 3
        )
        SELECT resolution, k, bucket, n AS n_events, ROUND(s, 6) AS s6
        FROM (SELECT * FROM h UNION ALL SELECT * FROM m UNION ALL SELECT * FROM c)
        """
    )

    def build(spark, sf_dir):
        from pigout_spark.streaming.windows import rollup_timeseries

        out = rollup_timeseries(
            _events_df(spark, rows), [i0, i1, i2], key_col="k", val_col="v"
        )
        return out.select(
            "resolution", "k", "bucket", "n_events",
            F.round("sum_value", 6).alias("s6"),
        )

    return build, sql


# -------------------------------------------------------------- behavioral ---
def _rand_typed_rows(rng: random.Random, n: int, keys: int, types: list):
    """(k, s, typ, v) rows — ties on (k, s) ALLOWED (sessionize/funnel
    assignment is tie-invariant; the fuzzer exercises that claim)."""
    return [
        (
            rng.randint(0, keys - 1),
            rng.randint(0, 7200),
            rng.choice(types),
            round(rng.uniform(-100, 100), 3),
        )
        for _ in range(n)
    ]


def _typed_cte(name: str, rows) -> str:
    vals = ", ".join(
        f"({k}, {_ts_sql(s)}, '{t}', {v!r})" for k, s, t, v in rows
    )
    return f"{name} AS (SELECT * FROM (VALUES {vals}) AS __{name}(k, ts, typ, v))"


def _typed_df(spark, rows):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(k, t0 + dt.timedelta(seconds=s), t, v) for k, s, t, v in rows],
        "k long, ts timestamp, typ string, v double",
    )


def gen_behavioral(rng: random.Random):
    """Differential-fuzz the behavioral ops: sessionize vs the lag/
    cumsum SQL, ordered funnel vs the chained-window CTE, cohort
    retention, histogram, and the interval-overlap join vs the plain
    overlap-predicate join."""
    kind = rng.choice(["session", "funnel", "cohort", "hist", "overlap"])
    keys = rng.randint(1, 4)
    types = ["a", "b", "c", "d"]
    rows = _rand_typed_rows(rng, rng.randint(5, 40), keys, types)

    if kind == "session":
        gap = rng.choice([30, 120, 600])
        sql = (
            "WITH " + _typed_cte("ev", rows)
            + f"""
            , flags AS (
              SELECT k, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > {gap}
                          THEN 1 ELSE 0 END AS nf
              FROM ev WINDOW w AS (PARTITION BY k ORDER BY ts)
            ), s AS (
              SELECT k, ts,
                     SUM(nf) OVER (PARTITION BY k ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
              FROM flags
            )
            SELECT k, CAST(sid AS BIGINT) AS session_seq,
                   CAST(epoch(MIN(ts)) AS BIGINT) AS start_s,
                   CAST(epoch(MAX(ts)) AS BIGINT) AS end_s,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM s GROUP BY k, sid
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.behavioral import session_stats

            out = session_stats(
                _typed_df(spark, rows), key="k", gap_seconds=gap
            )
            return out.select(
                "k", "session_seq",
                F.unix_timestamp("session_start").alias("start_s"),
                F.unix_timestamp("session_end").alias("end_s"),
                "n_events",
            )

        return build, sql

    if kind == "funnel":
        k_steps = rng.randint(2, 3)
        steps = rng.sample(types, k_steps)
        within = rng.choice([None, 600, 3600])
        ctes, prev = [], None
        for i, st in enumerate(steps, start=1):
            cond = f"typ = '{st}'" + (f" AND ts > t{i-1}" if prev else "")
            if prev and within is not None:
                cond += f" AND epoch(ts) <= epoch(t{i-1}) + {within}"
            src = f"c{i-1}" if prev else "ev"
            ctes.append(
                f"c{i} AS (SELECT *, MIN(CASE WHEN {cond} THEN ts END)"
                f" OVER (PARTITION BY k) AS t{i} FROM {src})"
            )
            prev = f"t{i}"
        sel = ", ".join(
            f"CAST(epoch(MIN(t{i})) AS BIGINT) AS s{i}"
            for i in range(1, k_steps + 1)
        )
        stage = "CASE " + " ".join(
            f"WHEN MIN(t{i}) IS NOT NULL THEN {i}"
            for i in range(k_steps, 0, -1)
        ) + " ELSE 0 END AS funnel_stage"
        sql = (
            "WITH " + _typed_cte("ev", rows) + ", " + ", ".join(ctes)
            + f" SELECT k, {sel}, {stage} FROM c{k_steps} GROUP BY k"
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.behavioral import funnel_steps

            out = funnel_steps(
                _typed_df(spark, rows), steps, key="k", step_col="typ",
                within_seconds=within,
            )
            return out.select(
                "k",
                *[
                    F.unix_timestamp(f"step_{i}_ts").alias(f"s{i}")
                    for i in range(1, k_steps + 1)
                ],
                "funnel_stage",
            )

        return build, sql

    if kind == "cohort":
        period = rng.choice([600, 3600, 86400])
        sql = (
            "WITH " + _typed_cte("ev", rows)
            + f"""
            , e AS (
              SELECT k, CAST(floor(epoch(ts) / {period}) AS BIGINT) AS p
              FROM ev
            ), m AS (
              SELECT k, p, MIN(p) OVER (PARTITION BY k) AS cohort FROM e
            ), d AS (
              SELECT DISTINCT k, cohort, p - cohort AS period_offset FROM m
            )
            SELECT cohort, period_offset, CAST(COUNT(*) AS BIGINT) AS n_keys
            FROM d GROUP BY cohort, period_offset
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.behavioral import cohort_retention

            return cohort_retention(
                _typed_df(spark, rows), key="k", period_seconds=period
            )

        return build, sql

    if kind == "hist":
        nbins = rng.choice([1, 5, 13])
        lo = round(rng.uniform(-120, 0), 1)
        hi = round(lo + rng.uniform(10, 250), 1)
        width = (hi - lo) / nbins
        sql = (
            "WITH " + _typed_cte("ev", rows)
            + f"""
            , v AS (
              SELECT LEAST({nbins - 1}, GREATEST(0,
                       CAST(floor((CAST(v AS DOUBLE) - CAST('{lo!r}' AS DOUBLE))
                                  / CAST('{width!r}' AS DOUBLE)) AS BIGINT))) AS bin
              FROM ev WHERE v IS NOT NULL
            )
            SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST('{lo!r}' AS DOUBLE)
                     + bin * CAST('{width!r}' AS DOUBLE) AS bin_lo
            FROM v GROUP BY bin
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.behavioral import histogram

            return histogram(_typed_df(spark, rows), "v", nbins, lo, hi)

        return build, sql

    # overlap join: two interval sets, spans 0..1500s (many bins at 60)
    by = rng.random() < 0.7
    bin_s = rng.choice([60, 300])
    l_rows = [
        (k, s, rng.randint(0, 1500), i)
        for i, (k, s, _, _) in enumerate(
            _rand_typed_rows(rng, rng.randint(3, 20), keys, types)
        )
    ]
    r_rows = [
        (k, s, rng.randint(0, 1500), i)
        for i, (k, s, _, _) in enumerate(
            _rand_typed_rows(rng, rng.randint(3, 20), keys, types)
        )
    ]

    def iv_cte(name, rws, a, b, idc):
        vals = ", ".join(
            f"({k}, {_ts_sql(s)}, {_ts_sql(s + span)}, {i})"
            for k, s, span, i in rws
        )
        return f"{name} AS (SELECT * FROM (VALUES {vals}) AS __{name}(k, {a}, {b}, {idc}))"

    key_pred = "l.k = r.k AND " if by else ""
    sql = (
        "WITH " + iv_cte("l", l_rows, "l_start", "l_end", "lid")
        + ", " + iv_cte("r", r_rows, "r_start", "r_end", "rid")
        + f"""
        SELECT l.lid, r.rid
        FROM l JOIN r
          ON {key_pred}l.l_start <= r.r_end AND r.r_start <= l.l_end
        """
    )

    def iv_df(spark, rws, a, b, idc):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [
                (k, t0 + dt.timedelta(seconds=s),
                 t0 + dt.timedelta(seconds=s + span), i)
                for k, s, span, i in rws
            ],
            f"k long, {a} timestamp, {b} timestamp, {idc} long",
        )

    def build(spark, sf_dir):
        from pigout_spark.operators.joins import overlap_join

        l = iv_df(spark, l_rows, "l_start", "l_end", "lid")
        r = iv_df(spark, r_rows, "r_start", "r_end", "rid")
        if not by:
            r = r.withColumnRenamed("k", "k2")
        out = overlap_join(
            l, r, "l_start", "l_end", "r_start", "r_end",
            bin_seconds=bin_s, by="k" if by else None,
        )
        return out.select("lid", "rid")

    return build, sql


# ------------------------------------------------------------------- graph ---
def gen_graph(rng: random.Random):
    """Differential-fuzz fixed-iteration PageRank: random digraphs
    (self-loops, parallel-edge collapses via DISTINCT, dangling nodes,
    disconnected parts), randomly WEIGHTED (integer edge weights,
    rank·w div Σw) and/or PERSONALIZED (teleport confined to a random
    seed subset) — vs the dynamically regenerated unrolled CTE
    oracle."""
    n_nodes = rng.randint(3, 25)
    n_edges = rng.randint(2, 80)
    iters = rng.randint(1, 4)
    weighted = rng.random() < 0.5
    edges = sorted({
        (f"n{rng.randint(0, n_nodes)}", f"n{rng.randint(0, n_nodes)}")
        for _ in range(n_edges)
    })
    wts = {e: (rng.randint(1, 9) if weighted else 1) for e in edges}
    node_ids = sorted({x for e in edges for x in e})
    seeds = (
        sorted(rng.sample(node_ids, rng.randint(1, min(4, len(node_ids)))))
        if rng.random() < 0.5
        else None
    )
    ns = len(seeds) if seeds else None
    if seeds:
        sl = ", ".join(f"'{s}'" for s in seeds)
        base = (f"CASE WHEN {{col}} IN ({sl})"
                f" THEN CAST(150000000000 // {ns} AS BIGINT)"
                f" ELSE CAST(0 AS BIGINT) END")
        r0v = (f"CASE WHEN {{col}} IN ({sl})"
               f" THEN CAST(1000000000000 // {ns} AS BIGINT)"
               f" ELSE CAST(0 AS BIGINT) END")
    else:
        base = "CAST(150000000000 // (SELECT n FROM nn) AS BIGINT)"
        r0v = "CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT)"
    vals = ", ".join(
        f"('{a}', '{b}', {wts[(a, b)]})" for a, b in edges
    )
    ctes = [
        f"e AS (SELECT * FROM (VALUES {vals}) AS __e(s, d, w))",
        "deg AS (SELECT s, CAST(SUM(w) AS BIGINT) AS deg FROM e GROUP BY s)",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT s AS node FROM e UNION SELECT d FROM e))",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"r0 AS (SELECT node, {r0v.format(col='node')} AS u FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT e.d AS node,"
            f" CAST(SUM((r.u * e.w) // deg.deg) AS BIGINT) AS cs"
            f" FROM e JOIN deg USING (s) JOIN r{i-1} r ON r.node = e.s"
            f" GROUP BY e.d)"
        )
        ctes.append(
            f"r{i} AS (SELECT nodes.node,"
            f" CAST({base.format(col='nodes.node')}"
            f"      + (85 * coalesce(c{i}.cs, 0)) // 100 AS BIGINT) AS u"
            f" FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node)"
        )
    sql = (
        "WITH " + ",\n".join(ctes)
        + f" SELECT node, CAST(u AS DOUBLE) / 1000000000000.0 AS rank"
        f" FROM r{iters}"
    )

    def build(spark, sf_dir, seeds=seeds):
        from pigout_spark.pipeline.graph import pagerank

        df = spark.createDataFrame(
            [(a, b, wts[(a, b)]) for a, b in edges],
            "src string, dst string, w long",
        )
        return pagerank(
            df, iterations=iters, weight_col="w", seeds=seeds
        )

    return build, sql



# ---------------------------------------------------------------- sketches ---


def gen_sketch(rng: random.Random):
    """Differential-fuzz the deterministic sketch family with random
    parameters: q-digest (random k/levels/scale/filters — the unrolled
    CTE oracle chain is regenerated per draw, so the level recurrence
    itself is fuzzed, not one fixed instantiation), keyed KMV (QUALIFY
    twin), and KMV Jaccard (random type pair and k)."""
    from pigout_spark.queries.pipeline_q import (
        _KJ_HASH,
        qdigest_quantiles_sql,
        qdigest_sketch_sql,
    )

    kind = rng.choice(["qd_sketch", "qd_quantiles", "kmv_keyed", "kmv_jacc"])
    types = ["click", "view", "purchase", "signup", "error"]

    if kind in ("qd_sketch", "qd_quantiles"):
        from pigout_spark.pipeline.sketches import qdigest_build, qdigest_quantiles

        scale = rng.choice([1, 2, 4, 8])
        levels = 10 + scale.bit_length() - 1 + rng.randint(0, 2)
        k = rng.choice([8, 16, 32, 64, 128])
        preds = ["value IS NOT NULL"]
        fpreds = []
        if rng.random() < 0.5:
            chosen = rng.sample(types, rng.randint(1, 3))
            inlist = ", ".join(f"'{c}'" for c in chosen)
            preds.append(f"event_type IN ({inlist})")
            fpreds.append(f"event_type IN ({inlist})")
        if rng.random() < 0.4:
            cut = round(rng.uniform(5, 200), 2)
            preds.append(f"value < {cut}")
            fpreds.append(f"value < {cut}")
        vals_sql = (
            f"SELECT CAST(floor(value * {scale}) AS BIGINT) AS v "
            f"FROM events WHERE {' AND '.join(preds)}"
        )
        qs = sorted(
            round(rng.uniform(0.01, 0.99), 2) for _ in range(rng.randint(1, 4))
        )

        def build(spark, sf_dir, scale=scale, k=k, levels=levels,
                  fpreds=tuple(fpreds), kind=kind, qs=tuple(qs)):
            ev = load_table(spark, sf_dir, "events")
            for p in fpreds:
                ev = ev.filter(p)
            src = ev.select(
                F.floor(F.col("value") * scale).cast("bigint").alias("v")
            )
            d = qdigest_build(src, "v", k=k, levels=levels)
            if kind == "qd_quantiles":
                return qdigest_quantiles(d, list(qs), k=k, levels=levels)
            return d

        sql = (
            qdigest_quantiles_sql(k, levels, list(qs), vals_sql)
            if kind == "qd_quantiles"
            else qdigest_sketch_sql(k, levels, vals_sql)
        )
        return build, sql

    if kind == "kmv_keyed":
        from pigout_spark.pipeline.sketches import kmv_build

        k = rng.choice([4, 8, 16, 32])

        def build(spark, sf_dir, k=k):
            return kmv_build(
                load_table(spark, sf_dir, "events"), "user_id", k=k,
                keys=["event_type"],
            )

        sql = f"""
        WITH hs AS (
          SELECT DISTINCT event_type, {_KJ_HASH} AS h
          FROM events WHERE user_id IS NOT NULL
        )
        SELECT event_type, h, CAST({k} AS INTEGER) AS k FROM hs
        QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h) <= {k}
        """
        return build, sql

    from pigout_spark.pipeline.sketches import kmv_build, kmv_jaccard

    ta, tb = rng.sample(types, 2)
    k = rng.choice([8, 16, 32, 64, 128])

    def build(spark, sf_dir, ta=ta, tb=tb, k=k):
        ev = load_table(spark, sf_dir, "events")
        a = kmv_build(ev.filter(F.col("event_type") == ta), "user_id", k=k)
        b = kmv_build(ev.filter(F.col("event_type") == tb), "user_id", k=k)
        return kmv_jaccard(a, b, k=k)

    sql = f"""
    WITH s1 AS (
      SELECT h FROM (
        SELECT DISTINCT {_KJ_HASH} AS h FROM events
        WHERE event_type = '{ta}' AND user_id IS NOT NULL
      ) ORDER BY h LIMIT {k}
    ), s2 AS (
      SELECT h FROM (
        SELECT DISTINCT {_KJ_HASH} AS h FROM events
        WHERE event_type = '{tb}' AND user_id IS NOT NULL
      ) ORDER BY h LIMIT {k}
    ), m AS (
      SELECT h FROM (
        SELECT DISTINCT h FROM (SELECT h FROM s1 UNION ALL SELECT h FROM s2)
      ) ORDER BY h LIMIT {k}
    ), t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_merged FROM m
    ), c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_common FROM m
      WHERE h IN (SELECT h FROM s1) AND h IN (SELECT h FROM s2)
    )
    SELECT n_merged, n_common,
           CAST(n_common AS DOUBLE) / GREATEST(n_merged, 1) AS jaccard
    FROM t, c
    """
    return build, sql


# ------------------------------------------------- attribution / rfm fuzz ---


def _id_cte(name: str, rows) -> str:
    vals = ", ".join(
        f"({i}, {k}, {_ts_sql(s)}, '{t}', {v!r})"
        for i, (k, s, t, v) in enumerate(rows)
    )
    return (
        f"{name} AS (SELECT * FROM (VALUES {vals})"
        f" AS __{name}(id, k, ts, typ, v))"
    )


def _id_df(spark, rows):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, k, t0 + dt.timedelta(seconds=s), t, v)
            for i, (k, s, t, v) in enumerate(rows)
        ],
        "id long, k long, ts timestamp, typ string, v double",
    )


def gen_attribution(rng: random.Random):
    """Differential-fuzz attribution (random model/lookback over random
    journeys with timestamp ties — the (ts, id) tie rule is the thing
    under test) and RFM (random cut points, negative values allowed)."""
    kind = rng.choice(["attrib", "rfm"])
    rows = _rand_typed_rows(rng, rng.randint(8, 50), rng.randint(1, 4),
                            ["a", "b", "p"])

    if kind == "attrib":
        model = rng.choice(["last", "first", "linear"])
        lb = rng.choice([None, 60, 600, 3600])
        lb_sql = f"AND epoch(cts) - epoch(tts) <= {lb}" if lb else ""
        if model == "linear":
            head = ("SELECT k, conv_id, touch_id, touch_type,"
                    " 1.0 / (COUNT(*) OVER (PARTITION BY conv_id)) AS credit"
                    " FROM j")
        else:
            ordr = "DESC" if model == "last" else "ASC"
            head = (f"SELECT k, conv_id, touch_id, touch_type, 1.0 AS credit"
                    f" FROM j QUALIFY row_number() OVER (PARTITION BY conv_id"
                    f" ORDER BY tts {ordr}, touch_id {ordr}) = 1")
        sql = f"""
        WITH {_id_cte("ev", rows)},
        c AS (SELECT k, id AS conv_id, ts AS cts FROM ev WHERE typ = 'p'),
        t0 AS (SELECT k, id AS touch_id, typ AS touch_type, ts AS tts
               FROM ev WHERE typ IN ('a', 'b')),
        j AS (SELECT c.k, conv_id, touch_id, touch_type, tts
              FROM c JOIN t0 USING (k)
              WHERE (tts < cts OR (tts = cts AND touch_id < conv_id)) {lb_sql})
        {head}
        """

        def build(spark, sf_dir, model=model, lb=lb):
            from pigout_spark.pipeline.behavioral import attribution

            return attribution(
                _id_df(spark, rows), conversion="p", touch_types=("a", "b"),
                model=model, lookback_seconds=lb,
                ts_col="ts", key="k", type_col="typ", id_col="id",
            )

        return build, sql

    rb = sorted(round(rng.uniform(0, 7200), 1) for _ in range(rng.randint(1, 3)))
    fb = sorted(round(rng.uniform(1, 20), 1) for _ in range(rng.randint(1, 3)))
    mb = sorted(round(rng.uniform(-200, 800), 1) for _ in range(rng.randint(1, 3)))

    def score_sql(col, bounds, reverse=False):
        terms = " + ".join(
            f"(CASE WHEN {col} > {b} THEN 1 ELSE 0 END)" for b in bounds
        )
        s = f"(1 + {terms})"
        return f"({len(bounds) + 2} - {s})" if reverse else s

    sql = f"""
    WITH {_id_cte("ev", rows)},
    a AS (
      SELECT k, MAX(epoch(ts)) AS last_s, CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(v AS DECIMAL(20,4))) AS DOUBLE) AS monetary
      FROM ev GROUP BY k
    ), nw AS (SELECT MAX(last_s) AS now_s FROM a),
    rec AS (
      SELECT k, CAST(now_s - last_s AS BIGINT) AS recency_s, frequency, monetary
      FROM a, nw
    )
    SELECT k, recency_s, frequency, monetary,
           CAST({score_sql("recency_s", rb, True)} AS INTEGER) AS r,
           CAST({score_sql("frequency", fb)} AS INTEGER) AS f,
           CAST({score_sql("monetary", mb)} AS INTEGER) AS m,
           CAST({score_sql("recency_s", rb, True)} * 100
                + {score_sql("frequency", fb)} * 10
                + {score_sql("monetary", mb)} AS INTEGER) AS segment
    FROM rec
    """

    def build(spark, sf_dir, rb=rb, fb=fb, mb=mb):
        from pigout_spark.pipeline.behavioral import rfm

        return rfm(
            _id_df(spark, rows), r_bounds=rb, f_bounds=fb, m_bounds=mb,
            ts_col="ts", key="k", value_col="v",
        )

    return build, sql



def gen_r7(rng: random.Random):
    """Differential-fuzz the round-7 operators: Markov transitions
    (random gap/ties), MAD outliers (random threshold, duplicate
    values), BM25 (random corpus + query vocabulary), and the
    edit-distance join (tiny alphabet vs the naive DP answer)."""
    kind = rng.choice(["transitions", "mad", "bm25", "edjoin", "lpa", "scd2",
                       "pctile", "ablift", "mmr", "ngrams"])

    if kind == "ngrams":
        rows = _rand_typed_rows(rng, rng.randint(8, 50), rng.randint(1, 4),
                                ["a", "b", "c"])
        gap = rng.choice([60, 600, 3600])
        ng = rng.randint(2, 4)
        lag_cols = ", ".join(
            f"lag(typ, {ng - 1 - i}) OVER w2 AS s{i}" for i in range(ng - 1)
        )
        concat = " || '>' || ".join([f"s{i}" for i in range(ng - 1)] + ["typ"])
        sql = f"""
        WITH {_id_cte("ev", rows)},
        flags AS (
          SELECT k, id, typ, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch(ts) - epoch(lag(ts) OVER w) > {gap}
                      THEN 1 ELSE 0 END AS nf
          FROM ev WINDOW w AS (PARTITION BY k ORDER BY ts, id)
        ), s AS (
          SELECT k, id, typ, ts,
                 SUM(nf) OVER (PARTITION BY k ORDER BY ts, id
                               ROWS UNBOUNDED PRECEDING) AS seq
          FROM flags
        ), g AS (
          SELECT {lag_cols}, typ
          FROM s WINDOW w2 AS (PARTITION BY k, seq ORDER BY ts, id)
        )
        SELECT {concat} AS gram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM g WHERE s0 IS NOT NULL GROUP BY 1
        """

        def build(spark, sf_dir, gap=gap, ng=ng):
            from pigout_spark.pipeline.behavioral import session_ngrams

            return session_ngrams(
                _id_df(spark, rows), n=ng, ts_col="ts", key="k",
                step_col="typ", tiebreak="id", gap_seconds=gap,
            )

        return build, sql


    if kind == "mmr":
        from pigout_spark.queries.pipeline_q import _mmr_sql

        dim = rng.randint(2, 6)
        n = rng.randint(6, 16)
        qmax = rng.randint(1, 3)
        ncand = rng.randint(4, min(8, n - 1))
        lam = rng.choice([0.3, 0.5, 0.7])
        vecs = [
            (i, [round(rng.uniform(-1, 1), 3) or 0.001 for _ in range(dim)])
            for i in range(n)
        ]
        # avoid zero vectors (cosine undefined)
        vecs = [
            (i, v if any(abs(x) > 1e-9 for x in v) else [1.0] * dim)
            for i, v in vecs
        ]
        vals = ", ".join(
            "(" + str(i) + ", [" + ", ".join(repr(x) for x in v) + "])"
            for i, v in vecs
        )
        emb_cte = (
            f"(SELECT * FROM (VALUES {vals}) AS __emb(vec_id, embedding))"
        )
        sql = _mmr_sql(emb_cte, qmax=qmax, ncand=ncand, lam=lam)

        def build(spark, sf_dir, qmax=qmax, ncand=ncand, lam=lam):
            from pigout_spark.pipeline.similarity import mmr_rerank

            df = spark.createDataFrame(
                vecs, "vec_id long, embedding array<double>"
            )
            out = mmr_rerank(
                df, df.filter(F.col("vec_id") < qmax),
                n_candidates=ncand, k=3, lam=lam,
            )
            return out.select(
                "q_id", "rank", "neighbor_id",
                F.round("score", 6).alias("score"),
            )

        return build, sql


    if kind == "pctile":
        n = rng.randint(3, 40)
        # force ties: scores drawn from a small integer pool
        pool = [float(rng.randint(0, 6)) for _ in range(rng.randint(2, 8))]
        rows = [(i, rng.choice(pool)) for i in range(n)]
        vals = ", ".join(f"({i}, {s})" for i, s in rows)
        sql = f"""
        WITH t(id, s) AS (SELECT * FROM (VALUES {vals}))
        SELECT id, CAST(s AS DOUBLE) AS s,
               CAST(percent_rank() OVER (ORDER BY s) AS DOUBLE) AS pct_rank
        FROM t
        """

        def build(spark, sf_dir):
            from pigout_spark.operators.sorting import percentile_rank

            df = spark.createDataFrame(rows, "id bigint, s double")
            return percentile_rank(df, "s", ["id"])

        return build, sql

    if kind == "ablift":
        import hashlib

        frac = rng.choice([0.3, 0.5, 0.7])
        fseed = str(rng.randint(0, 99))
        for _ in range(50):
            n = rng.randint(8, 40)
            rows = [(i, round(rng.uniform(-50, 50), 3)) for i in range(n)]

            def arm(uid):
                h = hashlib.md5(f"{fseed}|{uid}".encode()).hexdigest()
                return int(h[:8], 16) / 4294967296.0 < frac

            n_t = sum(1 for i, _ in rows if arm(i))
            if 2 <= n_t <= n - 2:
                break
        vals = ", ".join(f"({i}, {v})" for i, v in rows)
        sql = f"""
        WITH t0(uid, v0) AS (SELECT * FROM (VALUES {vals})),
        t AS (SELECT uid, CAST(v0 AS DOUBLE) AS v FROM t0),
        a AS (
          SELECT v,
                 ('0x' || substring(md5('{fseed}' || '|' ||
                    coalesce(uid::VARCHAR, chr(0))), 1, 8))::BIGINT
                 / 4294967296.0 < {frac} AS is_t
          FROM t
        ), s AS (
          SELECT CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
                 CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
                 CAST(SUM(CAST(CASE WHEN is_t THEN v ELSE 0.0 END
                               AS DECIMAL(24,8))) AS DOUBLE) AS sx_t,
                 CAST(SUM(CAST(CASE WHEN is_t THEN 0.0 ELSE v END
                               AS DECIMAL(24,8))) AS DOUBLE) AS sx_c,
                 CAST(SUM(CAST(CASE WHEN is_t THEN v * v ELSE 0.0 END
                               AS DECIMAL(30,8))) AS DOUBLE) AS sxx_t,
                 CAST(SUM(CAST(CASE WHEN is_t THEN 0.0 ELSE v * v END
                               AS DECIMAL(30,8))) AS DOUBLE) AS sxx_c
          FROM a
        )
        SELECT n_c, n_t,
               ROUND(sx_c / n_c, 6) AS mean_c6,
               ROUND(sx_t / n_t, 6) AS mean_t6,
               ROUND(sx_t / n_t - sx_c / n_c, 6) AS lift6,
               ROUND((sx_t / n_t - sx_c / n_c)
                 / sqrt(((n_t * sxx_t - sx_t * sx_t) / (n_t * (n_t - 1))) / n_t
                      + ((n_c * sxx_c - sx_c * sx_c) / (n_c * (n_c - 1))) / n_c),
                 6) AS z6
        FROM s
        """

        def build(spark, sf_dir, frac=frac, fseed=fseed):
            from pigout_spark.pipeline.behavioral import ab_lift

            df = spark.createDataFrame(rows, "uid bigint, v double")
            out = ab_lift(df, "v", ["uid"], treat_frac=frac, seed=fseed)
            return out.select(
                "n_c", "n_t",
                F.round("mean_c", 6).alias("mean_c6"),
                F.round("mean_t", 6).alias("mean_t6"),
                F.round("lift", 6).alias("lift6"),
                F.round("z", 6).alias("z6"),
            )

        return build, sql


    if kind == "lpa":
        n_nodes = rng.randint(3, 20)
        n_edges = rng.randint(2, 60)
        rounds = rng.randint(1, 4)
        edges = sorted({
            (rng.randint(0, n_nodes), rng.randint(0, n_nodes))
            for _ in range(n_edges)
        })
        if not [1 for a, b in edges if a != b]:
            edges.append((0, 1))
        vals = ", ".join(f"({a}, {b})" for a, b in edges)
        parts = [
            f"e0 AS (SELECT * FROM (VALUES {vals}) AS __e(a, b))",
            "edges AS (SELECT a AS u, b AS v FROM e0 WHERE a <> b"
            " UNION SELECT b, a FROM e0 WHERE a <> b)",
            "nodes AS (SELECT DISTINCT u AS node FROM edges)",
            "l0 AS (SELECT node, node AS label FROM nodes)",
        ]
        for i in range(1, rounds + 1):
            parts.append(
                f"m{i} AS (SELECT e.v AS node, l.label, COUNT(*) AS c"
                f" FROM edges e JOIN l{i-1} l ON l.node = e.u"
                f" GROUP BY e.v, l.label),"
                f" b{i} AS (SELECT node, label FROM m{i}"
                f" QUALIFY row_number() OVER (PARTITION BY node"
                f" ORDER BY c DESC, label ASC) = 1),"
                f" l{i} AS (SELECT n.node,"
                f" COALESCE(b.label, l.label) AS label"
                f" FROM nodes n JOIN l{i-1} l USING (node)"
                f" LEFT JOIN b{i} b USING (node))"
            )
        sql = (
            "WITH " + ",\n".join(parts)
            + f" SELECT CAST(node AS BIGINT) AS node,"
            f" CAST(label AS BIGINT) AS label FROM l{rounds}"
        )

        def build(spark, sf_dir, rounds=rounds):
            from pigout_spark.pipeline.graph import label_propagation

            df = spark.createDataFrame(edges, "src bigint, dst bigint")
            return label_propagation(df, rounds=rounds)

        return build, sql

    if kind == "scd2":
        # NULL attribute transitions are pytest-covered; _id_cte writes
        # string literals, so the fuzz sticks to non-null types.
        rows = _rand_typed_rows(rng, rng.randint(6, 40), rng.randint(1, 3),
                                ["a", "b"])
        sql = f"""
        WITH {_id_cte("ev0", rows)},
        g AS (
          SELECT k, id, typ, ts, lag(typ) OVER w AS ptyp,
                 lag(id) OVER w IS NULL AS first
          FROM ev0 WINDOW w AS (PARTITION BY k ORDER BY ts, id)
        ), st AS (
          SELECT k, id, typ, ts FROM g
          WHERE first OR typ IS DISTINCT FROM ptyp
        )
        SELECT k, typ,
               CAST(epoch(ts) AS BIGINT) AS from_s,
               CAST(epoch(lead(ts) OVER w2) AS BIGINT) AS to_s,
               lead(ts) OVER w2 IS NULL AS is_current
        FROM st WINDOW w2 AS (PARTITION BY k ORDER BY ts, id)
        """

        def build(spark, sf_dir):
            from pigout_spark.pipeline.scd import scd2_build

            df = _id_df(spark, rows).select("k", "id", "ts", "typ")
            out = scd2_build(df, key="k", ts_col="ts", attrs=["typ"],
                             tiebreak="id")
            return out.select(
                "k", "typ",
                F.unix_timestamp("valid_from").alias("from_s"),
                F.unix_timestamp("valid_to").alias("to_s"),
                "is_current",
            )

        return build, sql


    if kind == "transitions":
        rows = _rand_typed_rows(rng, rng.randint(8, 50), rng.randint(1, 4),
                                ["a", "b", "c"])
        gap = rng.choice([None, 60, 600])
        gap_sql = (
            f"AND epoch(ts) - epoch(pts) <= {gap}" if gap is not None else ""
        )
        sql = f"""
        WITH {_id_cte("ev", rows)},
        g AS (
          SELECT typ, ts,
                 lag(ts) OVER w AS pts, lag(typ) OVER w AS pstep
          FROM ev WINDOW w AS (PARTITION BY k ORDER BY ts, id)
        )
        SELECT pstep AS from_step, typ AS to_step,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM g WHERE pstep IS NOT NULL {gap_sql}
        GROUP BY pstep, typ
        """

        def build(spark, sf_dir, gap=gap):
            from pigout_spark.pipeline.behavioral import event_transitions

            return event_transitions(
                _id_df(spark, rows), ts_col="ts", key="k", step_col="typ",
                tiebreak="id", gap_seconds=gap,
            )

        return build, sql

    if kind == "mad":
        rows = _rand_typed_rows(rng, rng.randint(6, 40), rng.randint(1, 3),
                                ["a"])
        if rng.random() < 0.4:
            rows = [(k, s, t, round(v, 0)) for k, s, t, v in rows]
        thr = rng.choice([0.5, 1.0, 3.0])
        # DuckDB types the VALUES literals DECIMAL (exact arithmetic);
        # Spark's doubles round — cast to DOUBLE so both engines run
        # the same IEEE chain (fixture artifact, not engine behavior).
        sql = f"""
        WITH {_id_cte("ev0", rows)},
        ev AS (SELECT id, k, ts, typ, CAST(v AS DOUBLE) AS v FROM ev0),
        r1 AS (
          SELECT k, id, v,
                 row_number() OVER (PARTITION BY k ORDER BY v, id) AS rn,
                 COUNT(*) OVER (PARTITION BY k) AS n
          FROM ev
        ), med AS (
          SELECT k, MIN(v) AS median FROM r1 WHERE rn = (n + 1) // 2 GROUP BY k
        ), dev AS (
          SELECT ev.k, ev.id, ev.v, med.median,
                 abs(ev.v - med.median) AS deviation
          FROM ev JOIN med USING (k)
        ), r2 AS (
          SELECT k, deviation,
                 row_number() OVER (PARTITION BY k
                                    ORDER BY deviation, id) AS rn,
                 COUNT(*) OVER (PARTITION BY k) AS n
          FROM dev
        ), mad AS (
          SELECT k, MIN(deviation) AS mad
          FROM r2 WHERE rn = (n + 1) // 2 GROUP BY k
        )
        SELECT dev.k, dev.id, dev.v, dev.median, mad.mad, dev.deviation
        FROM dev JOIN mad USING (k)
        WHERE dev.deviation > {thr} * mad.mad
        """

        def build(spark, sf_dir, thr=thr):
            from pigout_spark.pipeline.behavioral import mad_outliers

            return mad_outliers(
                _id_df(spark, rows), value_col="v", key="k",
                threshold=thr, id_cols=("id",),
            )

        return build, sql

    if kind == "bm25":
        rows = _rand_corpus(rng)
        vocab = sorted(
            {t for _, txt, _ in rows if txt for t in txt.split() if t}
        )
        if not vocab:
            vocab = ["w0"]
        terms = rng.sample(vocab, min(len(vocab), rng.randint(1, 3)))
        if rng.random() < 0.2:
            terms.append("zz-absent")
        k = rng.randint(1, 8)
        tlist = "(" + ", ".join("'" + t + "'" for t in terms) + ")"
        sql = f"""
        {_values_cte(rows)},
        f AS (SELECT doc_id, {_P_TOKS} AS toks FROM documents),
        dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM f),
        st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                      CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
               FROM dl),
        tfq AS (SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tfn
                FROM (SELECT doc_id, unnest(toks) AS tok FROM f)
                WHERE tok IN {tlist} GROUP BY doc_id, tok),
        dfc AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS dfn FROM tfq GROUP BY tok),
        c AS (SELECT tfq.doc_id,
                     CAST(ROUND(
                       ln((st.n - dfc.dfn + 0.5) / (dfc.dfn + 0.5) + 1)
                       * tfq.tfn * (1.2 + 1)
                       / (tfq.tfn + 1.2 * (1.0 - 0.75
                            + 0.75 * CAST(dl.dl AS DOUBLE) / st.avgdl)), 6)
                     AS DECIMAL(20,6)) AS c
              FROM tfq JOIN dfc USING (tok) JOIN dl USING (doc_id), st),
        s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
                     CAST(SUM(c) AS DECIMAL(27,6)) AS sc
              FROM c GROUP BY doc_id)
        SELECT doc_id, n_terms, CAST(sc AS DOUBLE) AS score
        FROM s ORDER BY sc DESC, doc_id LIMIT {k}
        """

        def build(spark, sf_dir, terms=tuple(terms), k=k):
            from pigout_spark.pipeline.text import bm25_topk

            corpus = spark.createDataFrame(
                rows, "doc_id long, text string, source string"
            )
            return bm25_topk(corpus, list(terms), k=k)

        return build, sql

    n = rng.randint(8, 24)
    maxlen = rng.randint(0, 6)
    strs = [
        "".join(rng.choice("ab") for _ in range(rng.randint(0, maxlen)))
        for _ in range(n)
    ]
    k = rng.randint(1, 2)
    vals = ", ".join(f"({i}, '{s}')" for i, s in enumerate(strs))
    sql = f"""
    WITH t(id, s) AS (SELECT * FROM (VALUES {vals})),
    j AS (
      SELECT a.id AS l_id, b.id AS r_id,
             CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
      FROM t a, t b
      WHERE abs(len(a.s) - len(b.s)) <= {k}
        AND levenshtein(a.s, b.s) <= {k}
    )
    SELECT * FROM j
    """

    def build(spark, sf_dir, strs=tuple(strs), k=k):
        from pigout_spark.operators.joins import edit_distance_join

        df = spark.createDataFrame(
            list(enumerate(strs)), "id bigint, s string"
        )
        return edit_distance_join(df, df, k=k, right_id="id")

    return build, sql




def gen_r8(rng: random.Random):
    """Differential-fuzz the round-8 operators: BFS / Bellman-Ford
    (random digraphs, seeds, budgets, directedness), CDC apply (random
    op logs incl. same-key multi-op compaction), OLS trend fit
    (integerized metrics, NULLs, degenerate keys), PSI/KS drift
    (random populations and binnings), item CF (random incidence with
    caps), and seasonal decomposition (random period parity/length)."""
    kind = rng.choice(
        ["bfs", "sssp", "cdc", "trend", "psi", "ks", "itemcf", "seasonal",
         "winsor", "abseg", "ntile", "skew", "diff", "rules",
         "km", "wq", "gini", "wilson"]
    )

    if kind in ("km", "wq", "gini", "wilson"):
        return {
            "km": _gen_km,
            "wq": _gen_wq,
            "gini": _gen_gini,
            "wilson": _gen_wilson,
        }[kind](rng)

    if kind == "diff":
        nk = rng.randint(1, 20)
        def snap():
            rows = []
            for k in range(nk):
                if rng.random() < 0.75:  # key present
                    rows.append(
                        (
                            k,
                            rng.choice(["a", "b", None]),
                            None if rng.random() < 0.2
                            else float(rng.randint(0, 3)),
                        )
                    )
            return rows
        old_rows, new_rows = snap(), snap()
        def vals(rows):
            return ", ".join(
                f"({k}, {'NULL' if sv is None else repr(sv)},"
                f" {'NULL' if v is None else repr(v)})"
                for k, sv, v in rows
            ) or "(NULL, NULL, NULL)"
        sql = f"""
        WITH o AS (SELECT * FROM (VALUES {vals(old_rows)}) t(k, s, v)
                   WHERE k IS NOT NULL),
        n AS (SELECT * FROM (VALUES {vals(new_rows)}) t(k, s, v)
              WHERE k IS NOT NULL),
        j AS (
          SELECT coalesce(o.k, n.k) AS k,
                 o.k IS NOT NULL AS in_old, n.k IS NOT NULL AS in_new,
                 o.s AS os, o.v AS ov, n.s AS ns, n.v AS nv
          FROM o FULL OUTER JOIN n ON o.k = n.k
        ), d AS (
          SELECT CAST(k AS BIGINT) AS k,
            CASE WHEN NOT in_old THEN 'added'
                 WHEN NOT in_new THEN 'removed'
                 WHEN (os IS DISTINCT FROM ns) OR (ov IS DISTINCT FROM nv)
                   THEN 'changed' END AS diff,
            CASE WHEN in_old AND in_new
                      AND ((os IS DISTINCT FROM ns)
                           OR (ov IS DISTINCT FROM nv))
                 THEN concat_ws(',',
                        CASE WHEN os IS DISTINCT FROM ns THEN 's' END,
                        CASE WHEN ov IS DISTINCT FROM nv THEN 'v' END)
            END AS changed
          FROM j
        )
        SELECT k, diff, changed FROM d WHERE diff IS NOT NULL
        """

        def build(spark, sf_dir, old_rows=old_rows, new_rows=new_rows):
            from pigout_spark.pipeline.scd import snapshot_diff

            schema = "k long, s string, v double"
            o = spark.createDataFrame(old_rows or [(None, None, None)],
                                      schema).filter("k is not null")
            n = spark.createDataFrame(new_rows or [(None, None, None)],
                                      schema).filter("k is not null")
            out = snapshot_diff(o, n, ["k"])
            return out.select(
                "k", "diff",
                F.array_join(F.array_sort("changed_cols"), ",")
                .alias("changed"),
            )

        return build, sql

    if kind == "rules":
        n = rng.randint(1, 40)
        rows = [
            (
                i,
                None if rng.random() < 0.15 else float(rng.randint(-5, 5)),
            )
            for i in range(n)
        ]
        lo = rng.randint(-5, 5)
        vals = ", ".join(
            f"({i}, {'NULL' if v is None else repr(v)})" for i, v in rows
        )
        sql = f"""
        WITH t(id, v) AS (SELECT * FROM (VALUES {vals})),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(SUM(CASE WHEN coalesce(v > {lo}, FALSE)
                     THEN 0 ELSE 1 END) AS BIGINT) AS v0,
            CAST(SUM(CASE WHEN coalesce(id >= 0, FALSE)
                     THEN 0 ELSE 1 END) AS BIGINT) AS v1
          FROM t
        )
        SELECT 'v_above' AS rule, n_rows, v0 AS n_violations,
               v0 = 0 AS pass FROM s
        UNION ALL
        SELECT 'id_nonneg', n_rows, v1, v1 = 0 FROM s
        """

        def build(spark, sf_dir, rows=rows, lo=lo):
            from pigout_spark.pipeline.validate import check_rules

            df = spark.createDataFrame(rows, "id long, v double")
            return check_rules(
                df,
                {"v_above": F.col("v") > lo,
                 "id_nonneg": F.col("id") >= 0},
            )

        return build, sql

    if kind == "ntile":
        # the closed-form two-pass bucketing vs DuckDB's NATIVE ntile —
        # random n/k exercise every remainder shape incl. k >= n
        n = rng.randint(1, 60)
        k = rng.randint(1, 12)
        pool = [float(rng.randint(0, 9)) for _ in range(rng.randint(2, 6))]
        rows = [(i, rng.choice(pool)) for i in range(n)]
        if rng.random() < 0.3:
            rows.append((990, None))
        vals = ", ".join(
            f"({i}, {'NULL' if v is None else repr(v)})" for i, v in rows
        )
        sql = f"""
        WITH t(id, v) AS (SELECT * FROM (VALUES {vals}))
        SELECT CAST(id AS BIGINT) AS id, v,
               CAST(ntile({k}) OVER (ORDER BY v, id) AS BIGINT) AS bucket
        FROM t WHERE v IS NOT NULL
        UNION ALL
        SELECT CAST(id AS BIGINT), v, NULL FROM t WHERE v IS NULL
        """

        def build(spark, sf_dir, rows=rows, k=k):
            from pigout_spark.operators.sorting import quantile_bucket

            df = spark.createDataFrame(rows, "id long, v double")
            return quantile_bucket(df, "v", k, id_cols=["id"]).select(
                "id", "v", "bucket"
            )

        return build, sql

    if kind == "skew":
        n = rng.randint(1, 80)
        keys = rng.randint(1, 6)
        # zipf-ish: key 0 overweighted
        rows = [
            (0 if rng.random() < 0.4 else rng.randrange(keys),)
            for _ in range(n)
        ]
        vals = ", ".join(f"({k})" for (k,) in rows)
        sql = f"""
        WITH raw(k) AS (SELECT * FROM (VALUES {vals})),
        c AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS c FROM raw GROUP BY k),
        s AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
                     CAST(COUNT(*) AS BIGINT) AS n_keys, MAX(c) AS maxc
              FROM c),
        h AS (SELECT CAST(-SUM(CAST(ROUND((c / n_rows) * ln(c / n_rows), 6)
                     + 0.0 AS DECIMAL(20,6))) AS DOUBLE) AS hh FROM c, s)
        SELECT n_rows, n_keys, ROUND(maxc / n_rows, 6) AS max_share6,
               CASE WHEN n_keys > 1
                    THEN LEAST(1.0, ROUND(hh / ln(CAST(n_keys AS DOUBLE)), 6))
               END AS entropy_ratio6
        FROM s, h
        """

        def build(spark, sf_dir, rows=rows):
            from pigout_spark.plans.partitioning import skew_stats

            df = spark.createDataFrame(rows, "k long")
            return skew_stats(df, ["k"])

        return build, sql

    if kind == "winsor":
        n = rng.randint(2, 50)
        keys = rng.randint(1, 3)
        # small integer pool forces ties; occasional NULLs
        rows = [
            (
                rng.randint(0, keys - 1),
                i,
                None if rng.random() < 0.1 else float(rng.randint(-5, 5)),
            )
            for i in range(n)
        ]
        p_lo = rng.choice([0.0, 0.05, 0.1, 0.25])
        p_hi = rng.choice([0.75, 0.9, 0.95, 1.0])
        vals = ", ".join(
            f"({k}, {i}, {'NULL' if v is None else repr(v)})"
            for k, i, v in rows
        )
        sql = f"""
        WITH o(k, id, v) AS (SELECT * FROM (VALUES {vals})),
        r AS (
          SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) AS rn,
                 COUNT(*) OVER (PARTITION BY k) AS n
          FROM o WHERE v IS NOT NULL
        ), b AS (
          SELECT k,
                 MIN(CASE WHEN rn = GREATEST(1, ceil({p_lo!r} * n))
                     THEN v END) AS lo,
                 MIN(CASE WHEN rn = GREATEST(1, ceil({p_hi!r} * n))
                     THEN v END) AS hi
          FROM r GROUP BY k
        )
        SELECT o.k, CAST(o.id AS BIGINT) AS id, o.v AS value,
               CASE WHEN o.v IS NOT NULL
                    THEN LEAST(GREATEST(o.v, lo), hi) END AS value_w
        FROM o LEFT JOIN b USING (k)
        """

        def build(spark, sf_dir, rows=rows, p_lo=p_lo, p_hi=p_hi):
            from pigout_spark.operators.sorting import winsorize

            df = spark.createDataFrame(
                rows, "k long, id long, value double"
            )
            out = winsorize(df, "value", ["k"], p_lo=p_lo, p_hi=p_hi)
            return out.select("k", "id", "value", "value_w")

        return build, sql

    if kind == "abseg":
        n = rng.randint(4, 60)
        segs = rng.randint(1, 3)
        seed = str(rng.randint(0, 9))
        rows = [
            (
                i,
                f"g{rng.randint(0, segs - 1)}",
                None if rng.random() < 0.1 else float(rng.randint(0, 50)) / 4,
            )
            for i in range(n)
        ]
        vals = ", ".join(
            f"({u}, '{g}', {'NULL' if m is None else repr(m)})"
            for u, g, m in rows
        )
        sql = f"""
        WITH e(uid, seg, m) AS (SELECT * FROM (VALUES {vals})),
        a AS (
          SELECT seg, m,
                 ('0x' || substring(md5('{seed}' || '|' ||
                    coalesce(uid::VARCHAR, chr(0))), 1, 8))::BIGINT
                 / 4294967296.0 < 0.5 AS is_t
          FROM e WHERE m IS NOT NULL
        ), s AS (
          SELECT seg,
                 CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
                 CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
                 CAST(SUM(CAST(CASE WHEN is_t THEN m ELSE 0.0 END
                               AS DECIMAL(24,8))) AS DOUBLE) AS sx_t,
                 CAST(SUM(CAST(CASE WHEN is_t THEN 0.0 ELSE m END
                               AS DECIMAL(24,8))) AS DOUBLE) AS sx_c
          FROM a GROUP BY seg
        )
        SELECT seg, n_c, n_t,
               CASE WHEN n_c > 0 THEN ROUND(sx_c / n_c, 6) END AS mean_c6,
               CASE WHEN n_t > 0 THEN ROUND(sx_t / n_t, 6) END AS mean_t6
        FROM s
        """

        def build(spark, sf_dir, rows=rows, seed=seed):
            from pigout_spark.pipeline.behavioral import ab_lift

            df = spark.createDataFrame(
                rows, "uid bigint, seg string, m double"
            )
            out = ab_lift(df, "m", ["uid"], seed=seed, by=["seg"])
            return out.select(
                "seg", "n_c", "n_t",
                F.round("mean_c", 6).alias("mean_c6"),
                F.round("mean_t", 6).alias("mean_t6"),
            )

        return build, sql

    if kind in ("bfs", "sssp"):
        n_nodes = rng.randint(3, 12)
        n_edges = rng.randint(2, 30)
        weighted = kind == "sssp"
        edges = [
            (
                rng.randrange(n_nodes),
                rng.randrange(n_nodes),
                rng.randint(1, 9),
            )
            for _ in range(n_edges)
        ]
        edges = [e for e in edges if e[0] != e[1]] or [(0, 1, 1)]
        directed = rng.random() < 0.5
        seeds = sorted(
            rng.sample(range(n_nodes), rng.randint(1, min(3, n_nodes)))
        )
        rounds = rng.randint(1, 4)
        uniq = sorted({(a, b, w) for a, b, w in edges})
        vals = ", ".join(f"({a}, {b}, {w})" for a, b, w in uniq) if not weighted else ", ".join(f"({a}, {b}, {w})" for a, b, w in edges)
        seed_vals = ", ".join(
            f"(CAST({x} AS BIGINT), CAST(0 AS BIGINT))" for x in seeds
        )
        sym = (
            "SELECT a AS s, b AS d, w FROM e0 UNION ALL SELECT b, a, w FROM e0"
            if not directed
            else "SELECT a AS s, b AS d, w FROM e0"
        )
        dedup = "" if weighted else "DISTINCT"
        ctes = [
            f"e0(a, b, w) AS (SELECT {dedup} * FROM (VALUES {vals}))",
            f"e AS ({sym})",
            f"r0 AS (SELECT * FROM (VALUES {seed_vals}) t(node, dist))",
        ]
        step = "r.dist + e.w" if weighted else "r.dist + 1"
        for i in range(1, rounds + 1):
            ctes.append(
                f"r{i} AS (SELECT node, MIN(dd) AS dist FROM ("
                f" SELECT node, dist AS dd FROM r{i-1}"
                f" UNION ALL SELECT e.d, {step} FROM e"
                f" JOIN r{i-1} r ON r.node = e.s) GROUP BY node)"
            )
        col = "dist" if weighted else "hops"
        sql = (
            "WITH " + ",\n".join(ctes)
            + f" SELECT node, CAST(dist AS BIGINT) AS {col} FROM r{rounds}"
        )

        def build(spark, sf_dir, edges=edges, seeds=seeds, rounds=rounds,
                  directed=directed, weighted=weighted, uniq=uniq):
            from pigout_spark.pipeline.graph import bfs_distances, shortest_paths

            if weighted:
                df = spark.createDataFrame(
                    edges, "src long, dst long, w long"
                )
                return shortest_paths(
                    df, seeds, weight_col="w", iterations=rounds,
                    directed=directed,
                )
            df = spark.createDataFrame(
                [(a, b) for a, b, _ in uniq], "src long, dst long"
            )
            return bfs_distances(
                df, seeds, max_hops=rounds, directed=directed
            )

        return build, sql

    if kind == "cdc":
        n_keys = rng.randint(2, 8)
        base = [(k, f"v{k}") for k in range(n_keys)]
        n_ch = rng.randint(1, 15)
        seen_ts = set()
        changes = []
        for j in range(n_ch):
            k = rng.randint(0, n_keys + 3)  # some inserts of new keys
            ts = rng.randint(1, 50)
            while (k, ts) in seen_ts:
                ts = rng.randint(1, 50)
            seen_ts.add((k, ts))
            op = rng.choice(["I", "U", "D"])
            changes.append((k, f"c{j}", op, ts))
        bvals = ", ".join(f"({k}, '{v}')" for k, v in base)
        cvals = ", ".join(
            f"({k}, '{v}', '{op}', {ts})" for k, v, op, ts in changes
        )
        sql = f"""
        WITH base(k, v) AS (SELECT * FROM (VALUES {bvals})),
        ch(k, v, op, ts) AS (SELECT * FROM (VALUES {cvals})),
        latest AS (
          SELECT * FROM ch
          QUALIFY row_number() OVER (PARTITION BY k ORDER BY ts DESC) = 1
        )
        SELECT CAST(k AS BIGINT) AS k, v
        FROM base WHERE k NOT IN (SELECT k FROM latest)
        UNION ALL
        SELECT CAST(k AS BIGINT), v FROM latest WHERE op <> 'D'
        """

        def build(spark, sf_dir, base=base, changes=changes):
            from pigout_spark.pipeline.scd import apply_cdc

            b = spark.createDataFrame(base, "k long, v string")
            c = spark.createDataFrame(
                changes, "k long, v string, op string, ts long"
            )
            return apply_cdc(b, c, ["k"])

        return build, sql

    if kind == "trend":
        n = rng.randint(2, 40)
        keys = rng.randint(1, 4)
        rows = []
        for i in range(n):
            k = rng.randint(0, keys - 1)
            x = None if rng.random() < 0.08 else rng.randint(0, 20)
            y = None if rng.random() < 0.08 else rng.randint(-1000, 1000)
            rows.append((k, x, y))
        # one guaranteed single-point key and one zero-variance-x key
        rows += [(90, 5, 7), (91, 3, 10), (91, 3, 20)]
        vals = ", ".join(
            f"({k}, {'NULL' if x is None else x},"
            f" {'NULL' if y is None else y})"
            for k, x, y in rows
        )
        sql = f"""
        WITH o(k, xi, yi) AS (SELECT * FROM (VALUES {vals})),
        f AS (
          SELECT k, CAST(xi AS DOUBLE) AS x, CAST(yi AS DOUBLE) AS y
          FROM o WHERE xi IS NOT NULL AND yi IS NOT NULL
        ), s AS (
          SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(x AS BIGINT)) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(y AS BIGINT)) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(x * x AS BIGINT)) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(x * y AS BIGINT)) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(y * y AS BIGINT)) AS DOUBLE) AS syy
          FROM f GROUP BY k
        )
        SELECT k, n,
               CASE WHEN n * sxx - sx * sx <> 0
                    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
               END AS slope,
               (sy - (CASE WHEN n * sxx - sx * sx <> 0
                           THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                      END) * sx) / n AS intercept,
               CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
                    THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                         / ((n * sxx - sx * sx) * (n * syy - sy * sy))
               END AS r2
        FROM s
        """

        def build(spark, sf_dir, rows=rows):
            from pigout_spark.pipeline.behavioral import trend_fit

            df = spark.createDataFrame(
                [
                    (
                        k,
                        None if x is None else float(x),
                        None if y is None else float(y),
                    )
                    for k, x, y in rows
                ],
                "k long, x double, y double",
            )
            return trend_fit(df, ["k"], "x", "y", term_scale=0)

        return build, sql

    if kind in ("psi", "ks"):
        bins = rng.randint(2, 10)
        lo, hi = 0.0, 10.0
        def pop(sz, shift):
            return [
                round(min(9.999, max(0.0, rng.uniform(0, 10) + shift)), 3)
                for _ in range(sz)
            ]
        ref = pop(rng.randint(5, 60), 0)
        cur = pop(rng.randint(5, 60), rng.choice([0, 2, -3]))
        rv = ", ".join(f"({v!r})" for v in ref)
        cv = ", ".join(f"({v!r})" for v in cur)
        width = (hi - lo) / bins
        binx = (
            f"LEAST({bins - 1}, GREATEST(0,"
            f" CAST(floor((v - {lo!r}) / {width!r}) AS BIGINT)))"
        )
        shared = f"""
        refv(v) AS (SELECT * FROM (VALUES {rv})),
        curv(v) AS (SELECT * FROM (VALUES {cv})),
        rb AS (SELECT {binx} AS bin, CAST(COUNT(*) AS BIGINT) AS n_ref
               FROM refv GROUP BY 1),
        cb AS (SELECT {binx} AS bin, CAST(COUNT(*) AS BIGINT) AS n_cur
               FROM curv GROUP BY 1),
        j AS (SELECT coalesce(rb.bin, cb.bin) AS bin,
                     coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
              FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin),
        t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
                     CAST(SUM(n_cur) AS BIGINT) AS tc FROM j)
        """
        if kind == "psi":
            sql = f"""
            WITH {shared}
            SELECT bin, n_ref, n_cur,
                   ROUND((GREATEST(n_cur / tc, 1e-4)
                          - GREATEST(n_ref / tr, 1e-4))
                         * ln(GREATEST(n_cur / tc, 1e-4)
                              / GREATEST(n_ref / tr, 1e-4)), 6) + 0.0 AS psi6
            FROM j, t
            """
        else:
            sql = f"""
            WITH {shared}
            , e AS (
              SELECT bin,
                     abs(SUM(n_ref) OVER (ORDER BY bin
                                          ROWS UNBOUNDED PRECEDING) / tr
                       - SUM(n_cur) OVER (ORDER BY bin
                                          ROWS UNBOUNDED PRECEDING) / tc)
                     AS d
              FROM j, t
            )
            SELECT d AS d_stat, bin AS at_bin
            FROM e ORDER BY d DESC, bin LIMIT 1
            """

        def build(spark, sf_dir, ref=ref, cur=cur, bins=bins, kind=kind):
            from pigout_spark.pipeline.drift import ks_drift, psi_drift

            r = spark.createDataFrame([(v,) for v in ref], "v double")
            c = spark.createDataFrame([(v,) for v in cur], "v double")
            fn = psi_drift if kind == "psi" else ks_drift
            return fn(r, c, "v", bins=bins, lo=0.0, hi=10.0)

        return build, sql

    if kind == "itemcf":
        users = rng.randint(2, 8)
        items = rng.randint(2, 8)
        n = rng.randint(3, 40)
        rows = [
            (rng.randrange(users), rng.randrange(items)) for _ in range(n)
        ]
        cap = rng.choice([None, 2, 3, 5])
        min_c = rng.randint(1, 2)
        k = rng.randint(1, 4)
        vals = ", ".join(f"({u}, {i})" for u, i in rows)
        cap_sql = (
            f"QUALIFY row_number() OVER (PARTITION BY u ORDER BY i) <= {cap}"
            if cap
            else ""
        )
        sql = f"""
        WITH raw(u, i) AS (SELECT * FROM (VALUES {vals})),
        ui AS (SELECT DISTINCT u, i FROM raw),
        uic AS (SELECT u, i FROM ui {cap_sql}),
        ni AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n FROM uic GROUP BY i),
        pairs AS (
          SELECT x.i AS a, y.i AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
          FROM uic x JOIN uic y ON x.u = y.u AND x.i < y.i
          GROUP BY x.i, y.i HAVING COUNT(*) >= {min_c}
        ), sym AS (
          SELECT a AS item, b AS rec_item, n_ab FROM pairs
          UNION ALL SELECT b, a, n_ab FROM pairs
        ), sc AS (
          SELECT item, rec_item, n_ab,
                 n_ab / sqrt(CAST(na.n * nb.n AS DOUBLE)) AS score
          FROM sym JOIN ni na ON sym.item = na.i
                   JOIN ni nb ON sym.rec_item = nb.i
        )
        SELECT CAST(item AS BIGINT) AS item,
               CAST(rec_item AS BIGINT) AS rec_item, n_ab, score,
               CAST(row_number() OVER (PARTITION BY item
                    ORDER BY score DESC, rec_item) AS BIGINT) AS rank
        FROM sc QUALIFY rank <= {k}
        """

        def build(spark, sf_dir, rows=rows, cap=cap, min_c=min_c, k=k):
            from pigout_spark.pipeline.recsys import item_cf_topk

            df = spark.createDataFrame(rows, "u long, i long")
            return item_cf_topk(
                df, "u", "i", k=k, min_cooc=min_c, max_items_per_user=cap
            )

        return build, sql

    # seasonal
    p = rng.randint(2, 6)
    keys = rng.randint(1, 3)
    rows = []
    for kk in range(keys):
        ln = rng.randint(p, 4 * p + rng.randint(0, 6))
        for i in range(ln):
            rows.append((kk, i, rng.randint(-50, 50)))
    even = p % 2 == 0
    h = p // 2
    frame = 2 * h + 1 if even else p
    div = 2 * p
    half = frame // 2
    t2 = (
        f"wsum * 2 - lag(v8, {h}) OVER wk - lead(v8, {h}) OVER wk"
        if even
        else "wsum * 2"
    )
    vals = ", ".join(f"({k}, {i}, {v})" for k, i, v in rows)
    sql = f"""
    WITH raw(k, idx, vi) AS (SELECT * FROM (VALUES {vals})),
    d0 AS (SELECT k, idx, CAST(vi AS DOUBLE) AS v,
                  CAST(CAST(vi AS DOUBLE) AS DECIMAL(24,8)) AS v8 FROM raw),
    b AS (
      SELECT k, idx, v, v8,
             SUM(v8) OVER wf AS wsum, COUNT(v8) OVER wf AS cnt,
             {t2} AS t2x, idx % {p} AS phase
      FROM d0
      WINDOW wk AS (PARTITION BY k ORDER BY idx),
             wf AS (PARTITION BY k ORDER BY idx
                    ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)
    ), c AS (
      SELECT *, CASE WHEN cnt = {frame} THEN t2x END AS t2 FROM b
    ), ph AS (
      SELECT k, phase, SUM(v8 * {div} - t2) AS s2, COUNT(*) AS n
      FROM c WHERE t2 IS NOT NULL GROUP BY k, phase
    ), ph6 AS (
      SELECT k, phase,
             ROUND(CAST(s2 AS DOUBLE) / (n * {float(div)!r}), 6) + 0.0 AS seas6
      FROM ph
    ), ctr AS (
      SELECT k, CAST(SUM(CAST(seas6 AS DECIMAL(20,6))) AS DOUBLE)
                / COUNT(*) AS m
      FROM ph6 GROUP BY k
    ), phc AS (
      SELECT ph6.k, phase, ROUND(seas6 - m, 6) + 0.0 AS sc6
      FROM ph6 JOIN ctr ON ph6.k = ctr.k
    )
    SELECT c.k, CAST(c.idx AS BIGINT) AS idx, c.v AS value,
           CAST(c.t2 AS DOUBLE) / {float(div)!r} AS trend,
           phc.sc6 AS seasonal,
           c.v - CAST(c.t2 AS DOUBLE) / {float(div)!r} - phc.sc6 AS resid
    FROM c LEFT JOIN phc ON c.k = phc.k AND c.phase = phc.phase
    """

    def build(spark, sf_dir, rows=rows, p=p):
        from pigout_spark.streaming.windows import seasonal_decompose

        df = spark.createDataFrame(
            [(k, i, float(v)) for k, i, v in rows],
            "k long, idx long, v double",
        )
        out = seasonal_decompose(df, ["k"], "idx", "v", p)
        return out.select(
            "k", "idx", "value", "trend", "seasonal", "resid"
        )

    return build, sql



# ------------------------------------------------- r8 stats generators ---
def _gen_km(rng: random.Random):
    """Kaplan-Meier over random (duration, event) mixes incl. censored
    tails and d == n_risk extinction times."""
    n = rng.randint(2, 40)
    rows = [(rng.randint(1, 10), rng.random() < 0.6) for _ in range(n)]
    vals = ", ".join(f"({t}, {str(e).upper()})" for t, e in rows)
    contrib = ("CAST(ROUND(ln(1 - d / CAST(n_risk AS DOUBLE)), 6)"
               " + 0.0 AS DECIMAL(20,6))")
    sql = f"""
    WITH u AS (SELECT * FROM (VALUES {vals}) t(dur, e)),
    per_t AS (
      SELECT dur AS t,
             CAST(SUM(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leave
      FROM u GROUP BY dur
    ), c AS (
      SELECT t, d,
             SUM(leave) OVER ()
               - coalesce(SUM(leave) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM per_t
    ), k AS (
      SELECT t, n_risk, d,
             MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS dead,
             coalesce(CAST(SUM(CASE WHEN d < n_risk THEN {contrib} END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE),
               0.0) AS logs
      FROM c
    )
    SELECT 'all' AS k, CAST(t AS BIGINT) AS t,
           CAST(n_risk AS BIGINT) AS n_risk, d,
           CASE WHEN dead = 1 THEN 0.0
                ELSE ROUND(exp(logs), 6) END AS surv6
    FROM k WHERE d > 0
    """

    def build(spark, sf_dir, rows=rows):
        from pigout_spark.pipeline.behavioral import kaplan_meier

        df = spark.createDataFrame(
            [("all", float(t), e) for t, e in rows],
            "k string, dur double, e boolean",
        )
        return kaplan_meier(df, "dur", "e", ["k"])

    return build, sql


def _gen_wq(rng: random.Random):
    """Weighted quantiles over random weights/ties, multiple ps."""
    n = rng.randint(1, 30)
    keys = rng.randint(1, 3)
    rows = [
        (rng.randint(0, keys - 1), float(rng.randint(0, 9)),
         rng.randint(1, 9))
        for _ in range(n)
    ]
    ps = sorted(rng.sample([0.1, 0.25, 0.5, 0.75, 0.9, 1.0],
                           rng.randint(1, 3)))
    vals = ", ".join(f"({k}, {v!r}, {w})" for k, v, w in rows)
    selects = [
        f"SELECT k, {pp!r} AS p, MIN(v) AS q FROM c"
        f" WHERE cw >= ceil({pp!r} * tw) GROUP BY k"
        for pp in ps
    ]
    sql = f"""
    WITH d AS (SELECT * FROM (VALUES {vals}) t(k, v, w)),
    m AS (SELECT k, v, SUM(w) AS w FROM d GROUP BY k, v),
    c AS (
      SELECT k, v,
             SUM(w) OVER (PARTITION BY k ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY k) AS tw
      FROM m
    )
    {" UNION ALL ".join(selects)}
    """

    def build(spark, sf_dir, rows=rows, ps=ps):
        from pigout_spark.operators.sorting import weighted_quantile

        df = spark.createDataFrame(rows, "k long, v double, w long")
        return weighted_quantile(df, "v", "w", ps, ["k"])

    return build, sql


def _gen_gini(rng: random.Random):
    """Gini over random non-negative integer values incl. all-zero and
    singleton keys."""
    n = rng.randint(1, 40)
    keys = rng.randint(1, 3)
    rows = [(rng.randint(0, keys - 1), rng.randint(0, 50))
            for _ in range(n)]
    vals = ", ".join(f"({k}, {v})" for k, v in rows)
    sql = f"""
    WITH o AS (SELECT * FROM (VALUES {vals}) t(k, vc)),
    r AS (SELECT k, vc,
            row_number() OVER (PARTITION BY k ORDER BY vc) AS i
          FROM o),
    s AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CAST(vc AS DECIMAL(19,0))) AS DOUBLE) AS sx,
            CAST(SUM(CAST(i AS DECIMAL(19,0))
                     * CAST(vc AS DECIMAL(19,0))) AS DOUBLE) AS srx
          FROM r GROUP BY k)
    SELECT k, n,
           CASE WHEN sx > 0
                THEN ROUND((2 * srx - (n + 1) * sx) / (n * sx), 6) + 0.0
                ELSE 0.0 END AS gini6
    FROM s
    """

    def build(spark, sf_dir, rows=rows):
        from pigout_spark.pipeline.behavioral import gini

        df = spark.createDataFrame(
            [(k, float(v)) for k, v in rows], "k long, vc double"
        )
        return gini(df, ["k"], "vc")

    return build, sql


def _gen_wilson(rng: random.Random):
    """Wilson intervals over random success mixes incl. 0% and 100%
    keys (where Wald would collapse)."""
    n = rng.randint(1, 50)
    keys = rng.randint(1, 3)
    z = 1.959964
    zz = z * z
    rows = [(rng.randint(0, keys - 1), rng.random() < 0.3)
            for _ in range(n)]
    vals = ", ".join(f"({k}, {str(f).upper()})" for k, f in rows)
    sql = f"""
    WITH e AS (SELECT * FROM (VALUES {vals}) t(k, f)),
    s AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS successes
          FROM e GROUP BY k)
    SELECT k, n, successes,
           ROUND(successes / n, 6) AS p6,
           ROUND((successes / n + {zz!r} / (2 * n)) / (1 + {zz!r} / n)
                 - {z!r} * sqrt((successes / n) * (1 - successes / n) / n
                                + {zz!r} / (4 * n * n)) / (1 + {zz!r} / n),
                 6) + 0.0 AS lo6,
           ROUND((successes / n + {zz!r} / (2 * n)) / (1 + {zz!r} / n)
                 + {z!r} * sqrt((successes / n) * (1 - successes / n) / n
                                + {zz!r} / (4 * n * n)) / (1 + {zz!r} / n),
                 6) + 0.0 AS hi6
    FROM s
    """

    def build(spark, sf_dir, rows=rows, z=z):
        from pigout_spark.pipeline.behavioral import proportion_ci

        df = spark.createDataFrame(rows, "k long, f boolean")
        return proportion_ci(df, ["k"], "f", z=z)

    return build, sql


def _gen_spearman(rng: random.Random):
    """Spearman over random (key, x, y) with heavy ties, NULLs, and
    constant-side keys (NULL rho)."""
    n = rng.randint(2, 60)
    keys = rng.randint(1, 3)
    rows = []
    for _ in range(n):
        k = rng.randint(0, keys - 1)
        x = None if rng.random() < 0.1 else float(rng.randint(0, 5))
        y = None if rng.random() < 0.1 else float(rng.randint(0, 5))
        rows.append((k, x, y))
    vals = ", ".join(
        f"({k}, {'NULL' if x is None else repr(x)},"
        f" {'NULL' if y is None else repr(y)})"
        for k, x, y in rows
    )
    sql = f"""
    WITH d AS (SELECT * FROM (VALUES {vals}) t(k, x, y)
               WHERE x IS NOT NULL AND y IS NOT NULL),
    r AS (SELECT k,
        CAST(2 * rank() OVER (PARTITION BY k ORDER BY x)
             + count(*) OVER (PARTITION BY k, x) - 1 AS BIGINT) AS rx,
        CAST(2 * rank() OVER (PARTITION BY k ORDER BY y)
             + count(*) OVER (PARTITION BY k, y) - 1 AS BIGINT) AS ry
      FROM d),
    s AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(rx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(ry AS DECIMAL(38,0))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(rx * rx AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(ry * ry AS DECIMAL(38,0))) AS DOUBLE) AS syy,
        CAST(SUM(CAST(rx * ry AS DECIMAL(38,0))) AS DOUBLE) AS sxy
      FROM r GROUP BY k)
    SELECT CAST(k AS BIGINT) AS k, n,
      CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
        ROUND((n * sxy - sx * sy)
              / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0
      END AS rho6
    FROM s
    """

    def build(spark, sf_dir, rows=rows):
        from pigout_spark.pipeline.behavioral import spearman_corr

        df = spark.createDataFrame(rows, "k long, x double, y double")
        return spearman_corr(df, ["k"], "x", "y")

    return build, sql


def _gen_mw(rng: random.Random):
    """Mann-Whitney over random two-group samples: tie-heavy value
    domains, NULLs, occasionally one group empty."""
    n = rng.randint(2, 60)
    p_true = rng.choice([0.0, 0.3, 0.5, 0.8])
    rows = [
        (
            rng.random() < p_true,
            None if rng.random() < 0.1 else float(rng.randint(0, 6)),
        )
        for _ in range(n)
    ]
    vals = ", ".join(
        f"({str(g).upper()}, {'NULL' if v is None else repr(v)})" for g, v in rows
    )
    sql = f"""
    WITH d AS (SELECT * FROM (VALUES {vals}) t(g, v) WHERE v IS NOT NULL),
    r AS (SELECT g,
        CAST(2 * rank() OVER (ORDER BY v)
             + count(*) OVER (PARTITION BY v) - 1 AS BIGINT) AS r2, v
      FROM d),
    pv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t,
        SUM(CASE WHEN g THEN CAST(r2 AS DECIMAL(38,0)) ELSE 0 END) AS r2t,
        CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n1v
      FROM r GROUP BY v),
    s AS (SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
            CAST(SUM(t) - SUM(n1v) AS BIGINT) AS n2,
            CAST(SUM(r2t) AS DOUBLE) AS sr2,
            CAST(SUM(CAST(t * t * t - t AS DECIMAL(38,0))) AS DOUBLE) AS ties
          FROM pv)
    SELECT n1, n2,
      CASE WHEN n1 > 0 AND n2 > 0 THEN
        sr2 / 2.0 - n1 * (n1 + 1.0) / 2.0 END AS u1,
      CASE WHEN n1 > 0 AND n2 > 0 THEN
        CAST(n1 AS DOUBLE) * n2 - (sr2 / 2.0 - n1 * (n1 + 1.0) / 2.0)
      END AS u2,
      CASE WHEN n1 > 0 AND n2 > 0
                AND (n1 * CAST(n2 AS DOUBLE) / 12.0)
                    * ((n1 + n2 + 1.0)
                       - ties / ((n1 + CAST(n2 AS DOUBLE))
                                 * (n1 + n2 - 1.0))) > 0 THEN
        ROUND(((sr2 / 2.0 - n1 * (n1 + 1.0) / 2.0)
               - n1 * CAST(n2 AS DOUBLE) / 2.0)
              / sqrt((n1 * CAST(n2 AS DOUBLE) / 12.0)
                     * ((n1 + n2 + 1.0)
                        - ties / ((n1 + CAST(n2 AS DOUBLE))
                                  * (n1 + n2 - 1.0)))), 6) + 0.0
      END AS z6,
      CASE WHEN n1 > 0 AND n2 > 0 THEN
        ROUND(2.0 * (sr2 / 2.0 - n1 * (n1 + 1.0) / 2.0)
              / (CAST(n1 AS DOUBLE) * n2) - 1.0, 6) + 0.0
      END AS cliffs_delta6
    FROM s
    """

    def build(spark, sf_dir, rows=rows):
        from pigout_spark.pipeline.behavioral import mann_whitney_u

        df = spark.createDataFrame(rows, "g boolean, v double")
        return mann_whitney_u(df, "g", "v")

    return build, sql


def _gen_bhfdr(rng: random.Random):
    """BH q-values over random tie-heavy p grids, random alpha, with
    NULL p rows excluded from m."""
    n = rng.randint(1, 30)
    alpha = rng.choice([0.01, 0.05, 0.1])
    rows = [
        (
            i,
            None if rng.random() < 0.1
            else round(rng.randint(0, 20) / 20.0, 2),
        )
        for i in range(n)
    ]
    vals = ", ".join(
        f"({i}, {'NULL' if p is None else repr(p)})" for i, p in rows
    )
    sql = f"""
    WITH d AS (SELECT * FROM (VALUES {vals}) t(id, p) WHERE p IS NOT NULL),
    ranked AS (
      SELECT id, p, CAST(COUNT(*) OVER () AS BIGINT) AS m,
             row_number() OVER (ORDER BY p DESC, id DESC) AS rkd
      FROM d)
    SELECT CAST(id AS BIGINT) AS id, p,  m,
      ROUND(LEAST(1.0, MIN(p * m / (m - rkd + 1))
            OVER (ORDER BY p DESC, id DESC
                  ROWS UNBOUNDED PRECEDING)), 6) + 0.0 AS q6,
      ROUND(LEAST(1.0, MIN(p * m / (m - rkd + 1))
            OVER (ORDER BY p DESC, id DESC
                  ROWS UNBOUNDED PRECEDING)), 6) + 0.0 <= {alpha!r} AS reject
    FROM ranked
    """

    def build(spark, sf_dir, rows=rows, alpha=alpha):
        from pigout_spark.pipeline.behavioral import bh_fdr

        df = spark.createDataFrame(rows, "id long, p double")
        return bh_fdr(df, "p", alpha=alpha)

    return build, sql


def _gen_tenc(rng: random.Random):
    """Target encoding over random categories (incl. NULL keys and NULL
    targets), random smoothing, both LOO and plain."""
    n = rng.randint(1, 40)
    keys = rng.randint(1, 4)
    m = rng.choice([0.0, 1.0, 5.0, 20.0])
    loo = rng.random() < 0.5
    rows = [
        (
            i,
            None if rng.random() < 0.15 else f"k{rng.randint(0, keys - 1)}",
            None if rng.random() < 0.15 else float(rng.randint(0, 9)),
        )
        for i in range(n)
    ]
    vals = ", ".join(
        f"({i}, {'NULL' if k is None else repr(k)},"
        f" {'NULL' if y is None else repr(y)})"
        for i, k, y in rows
    )
    own_y = "CASE WHEN y IS NOT NULL THEN y ELSE 0.0 END"
    own_n = "CASE WHEN y IS NOT NULL THEN 1.0 ELSE 0.0 END"
    # all-NULL-target categories shrink to the prior (coalesced sum —
    # mirrors the operator's r9 self-review fix)
    if loo:
        num = f"(coalesce(sy, 0.0) - {own_y} + {m!r} * prior)"
        den = f"(ny - {own_n} + {m!r})"
    else:
        num = f"(coalesce(sy, 0.0) + {m!r} * prior)"
        den = f"(ny + {m!r})"
    sql = f"""
    WITH d AS (SELECT * FROM (VALUES {vals}) t(id, k, y)),
    c AS (SELECT k,
            CAST(SUM(CAST(y AS DECIMAL(30,6))) AS DOUBLE) AS sy,
            CAST(COUNT(y) AS DOUBLE) AS ny
          FROM d GROUP BY k),
    g AS (SELECT CAST(SUM(CAST(y AS DECIMAL(30,6))) AS DOUBLE)
                 / CAST(COUNT(y) AS DOUBLE) AS prior FROM d)
    SELECT CAST(id AS BIGINT) AS id, d.k AS k, y,
      CASE WHEN {den} > 0 THEN ROUND({num} / {den}, 6) + 0.0
      END AS target_enc
    FROM d JOIN c ON d.k IS NOT DISTINCT FROM c.k CROSS JOIN g
    """

    def build(spark, sf_dir, rows=rows, m=m, loo=loo):
        from pigout_spark.pipeline.features import target_encode

        df = spark.createDataFrame(rows, "id long, k string, y double")
        return target_encode(
            df, ["k"], "y", smoothing=m, leave_one_out=loo
        )

    return build, sql


def _gen_rscale(rng: random.Random):
    """Robust scaling over random keys incl. constant (zero-IQR) keys
    and NULL values."""
    n = rng.randint(1, 50)
    keys = rng.randint(1, 3)
    rows = [
        (
            i,
            rng.randint(0, keys - 1),
            None if rng.random() < 0.1 else float(rng.randint(0, 8)),
        )
        for i in range(n)
    ]
    vals = ", ".join(
        f"({i}, {k}, {'NULL' if v is None else repr(v)})" for i, k, v in rows
    )
    sql = f"""
    WITH o AS (SELECT * FROM (VALUES {vals}) t(id, g, v)),
    r AS (SELECT g, v,
            row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
            COUNT(*) OVER (PARTITION BY g) AS n
          FROM o WHERE v IS NOT NULL),
    b AS (SELECT g,
        MIN(CASE WHEN rn = GREATEST(1, ceil(0.25 * n)) THEN v END) AS q25,
        MIN(CASE WHEN rn = GREATEST(1, ceil(0.5 * n)) THEN v END) AS q50,
        MIN(CASE WHEN rn = GREATEST(1, ceil(0.75 * n)) THEN v END) AS q75
      FROM r GROUP BY g)
    SELECT CAST(id AS BIGINT) AS id, CAST(o.g AS BIGINT) AS g, v,
      CASE WHEN v IS NOT NULL AND (q75 - q25) > 0 THEN
        ROUND((v - q50) / (q75 - q25), 6) + 0.0 END AS value_rs
    FROM o LEFT JOIN b ON o.g = b.g
    """

    def build(spark, sf_dir, rows=rows):
        from pigout_spark.pipeline.features import robust_scale

        df = spark.createDataFrame(rows, "id long, g long, v double")
        return robust_scale(df, "v", ["g"], out="value_rs")

    return build, sql


def gen_r9(rng: random.Random):
    """Differential-fuzz the round-9 operators: Spearman (tie-heavy
    rank correlation), Mann-Whitney U (tie-corrected z, empty groups),
    BH-FDR (tie-collapsing q-values), target encoding (LOO/plain,
    NULL keys and targets), robust scaling (zero-IQR keys), ROC-AUC
    (tie half-credit), calibration bins, cumulative Qini deciles."""
    kind = rng.choice(
        ["spearman", "mw", "bhfdr", "tenc", "rscale",
         "auc", "calib", "uplift"]
    )
    return {
        "spearman": _gen_spearman,
        "mw": _gen_mw,
        "bhfdr": _gen_bhfdr,
        "tenc": _gen_tenc,
        "rscale": _gen_rscale,
        "auc": _gen_auc,
        "calib": _gen_calib,
        "uplift": _gen_uplift,
    }[kind](rng)


def _gen_auc(rng: random.Random):
    """ROC-AUC over random tie-heavy score grids, incl. one-class
    inputs (NULL auc)."""
    n = rng.randint(1, 50)
    p_pos = rng.choice([0.0, 0.3, 0.5, 1.0])
    rows = [
        (rng.random() < p_pos, float(rng.randint(0, 8)))
        for _ in range(n)
    ]
    vals = ", ".join(f"({str(y).upper()}, {repr(s)})" for y, s in rows)
    sql = f"""
    WITH d AS (SELECT * FROM (VALUES {vals}) t(y, s)),
    r AS (SELECT y,
        CAST(2 * rank() OVER (ORDER BY s)
             + count(*) OVER (PARTITION BY s) - 1 AS BIGINT) AS r2
      FROM d),
    a AS (SELECT CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
            CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
            CAST(SUM(CASE WHEN y THEN CAST(r2 AS DECIMAL(38,0))
                          ELSE 0 END) AS DOUBLE) AS sr2
          FROM r)
    SELECT n_pos, n_neg,
      CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        ROUND((sr2 / 2.0 - n_pos * (n_pos + 1.0) / 2.0)
              / (CAST(n_pos AS DOUBLE) * n_neg), 6) + 0.0
      END AS auc6
    FROM a
    """

    def build(spark, sf_dir, rows=rows):
        from pigout_spark.pipeline.evaluation import roc_auc

        df = spark.createDataFrame(rows, "y boolean, s double")
        return roc_auc(df, "y", "s")

    return build, sql


def _gen_calib(rng: random.Random):
    """Calibration bins over random quantized scores (k/20 grid —
    exactly representable comparisons) and random labels."""
    n = rng.randint(1, 60)
    bins = rng.choice([4, 10])
    rows = [
        (rng.randint(0, 20) / 20.0, rng.random() < 0.4) for _ in range(n)
    ]
    vals = ", ".join(f"({repr(s)}, {str(y).upper()})" for s, y in rows)
    sql = f"""
    WITH d AS (SELECT * FROM (VALUES {vals}) t(s, y)),
    g AS (SELECT LEAST({bins} - 1, CAST(floor(s * {bins}) AS INT)) AS bin,
            CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
            CAST(SUM(CAST(s AS DECIMAL(26,16))) AS DOUBLE) AS ss
          FROM d GROUP BY 1)
    SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
           ROUND(ss / n, 6) + 0.0 AS mean_pred6,
           ROUND(CAST(n_pos AS DOUBLE) / n, 6) + 0.0 AS obs_rate6,
           ROUND((ROUND(CAST(n_pos AS DOUBLE) / n, 6) + 0.0)
                 - (ROUND(ss / n, 6) + 0.0), 6) + 0.0 AS gap6
    FROM g
    """

    def build(spark, sf_dir, rows=rows, bins=bins):
        from pigout_spark.pipeline.evaluation import calibration_bins

        df = spark.createDataFrame(rows, "s double, y boolean")
        return calibration_bins(df, "s", "y", bins=bins)

    return build, sql


def _gen_uplift(rng: random.Random):
    """Cumulative Qini deciles over random treatment/outcome/score
    rows with explicit id tiebreaks; random bucket counts."""
    n = rng.randint(1, 60)
    nb = rng.choice([2, 4, 10])
    rows = [
        (
            i,
            rng.random() < 0.5,
            rng.random() < 0.3,
            rng.randint(0, 10) / 10.0,
        )
        for i in range(n)
    ]
    vals = ", ".join(
        f"({i}, {str(t).upper()}, {str(y).upper()}, {repr(s)})"
        for i, t, y, s in rows
    )
    sql = f"""
    WITH d AS (SELECT * FROM (VALUES {vals}) t(id, tr, y, s)),
    r AS (SELECT tr, y,
            row_number() OVER (ORDER BY s DESC, id) AS rn,
            CAST(COUNT(*) OVER () AS BIGINT) AS n
          FROM d),
    per AS (SELECT CAST(ceil({nb}.0 * rn / n) AS BIGINT) AS bucket,
            CAST(COUNT(*) AS BIGINT) AS bn,
            CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS bnt,
            CAST(SUM(CASE WHEN tr AND y THEN 1 ELSE 0 END) AS BIGINT)
              AS byt,
            CAST(SUM(CASE WHEN (NOT tr) AND y THEN 1 ELSE 0 END)
                 AS BIGINT) AS byc
          FROM r GROUP BY 1),
    cum AS (SELECT bucket,
        CAST(SUM(bn) OVER w AS BIGINT) AS n,
        CAST(SUM(bnt) OVER w AS BIGINT) AS n_t,
        CAST(SUM(bn) OVER w - SUM(bnt) OVER w AS BIGINT) AS n_c,
        CAST(SUM(byt) OVER w AS BIGINT) AS y_t,
        CAST(SUM(byc) OVER w AS BIGINT) AS y_c
      FROM per WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING))
    SELECT bucket, n, n_t, n_c, y_t, y_c,
      CASE WHEN n_t > 0 THEN
        ROUND(CAST(y_t AS DOUBLE) / n_t, 6) + 0.0 END AS rate_t6,
      CASE WHEN n_c > 0 THEN
        ROUND(CAST(y_c AS DOUBLE) / n_c, 6) + 0.0 END AS rate_c6,
      CASE WHEN n_c > 0 THEN
        ROUND(CAST(y_t AS DOUBLE)
              - CAST(y_c AS DOUBLE) * n_t / n_c, 6) + 0.0 END AS qini6
    FROM cum
    """

    def build(spark, sf_dir, rows=rows, nb=nb):
        from pigout_spark.pipeline.evaluation import uplift_deciles

        df = spark.createDataFrame(
            rows, "id long, tr boolean, y boolean, s double"
        )
        return uplift_deciles(
            df, "tr", "y", "s", tiebreak_cols=["id"], n_buckets=nb
        )

    return build, sql



# ---------------------------------------------------------------- r12 ---
def gen_r12(rng: random.Random):
    """Differential-fuzz the round-12 operators: trimmed mean
    (tie-heavy integers, random trim, over-trimmed tiny keys),
    conformal quantile (random alpha, NULL below the coverage bound),
    diff-in-differences (random 2x2 with deliberately missing cells),
    temperature weights (alpha=0.5 sqrt path, single-domain corpora)."""
    kind = rng.choice(["tmean", "conf", "did", "tempw"])
    return {
        "tmean": _gen_tmean,
        "conf": _gen_conf,
        "did": _gen_did,
        "tempw": _gen_tempw,
    }[kind](rng)


def _gen_tmean(rng: random.Random):
    trim = rng.choice([0.0, 0.05, 0.1, 0.25, 0.4])
    keys = [f"k{i}" for i in range(rng.randint(1, 3))]
    rows = [
        (rng.choice(keys), rng.randint(-5, 20))
        for _ in range(rng.randint(1, 60))
    ]
    vals = ", ".join(f"('{k}', {v})" for k, v in rows)
    sql = f"""
    WITH d AS (SELECT * FROM (VALUES {vals}) t(k, v)),
    r AS (SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) AS rn,
            COUNT(*) OVER (PARTITION BY k) AS n FROM d),
    g AS (SELECT k, CAST(MAX(n) AS BIGINT) AS n,
        CAST(MAX(CAST(ceil({trim} * n) AS BIGINT)) AS BIGINT) AS n_trim,
        SUM(CASE WHEN rn > ceil({trim} * n) AND rn <= n - ceil({trim} * n)
                 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s,
        CAST(SUM(CASE WHEN rn > ceil({trim} * n)
                      AND rn <= n - ceil({trim} * n)
                      THEN 1 ELSE 0 END) AS BIGINT) AS nk
      FROM r GROUP BY k)
    SELECT k, n, n_trim,
           CASE WHEN nk > 0
                THEN ROUND(CAST(s AS DOUBLE) / nk, 6) + 0.0 END AS tmean6
    FROM g
    """

    def build(spark, sf_dir, rows=rows, trim=trim):
        from pigout_spark.pipeline.behavioral import trimmed_mean

        df = spark.createDataFrame(rows, "k string, v long")
        return trimmed_mean(df, "v", ["k"], trim=trim)

    return build, sql


def _gen_conf(rng: random.Random):
    alpha = rng.choice([0.05, 0.1, 0.2, 0.5])
    keys = [f"k{i}" for i in range(rng.randint(1, 3))]
    rows = [
        (rng.choice(keys), float(rng.randint(0, 15)))
        for _ in range(rng.randint(1, 50))
    ]
    vals = ", ".join(f"('{k}', {repr(s)})" for k, s in rows)
    sql = f"""
    WITH d AS (SELECT * FROM (VALUES {vals}) t(k, s)),
    r AS (SELECT k, s, row_number() OVER (PARTITION BY k ORDER BY s) AS rn,
            COUNT(*) OVER (PARTITION BY k) AS n FROM d)
    SELECT k, CAST(MAX(n) AS BIGINT) AS n,
           ROUND(MIN(CASE WHEN rn = ceil({1.0 - alpha!r} * (n + 1))
                          THEN s END), 6) + 0.0 AS qhat6
    FROM r GROUP BY k
    """

    def build(spark, sf_dir, rows=rows, alpha=alpha):
        from pigout_spark.pipeline.behavioral import conformal_quantile

        df = spark.createDataFrame(rows, "k string, s double")
        return conformal_quantile(df, "s", ["k"], alpha=alpha)

    return build, sql


def _gen_did(rng: random.Random):
    keys = [f"k{i}" for i in range(rng.randint(1, 2))]
    rows = []
    for _ in range(rng.randint(1, 50)):
        # bias cell coverage so missing-cell NULLs actually occur
        t = rng.random() < 0.6
        p = rng.random() < 0.6
        rows.append((rng.choice(keys), t, p, rng.randint(-10, 100)))
    vals = ", ".join(
        f"('{k}', {str(t).upper()}, {str(p).upper()}, {v})"
        for k, t, p, v in rows
    )
    sql = f"""
    WITH d AS (SELECT * FROM (VALUES {vals}) x(k, t, p, v)),
    g AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN t AND p THEN 1 ELSE 0 END) AS BIGINT) AS n_tpost,
        CAST(SUM(CASE WHEN t AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS n_tpre,
        CAST(SUM(CASE WHEN NOT t AND p THEN 1 ELSE 0 END) AS BIGINT) AS n_cpost,
        CAST(SUM(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS n_cpre,
        SUM(CASE WHEN t AND p THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_tpost,
        SUM(CASE WHEN t AND NOT p THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_tpre,
        SUM(CASE WHEN NOT t AND p THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_cpost,
        SUM(CASE WHEN NOT t AND NOT p THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_cpre
      FROM d GROUP BY k)
    SELECT k, n, n_tpost, n_tpre, n_cpost, n_cpre,
      CASE WHEN n_tpost > 0 AND n_tpre > 0 AND n_cpost > 0 AND n_cpre > 0
           THEN ROUND(
             (ROUND(CAST(s_tpost AS DOUBLE) / n_tpost, 6) + 0.0
              - (ROUND(CAST(s_tpre AS DOUBLE) / n_tpre, 6) + 0.0))
             - (ROUND(CAST(s_cpost AS DOUBLE) / n_cpost, 6) + 0.0
                - (ROUND(CAST(s_cpre AS DOUBLE) / n_cpre, 6) + 0.0)),
             6) + 0.0 END AS did6
    FROM g
    """

    def build(spark, sf_dir, rows=rows):
        from pigout_spark.pipeline.behavioral import diff_in_diff

        df = spark.createDataFrame(
            rows, "k string, t boolean, p boolean, v long"
        )
        return diff_in_diff(df, "t", "p", "v", ["k"])

    return build, sql


def _gen_tempw(rng: random.Random):
    domains = [f"d{i}" for i in range(rng.randint(1, 5))]
    rows = [(rng.choice(domains),) for _ in range(rng.randint(1, 80))]
    vals = ", ".join(f"('{d}')" for (d,) in rows)
    sql = f"""
    WITH c AS (
      SELECT col0 AS domain, CAST(COUNT(*) AS BIGINT) AS n
      FROM (VALUES {vals}) t(col0) GROUP BY col0
    ), w AS (
      SELECT domain, n,
             CAST(ROUND(sqrt(CAST(n AS DOUBLE)), 6) + 0.0
                  AS DECIMAL(20,6)) AS tt
      FROM c
    ), s AS (SELECT SUM(tt) AS tot FROM w)
    SELECT domain, n,
           ROUND(CAST(tt AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0 AS w6
    FROM w, s
    """

    def build(spark, sf_dir, rows=rows):
        from pigout_spark.pipeline.curation import temperature_weights

        df = spark.createDataFrame(rows, "src string")
        return temperature_weights(df, "src", alpha=0.5)

    return build, sql




_COX_STEP = """
        , s{K} AS (
          SELECT CASE WHEN i_ > 0 AND abs(b_ + u_ / i_) <= 30
                      THEN ROUND(b_ + u_ / i_, 6) + 0.0 END AS b
          FROM (
            SELECT s{P}.b AS b_,
              CAST(SUM(CAST(ROUND(CAST(d1 AS DOUBLE)
                - CAST(d_all AS DOUBLE)
                  * ((CAST(n1 AS DOUBLE) * exp(s{P}.b))
                     / (CAST(n1 AS DOUBLE) * exp(s{P}.b)
                        + CAST(n0 AS DOUBLE))), 6) + 0.0
                AS DECIMAL(20,6))) AS DOUBLE) AS u_,
              CAST(SUM(CAST(ROUND(CAST(d_all AS DOUBLE)
                * ((CAST(n1 AS DOUBLE) * exp(s{P}.b))
                   / (CAST(n1 AS DOUBLE) * exp(s{P}.b)
                      + CAST(n0 AS DOUBLE)))
                * (1.0 - ((CAST(n1 AS DOUBLE) * exp(s{P}.b))
                   / (CAST(n1 AS DOUBLE) * exp(s{P}.b)
                      + CAST(n0 AS DOUBLE)))), 6) + 0.0
                AS DECIMAL(20,6))) AS DOUBLE) AS i_
            FROM pt, s{P} GROUP BY s{P}.b
          )
        )"""


def _gen_r14b(rng: random.Random, kind: str, rows, cte: str, mkdf):
    """r14 late additions: Mann-Kendall (random point clouds with ties
    and NULLs), Chao1 (random corpora), Fellegi-Sunter (random records
    + candidate pairs, random m), and the PNG codec (random pixels AND
    random per-row filter types: the oracle sums the SAME pixels from
    a VALUES relation, so encode_png ∘ decode_png is the thing under
    differential test)."""
    if kind == "mk":
        cap = rng.choice([3, 5, 50])
        nk = rng.randint(1, 3)
        pts = []
        for i in range(rng.randint(2, 30)):
            k = f"k{rng.randint(0, nk - 1)}"
            x = None if rng.random() < 0.1 else rng.randint(0, 8)
            y = None if rng.random() < 0.1 else rng.randint(-3, 3)
            pts.append((k, x, y))
        vals = ", ".join(
            f"('{k}', {'NULL' if x is None else x}, "
            f"{'NULL' if y is None else y})"
            for k, x, y in pts
        )
        sql = f"""
        WITH pts0 AS (SELECT * FROM (VALUES {vals}) AS __p(k, x, y)),
        d AS (SELECT k, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y
              FROM pts0 WHERE x IS NOT NULL AND y IS NOT NULL),
        r AS (SELECT k, x, y,
                     row_number() OVER (PARTITION BY k ORDER BY x, y)
                       AS rn
              FROM d),
        c AS (SELECT * FROM r WHERE rn <= {cap}),
        base AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_points
                 FROM c GROUP BY k),
        s AS (SELECT a.k,
                     CAST(SUM(CASE WHEN b.y > a.y THEN 1
                                   WHEN b.y < a.y THEN -1 ELSE 0 END)
                          AS BIGINT) AS s_stat
              FROM c a JOIN c b ON a.k = b.k AND a.rn < b.rn
              GROUP BY a.k),
        tv AS (SELECT k, y, CAST(COUNT(*) AS BIGINT) AS t
               FROM c GROUP BY k, y),
        ties AS (SELECT k, CAST(SUM(t * (t - 1) * (2 * t + 5))
                               AS BIGINT) AS tie_term
                 FROM tv GROUP BY k),
        j AS (SELECT base.k, base.n_points,
                     COALESCE(s.s_stat, 0) AS s_stat,
                     CAST(base.n_points * (base.n_points - 1)
                          * (2 * base.n_points + 5) - ties.tie_term
                          AS BIGINT) AS var_num
              FROM base
              JOIN ties ON base.k = ties.k
              LEFT JOIN s ON base.k = s.k),
        z AS (SELECT k, n_points, s_stat, var_num,
                CASE WHEN n_points >= 2 AND var_num > 0 THEN
                  ROUND(CASE WHEN s_stat > 0
                               THEN (s_stat - 1.0)
                                    / sqrt(CAST(var_num AS DOUBLE) / 18.0)
                             WHEN s_stat < 0
                               THEN (s_stat + 1.0)
                                    / sqrt(CAST(var_num AS DOUBLE) / 18.0)
                             ELSE 0.0 END, 6) + 0.0
                END AS z6
              FROM j)
        SELECT k, n_points, s_stat, var_num, z6,
          CASE WHEN z6 IS NOT NULL THEN
            ROUND(LEAST(1.0, 2.0 * (exp(-abs(z6) * abs(z6) / 2.0)
              * 0.3989422804014327
              * ((1.0 / (1.0 + 0.2316419 * abs(z6)))
                 * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(z6)))
                   * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(z6)))
                     * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(z6)))
                       * (-1.821255978
                          + (1.0 / (1.0 + 0.2316419 * abs(z6)))
                          * 1.330274429))))))), 6) + 0.0
          END AS p6
        FROM z
        """

        def build(spark, sf_dir):
            from pigout_spark.pipeline.behavioral import mann_kendall

            df = spark.createDataFrame(pts, "k string, x int, y int")
            return mann_kendall(
                df, "x", "y", ["k"], max_points_per_key=cap
            )

        return build, sql
    if kind == "chao1f":
        sql = (
            cte
            + f"""
            , toks AS (
              SELECT unnest({_P_TOKS}) AS tok FROM documents
              WHERE text IS NOT NULL
            ), f AS (
              SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
              FROM toks GROUP BY tok
            ), a AS (
              SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_tokens,
                     CAST(COUNT(*) AS BIGINT) AS vocab,
                     CAST(COALESCE(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END),
                                   0) AS BIGINT) AS f1,
                     CAST(COALESCE(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END),
                                   0) AS BIGINT) AS f2
              FROM f
            )
            SELECT n_tokens, vocab, f1, f2,
              CASE WHEN n_tokens > 0 THEN
                ROUND(CAST(vocab AS DOUBLE)
                      + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
                        / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), 6) + 0.0
              END AS chao1_6,
              CASE WHEN n_tokens > 0 THEN
                ROUND(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE),
                      6) + 0.0
              END AS coverage6
            FROM a
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.text import chao1_richness

            return chao1_richness(mkdf(spark))

        return build, sql
    if kind == "fs":
        m = round(rng.uniform(0.55, 0.98), 3)
        alpha = ["u", "v", "w", "x"]
        recs = []
        for i in range(rng.randint(4, 20)):
            f1 = None if rng.random() < 0.15 else rng.choice(alpha)
            f2 = None if rng.random() < 0.15 else rng.choice(alpha[:2])
            recs.append((i, f1, f2))
        # guarantee >= 2 distinct observed values per field (the op's
        # loud constant/all-NULL contract is tested in pytest, not here)
        recs += [(1000, "zz1", "qq1"), (1001, "zz2", "qq2")]
        ids = [r[0] for r in recs]
        pairs = set()
        for _ in range(rng.randint(1, 25)):
            a, b = rng.sample(ids, 2)
            pairs.add((min(a, b), max(a, b)))
        pairs = sorted(pairs)
        rvals = ", ".join(
            f"({i}, {('NULL' if a is None else chr(39) + a + chr(39))}, "
            f"{('NULL' if b is None else chr(39) + b + chr(39))})"
            for i, a, b in recs
        )
        pvals = ", ".join(f"({a}, {b})" for a, b in pairs)
        sql = f"""
        WITH r AS (SELECT * FROM (VALUES {rvals}) AS __r(id, f1, f2)),
        p AS (SELECT * FROM (VALUES {pvals}) AS __p(id_a, id_b)),
        u1 AS (SELECT CAST(SUM(c * c) AS DOUBLE)
                      / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
                        AS u
               FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM r
                     WHERE f1 IS NOT NULL GROUP BY f1)),
        u2 AS (SELECT CAST(SUM(c * c) AS DOUBLE)
                      / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
                        AS u
               FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM r
                     WHERE f2 IS NOT NULL GROUP BY f2)),
        w AS (SELECT ROUND(log2({m} / u1.u), 6) + 0.0 AS w1a,
                     ROUND(log2((1.0 - {m}) / (1.0 - u1.u)), 6) + 0.0
                       AS w1d,
                     ROUND(log2({m} / u2.u), 6) + 0.0 AS w2a,
                     ROUND(log2((1.0 - {m}) / (1.0 - u2.u)), 6) + 0.0
                       AS w2d
              FROM u1, u2),
        j AS (SELECT p.id_a, p.id_b,
                     a.f1 AS a1, b.f1 AS b1, a.f2 AS a2, b.f2 AS b2
              FROM p JOIN r a ON p.id_a = a.id
                     JOIN r b ON p.id_b = b.id)
        SELECT id_a, id_b,
          CAST((CASE WHEN a1 IS NOT NULL AND b1 IS NOT NULL
                     THEN 1 ELSE 0 END)
             + (CASE WHEN a2 IS NOT NULL AND b2 IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_known,
          CAST((CASE WHEN a1 IS NOT NULL AND b1 IS NOT NULL AND a1 = b1
                     THEN 1 ELSE 0 END)
             + (CASE WHEN a2 IS NOT NULL AND b2 IS NOT NULL AND a2 = b2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
          ROUND(CAST(
              CAST(CASE WHEN a1 IS NULL OR b1 IS NULL THEN 0.0
                        WHEN a1 = b1 THEN w.w1a ELSE w.w1d END
                   AS DECIMAL(38,6))
            + CAST(CASE WHEN a2 IS NULL OR b2 IS NULL THEN 0.0
                        WHEN a2 = b2 THEN w.w2a ELSE w.w2d END
                   AS DECIMAL(38,6)) AS DOUBLE), 6) + 0.0 AS weight6
        FROM j, w
        """

        def build(spark, sf_dir):
            from pigout_spark.pipeline.dedup import fs_linkage_weights

            rdf = spark.createDataFrame(
                recs, "id long, f1 string, f2 string"
            )
            pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
            return fs_linkage_weights(
                rdf, pdf, "id", ["f1", "f2"], default_m=m
            )

        return build, sql
    if kind == "cox":
        # random two-group survival sets: heavy ties, all-censored
        # groups, single-subject groups — the quantized Newton chain
        # must hash-agree whatever the likelihood surface looks like
        subs = []
        for i in range(rng.randint(4, 40)):
            g = rng.choice(["a", "b"])
            t = rng.randint(1, 8)
            e = rng.random() < 0.7
            subs.append((t, e, g))
        subs += [(9, False, "a"), (9, False, "b")]  # both groups present
        vals = ", ".join(
            f"({t}, {str(e).upper()}, '{g}')" for t, e, g in subs
        )
        steps = "".join(
            _COX_STEP.format(K=k, P=k - 1) for k in range(1, 5)
        )
        sql = f"""
        WITH uv AS (SELECT * FROM (VALUES {vals}) AS __u(t, e, g)),
        per AS (
          SELECT t, g,
                 CAST(SUM(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
                 CAST(COUNT(*) AS BIGINT) AS leave
          FROM uv GROUP BY t, g
        ), byt AS (
          SELECT t, SUM(d) AS d_all, SUM(leave) AS l_all,
                 SUM(CASE WHEN g = (SELECT MIN(g) FROM per)
                          THEN d ELSE 0 END) AS d1,
                 SUM(CASE WHEN g = (SELECT MIN(g) FROM per)
                          THEN leave ELSE 0 END) AS l1
          FROM per GROUP BY t
        ), c AS (
          SELECT t, d_all, d1,
                 SUM(l_all) OVER ()
                   - coalesce(SUM(l_all) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS n_all,
                 SUM(l1) OVER ()
                   - coalesce(SUM(l1) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS n1,
                 l_all
          FROM byt
        ), pt AS (
          SELECT t, d_all, d1, n1, n_all - n1 AS n0
          FROM c WHERE d_all > 0
        ), tot AS (
          SELECT CAST(SUM(l_all) AS BIGINT) AS n,
                 CAST(COALESCE(SUM(d_all), 0) AS BIGINT) AS n_events
          FROM byt
        ), s0 AS (SELECT 0.0 AS b){steps}
        , fin AS (
          SELECT s4.b AS b,
            CAST(SUM(CAST(ROUND(CAST(d_all AS DOUBLE)
              * ((CAST(n1 AS DOUBLE) * exp(s4.b))
                 / (CAST(n1 AS DOUBLE) * exp(s4.b)
                    + CAST(n0 AS DOUBLE)))
              * (1.0 - ((CAST(n1 AS DOUBLE) * exp(s4.b))
                 / (CAST(n1 AS DOUBLE) * exp(s4.b)
                    + CAST(n0 AS DOUBLE)))), 6) + 0.0
              AS DECIMAL(20,6))) AS DOUBLE) AS i_
          FROM pt, s4 GROUP BY s4.b
        ), res AS (
          SELECT tot.n, tot.n_events,
            CASE WHEN fin.b IS NOT NULL AND fin.i_ > 0 THEN fin.b END
              AS beta6,
            CASE WHEN fin.b IS NOT NULL AND fin.i_ > 0
                 THEN ROUND(exp(fin.b), 6) + 0.0 END AS hr6,
            CASE WHEN fin.b IS NOT NULL AND fin.i_ > 0
                 THEN ROUND(1.0 / sqrt(fin.i_), 6) + 0.0 END AS se6,
            CASE WHEN fin.b IS NOT NULL AND fin.i_ > 0
                 THEN ROUND(fin.b * sqrt(fin.i_), 6) + 0.0 END AS z6
          FROM tot, fin
        )
        SELECT n, n_events, beta6, hr6, se6, z6,
          CASE WHEN z6 IS NOT NULL THEN
            ROUND(LEAST(1.0, 2.0 * (exp(-abs(z6) * abs(z6) / 2.0)
              * 0.3989422804014327
              * ((1.0 / (1.0 + 0.2316419 * abs(z6)))
                 * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(z6)))
                   * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(z6)))
                     * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(z6)))
                       * (-1.821255978
                          + (1.0 / (1.0 + 0.2316419 * abs(z6)))
                          * 1.330274429))))))), 6) + 0.0
          END AS p6
        FROM res
        """

        def build(spark, sf_dir):
            from pigout_spark.pipeline.behavioral import cox_ph_binary

            df = spark.createDataFrame(subs, "t int, e boolean, g string")
            return cox_ph_binary(df, "t", "e", "g")

        return build, sql
    if kind == "dhash":
        # random rasters (dims 1..14, grey/RGB, random pixels) through
        # encode_png -> decode -> dhash_rows; the oracle recomputes the
        # 9x8 grid/bits from a VALUES relation of the SAME pixels
        cases = []
        lum_rows = []
        for i in range(rng.randint(2, 5)):
            w = rng.randint(1, 14)
            h = rng.randint(1, 12)
            ct = rng.choice([0, 2])
            bpp = 1 if ct == 0 else 3
            pix = [rng.randint(0, 255) for _ in range(w * h * bpp)]
            filt = [rng.randint(0, 4) for _ in range(h)]
            cases.append((i, w, h, ct, bytes(pix), filt))
            for y in range(h):
                for x in range(w):
                    j = (y * w + x) * bpp
                    v = pix[j] if bpp == 1 else (
                        pix[j] + pix[j + 1] + pix[j + 2]) // 3
                    lum_rows.append((i, w, h, x, y, v))
        lvals = ", ".join(
            f"({d}, {w}, {h}, {x}, {y}, {v})"
            for d, w, h, x, y, v in lum_rows
        )
        sql = f"""
        WITH lum0 AS (SELECT * FROM (VALUES {lvals})
                      AS __l(doc_id, w, h, x, y, v)),
        g AS (
          SELECT DISTINCT doc_id, w, h FROM lum0
        ), cb AS (
          SELECT g.doc_id, g.w, g.h, gx.gx, gy.gy,
                 (gx * w) // 9 AS x0,
                 greatest((gx * w) // 9 + 1, ((gx + 1) * w) // 9) AS x1,
                 (gy * h) // 8 AS y0,
                 greatest((gy * h) // 8 + 1, ((gy + 1) * h) // 8) AS y1
          FROM g, (SELECT unnest(range(0, 9)) AS gx) gx,
                  (SELECT unnest(range(0, 8)) AS gy) gy
        ), cavg AS (
          SELECT cb.doc_id, cb.gx, cb.gy,
                 SUM(l.v) // COUNT(*) AS a
          FROM cb JOIN lum0 l
            ON l.doc_id = cb.doc_id
           AND l.x >= cb.x0 AND l.x < cb.x1
           AND l.y >= cb.y0 AND l.y < cb.y1
          GROUP BY cb.doc_id, cb.gx, cb.gy
        ), bits AS (
          SELECT l.doc_id, l.gy,
                 CAST(SUM(CASE WHEN l.a > r.a
                               THEN (1 << (7 - l.gx)) ELSE 0 END)
                      AS INT) AS b
          FROM cavg l
          JOIN cavg r ON l.doc_id = r.doc_id AND l.gy = r.gy
                     AND r.gx = l.gx + 1
          WHERE l.gx < 8
          GROUP BY l.doc_id, l.gy
        )
        SELECT doc_id,
               MAX(CASE WHEN gy = 0 THEN b END) AS b0,
               MAX(CASE WHEN gy = 1 THEN b END) AS b1,
               MAX(CASE WHEN gy = 2 THEN b END) AS b2,
               MAX(CASE WHEN gy = 3 THEN b END) AS b3,
               MAX(CASE WHEN gy = 4 THEN b END) AS b4,
               MAX(CASE WHEN gy = 5 THEN b END) AS b5,
               MAX(CASE WHEN gy = 6 THEN b END) AS b6,
               MAX(CASE WHEN gy = 7 THEN b END) AS b7
        FROM bits GROUP BY doc_id
        """

        def build(spark, sf_dir):
            from pigout_spark.pipeline.multimodal import (
                dhash_png_images,
                encode_png,
            )

            payloads = [
                (i, bytearray(encode_png(w, h, pix, color_type=ct,
                                         row_filters=filt)))
                for i, w, h, ct, pix, filt in cases
            ]
            df = spark.createDataFrame(
                payloads, "doc_id long, payload binary"
            )
            return dhash_png_images(df)

        return build, sql
    if kind == "winnow":
        # random k/w over the random corpus: rightmost-min ties are
        # frequent on tiny alphabets, short docs hit the single-window
        # convention, sub-k docs the empty case
        k = rng.randint(1, 4)
        w = rng.randint(1, 5)
        sql = (
            cte
            + f"""
            , dd AS (
              SELECT doc_id, {_P_TOKS} AS toks
              FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
            ), kg AS (
              SELECT doc_id,
                list_transform(range(0, len(toks) - {k - 1}), i ->
                  ('0x' || substr(md5(array_to_string(
                     list_slice(toks, i + 1, i + {k}), ' ')), 1,
                     7))::BIGINT) AS hs
              FROM dd WHERE len(toks) >= {k}
            ), we AS (
              SELECT doc_id, hs, least({w}, len(hs)) AS w FROM kg
            ), sel AS (
              SELECT doc_id,
                list_transform(range(0, len(hs) - w + 1), j ->
                  struct_pack(
                    pos := j + w - list_position(
                      list_reverse(list_slice(hs, j + 1, j + w)),
                      list_min(list_slice(hs, j + 1, j + w))),
                    fp := list_min(list_slice(hs, j + 1, j + w)))) AS sels
              FROM we
            ), ex AS (
              SELECT doc_id, unnest(sels) AS s FROM sel
            )
            SELECT DISTINCT doc_id AS id, CAST(s.pos AS BIGINT) AS pos,
                   s.fp AS fp
            FROM ex
            """
        )

        def build(spark, sf_dir):
            from pigout_spark.pipeline.dedup import winnowing_fingerprints

            return winnowing_fingerprints(
                mkdf(spark), "doc_id", "text", k=k, w=w
            ).withColumnRenamed("id", "id")

        return build, sql
    if kind == "jw":
        # random short strings over a tiny alphabet: exercises the
        # matching window, transpositions, prefix boost and threshold;
        # the oracle is DuckDB's OWN jaro_winkler_similarity
        ms = rng.choice([0.0, 0.5, 0.8, 0.9])
        bl = rng.choice([1, 2, 3])
        strs = [
            (
                i,
                "".join(
                    rng.choice("abcd")
                    for _ in range(rng.randint(0, 8))
                ),
            )
            for i in range(rng.randint(3, 14))
        ]
        svals = ", ".join(f"({i}, '{s_}')" for i, s_ in strs)
        sql = f"""
        WITH p AS (SELECT * FROM (VALUES {svals}) AS __v(id, s)),
        k AS (
          SELECT id, s, 'p' AS side, substring(s, 1, {bl}) AS bk FROM p
          UNION ALL
          SELECT id, s, 's' AS side,
                 substring(s, length(s) - {bl - 1}, {bl}) AS bk
          FROM p WHERE length(s) >= {bl}
        ), cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
          FROM k a JOIN k b ON a.side = b.side AND a.bk = b.bk
                           AND a.id < b.id
        )
        SELECT id_a, id_b,
               ROUND(jaro_winkler_similarity(sa, sb), 6) + 0.0 AS jw6
        FROM cand
        WHERE ROUND(jaro_winkler_similarity(sa, sb), 6) + 0.0 >= {ms}
        """

        def build(spark, sf_dir):
            from pigout_spark.pipeline.dedup import jw_pairs

            df = spark.createDataFrame(strs, "id long, s string")
            return jw_pairs(
                df, "id", "s", min_sim=ms, block_len=bl, max_block=None
            )

        return build, sql
    # png: random dimensions/colortype/pixels AND random row filters
    cases = []
    pix_rows = []
    for i in range(rng.randint(2, 5)):
        w = rng.randint(1, 12)
        h = rng.randint(1, 10)
        ct = rng.choice([0, 2])
        bpp = 1 if ct == 0 else 3
        pix = [rng.randint(0, 255) for _ in range(w * h * bpp)]
        filt = [rng.randint(0, 4) for _ in range(h)]
        cases.append((i, w, h, ct, bytes(pix), filt))
        for j, v in enumerate(pix):
            pix_rows.append((i, j % bpp, v))
    hdr_vals = ", ".join(
        f"({i}, {w}, {h}, {ct})" for i, w, h, ct, _, _ in cases
    )
    pix_vals = ", ".join(f"({d}, {c}, {v})" for d, c, v in pix_rows)
    sql = f"""
    WITH hd AS (SELECT * FROM (VALUES {hdr_vals})
                AS __h(doc_id, w, h, ct)),
    px AS (SELECT * FROM (VALUES {pix_vals}) AS __x(doc_id, c, v)),
    agg AS (SELECT doc_id,
                   SUM(CASE WHEN c = 0 THEN v END) AS s0,
                   SUM(CASE WHEN c = 1 THEN v END) AS s1,
                   SUM(CASE WHEN c = 2 THEN v END) AS s2
            FROM px GROUP BY doc_id)
    SELECT hd.doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(ct AS INT) AS color_type, CAST(3 AS INT) AS n_chunks,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(agg.s0 AS BIGINT) AS sum_c0,
           CAST(CASE WHEN ct = 2 THEN agg.s1 END AS BIGINT) AS sum_c1,
           CAST(CASE WHEN ct = 2 THEN agg.s2 END AS BIGINT) AS sum_c2
    FROM hd JOIN agg USING (doc_id)
    """

    def build(spark, sf_dir):
        from pigout_spark.pipeline.multimodal import (
            decode_png_images,
            encode_png,
        )

        payloads = [
            (i, bytearray(encode_png(w, h, pix, color_type=ct,
                                     row_filters=filt)))
            for i, w, h, ct, pix, filt in cases
        ]
        df = spark.createDataFrame(payloads, "doc_id long, payload binary")
        return decode_png_images(df)

    return build, sql


if __name__ == "__main__":
    raise SystemExit(main())
