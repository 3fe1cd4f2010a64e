"""Scale an existing fixture directory by integer replication — the r9
verdict's task 2 (rehearse scale empirically: a 10x data point converts
the SCALE.md fixed-cost-amortization ARGUMENT into a measurement).

Each replica shifts every key domain by a per-table stride (max key +
1), so referential integrity (orders->customer, lineitem->orders/part/
supplier) and per-key cardinalities are preserved exactly: the scaled
fixture has 10x the keys, not 10x-hotter keys.  Non-key payloads are
replicated verbatim; region/nation (fixed dimensions) copy unchanged.

Composition note: document TEXTS get a per-replica word suffix
("_r3"), making every replica's vocabulary DISJOINT — so near-dup
structure is 10 independent copies of the source's (10x more distinct
dup groups of the same size), not 10-clone groups whose candidate
pairs grow quadratically with the factor (measured r10: verbatim
replication made the minhash/simhash pair relations ~40x at 10x data
— a fixture pathology, not an engine property).  Events timestamps
are reused across replicas (distinct users, so per-user session
structure is preserved); embeddings replicate verbatim (the ANN
families are top-k/cell-bounded, measured linear).

Usage:
    python tools/make_scale.py /root/testdata/sf0.1 .localdata/sf1 10
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

#: per-table key columns that shift by (their table's stride) x replica;
#: fk entries shift by the REFERENCED table's stride so joins stay valid
KEYED = {
    "customer": {"pk": "c_custkey", "fk": {}},
    "supplier": {"pk": "s_suppkey", "fk": {}},
    "part": {"pk": "p_partkey", "fk": {}},
    "orders": {"pk": "o_orderkey", "fk": {"o_custkey": "customer"}},
    "lineitem": {
        "pk": None,
        "fk": {
            "l_orderkey": "orders",
            "l_partkey": "part",
            "l_suppkey": "supplier",
        },
    },
    "events": {"pk": "event_id", "fk": {}, "extra_pk": ["user_id"]},
    "documents": {"pk": "doc_id", "fk": {}},
    "embeddings": {"pk": "vec_id", "fk": {}},
}
COPY_ONLY = ["region", "nation"]


def stride_of(con, src: Path, table: str, col: str) -> int:
    return (
        con.execute(
            f"SELECT CAST(MAX({col}) + 1 AS BIGINT) "
            f"FROM '{src}/{table}.parquet'"
        ).fetchone()[0]
    )


def main() -> int:
    src = Path(sys.argv[1])
    dst = Path(sys.argv[2])
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    strides: dict[str, int] = {}
    for t, spec in KEYED.items():
        if spec["pk"]:
            strides[t] = stride_of(con, src, t, spec["pk"])
    # user_id lives in events but is its own domain
    strides["__user"] = stride_of(con, src, "events", "user_id")

    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, spec in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            if spec["pk"] == c:
                sel.append(f"{c} + __i * {strides[t]} AS {c}")
            elif c in spec["fk"]:
                sel.append(f"{c} + __i * {strides[spec['fk'][c]]} AS {c}")
            elif c in spec.get("extra_pk", []):
                sel.append(f"{c} + __i * {strides['__user']} AS {c}")
            elif t == "documents" and c == "text":
                # disjoint per-replica vocabulary (see module docstring)
                sel.append(
                    "CASE WHEN __i = 0 THEN text ELSE "
                    "regexp_replace(text, '(\\S+)', "
                    "'\\1_r' || __i, 'g') END AS text"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM '{src}/{t}.parquet', range(0, {factor}) r(__i)) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows (x{factor})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
