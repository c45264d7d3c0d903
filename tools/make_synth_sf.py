"""Synthesize a larger scale factor by FK-consistent replication.

Usage: python tools/make_synth_sf.py <src_sf_dir> <out_dir> <copies>

Writes <out_dir>/<table>.parquet with <copies> replicas of every
fact/dimension row. Surrogate keys are offset per replica
(key' = key + replica * ceil_pow10(max_key)) so joins keep their
per-replica structure: each replica is a self-contained copy of the
original universe, which preserves join fan-outs, group cardinalities
per key, and dup-cluster sizes — the right shape for scaling
measurements. Fixed catalog dims (region, nation) are NOT replicated:
they are constant-size at any real scale factor.

The output lives outside /root/testdata (driver data is read-only) and
exists only to extend the measured scaling curve in SCALING.md to a
third point; correctness is still gated on the driver fixtures.
"""

from __future__ import annotations

import math
import sys

import duckdb

#: key DOMAIN -> (home table, home column). The replica offset for a
#: domain is derived ONCE from the home table's max key and reused at
#: EVERY foreign-key site, so replica r's o_custkey points at replica
#: r's customer rows (and so on for part/supplier/orders). Deriving the
#: offset per table instead (the pre-round-5 bug) gave customer offset
#: 1e5 but orders.o_custkey offset 1e6: every replica>0 fact row
#: referenced a nonexistent dimension key and joins only matched
#: replica 0, understating measured join scaling.
DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

#: table -> {column: key domain} (surrogate key space per replica)
OFFSET_KEYS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

FIXED_DIMS = ("region", "nation")


def ceil_pow10(n: int) -> int:
    return 10 ** int(math.ceil(math.log10(max(n, 1) + 1)))


def main() -> None:
    src, out, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    con = duckdb.connect()
    import os

    os.makedirs(out, exist_ok=True)
    for t in FIXED_DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    offsets = {}
    for dom, (home, col) in DOMAINS.items():
        base = con.sql(
            f"SELECT max({col}) FROM read_parquet('{src}/{home}.parquet')"
        ).fetchone()[0]
        offsets[dom] = ceil_pow10(int(base))
    for t, keys in OFFSET_KEYS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        proj = ", ".join(
            f"({c} + r.k * {offsets[keys[c]]}) AS {c}" if c in keys else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {proj} FROM read_parquet('{src}/{t}.parquet'), "
            f"(SELECT unnest(range({copies})) AS k) r) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(
            f"{t}: x{copies}, offsets "
            + ", ".join(f"{c}={offsets[d]}" for c, d in keys.items())
        )
    # FK self-check: every fact-side key must resolve in its dimension.
    checks = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]
    for ft, fk, dt, dk in checks:
        dangling = con.sql(
            f"SELECT count(*) FROM read_parquet('{out}/{ft}.parquet') f "
            f"WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{out}/{dt}.parquet') d "
            f"WHERE d.{dk} = f.{fk})"
        ).fetchone()[0]
        status = "OK" if dangling == 0 else f"DANGLING {dangling}"
        print(f"fk {ft}.{fk} -> {dt}.{dk}: {status}")
        if dangling:
            raise SystemExit(f"FK check failed: {ft}.{fk}")


if __name__ == "__main__":
    main()
