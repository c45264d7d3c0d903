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

#: table -> columns to offset per replica (surrogate key space)
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
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
    for t, keys in OFFSET_KEYS.items():
        base = con.sql(
            f"SELECT max(greatest({', '.join(keys)})) FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
        off = ceil_pow10(int(base))
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        proj = ", ".join(
            f"({c} + r.k * {off}) AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {proj} FROM read_parquet('{src}/{t}.parquet'), "
            f"(SELECT unnest(range({copies})) AS k) r) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: x{copies}, key offset {off}")


if __name__ == "__main__":
    main()
