"""Focused oracle check: hash-compare a SUBSET of registry queries vs
their DuckDB oracles (same canonicalization as driver_sim.py), at both
sf0.01 and sf0.001 by default. Usage:

    python scripts/oracle_check.py q_minhash_dedup q_simhash_dedup ...
    SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 python scripts/oracle_check.py ...
"""
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e


def canon(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: oracle_check.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    sfs = (
        [os.environ["SPARK_GRAFT_ORACLE_SF"]]
        if os.environ.get("SPARK_GRAFT_ORACLE_SF")
        else ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]
    )
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracle = e.queries(), e.oracle_sql()
    fail = 0
    for sf in sfs:
        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        for name in names:
            t0 = time.time()
            sdf = qs[name](spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracle:
                print(f"ROWS {name} @{sf}: {len(srows)} rows")
                continue
            res = con.execute(oracle[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            match = (
                len(srows) == len(orows)
                and sorted(scols) == sorted(ocols)
                and sh == oh
            )
            fail += 0 if match else 1
            print(
                f"{'OK  ' if match else 'FAIL'} {name} @{os.path.basename(sf)}: "
                f"spark {len(srows)}r vs oracle {len(orows)}r, "
                f"hash {sh} vs {oh} ({time.time() - t0:.1f}s)",
                flush=True,
            )
    print(json.dumps({"fail": fail}))
    spark.stop()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
