"""Simulate the round driver: import __spark_entry__ as the driver does,
smoke entry() at sf0.001, then hash-compare queries() vs oracle_sql()
via DuckDB at sf0.01 (row count + sorted-column value hash)."""
import hashlib, json, sys, time

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .appName("driver-sim")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# --- smoke: entry() ---
t0 = time.time()
df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows in {time.time()-t0:.1f}s; schema={[f.name for f in df.schema.fields]}")
print("  first:", rows[0] if rows else None)

# --- correctness: queries vs oracle (sf0.01 = the driver's gate) ---
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

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

qs, oracle = e.queries(), e.oracle_sql()
ok = bad = rows_only = 0
failures = []
for name in sorted(qs):
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name in oracle:
            res = con.execute(oracle[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            match = len(srows) == len(orows) and sorted(scols) == sorted(ocols) and sh == oh
            # latent-type-skew check: int-vs-float per column hashes the same
            # below 7 significant digits and diverges above — catch it now
            if srows and orows:
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                for a, b in zip(so, oo):
                    sv = next((r[a] for r in srows if r[a] is not None), None)
                    ov = next((r[b] for r in orows if r[b] is not None), None)
                    if sv is not None and ov is not None:
                        s_num = isinstance(sv, (int, float)) and not isinstance(sv, bool)
                        o_num = isinstance(ov, (int, float)) and not isinstance(ov, bool)
                        if s_num and o_num and isinstance(sv, float) != isinstance(ov, float):
                            print(
                                f"TYPE-SKEW {name}.{scols[a]}: spark {type(sv).__name__} "
                                f"vs oracle {type(ov).__name__}"
                            )
            status = "OK " if match else "FAIL"
            if match:
                ok += 1
            else:
                bad += 1
                failures.append(name)
            print(f"{status} {name}: spark {len(srows)}r vs oracle {len(orows)}r, hash {sh} vs {oh} ({time.time()-t0:.1f}s)")
        else:
            rows_only += 1
            print(f"ROWS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    except Exception as ex:
        bad += 1
        failures.append(name)
        print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:200]}")
print(json.dumps({"ok": ok, "fail": bad, "rows_only": rows_only, "failures": failures}))
