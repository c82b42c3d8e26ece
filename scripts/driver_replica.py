"""Driver-contract replica: fresh-import __spark_entry__, plain session,
run every queries() entry vs its oracle_sql() in DuckDB at sf0.01."""
import importlib.util
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location("__spark_entry__", os.path.join(_REPO, "__spark_entry__.py"))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver_replica")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)

from tests.oracle_check import duck, _rows

SF = "/root/testdata/sf0.01"
qs, os_ = mod.queries(), mod.oracle_sql()
bad, n_match, n_rows_only = [], 0, 0
t0 = time.time()
for name, fn in sorted(qs.items()):
    try:
        df = fn(spark, SF)
        recs = [tuple(r) for r in df.collect()]
        cols = df.columns
        if name not in os_:
            n_rows_only += 1
            print(f"{name}: ROWS-ONLY ({len(recs)} rows)", flush=True)
            continue
        rel = duck(SF).execute(os_[name])
        orecs = rel.fetchall()
        ocols = [d[0] for d in rel.description]
        if sorted(cols) != sorted(ocols):
            bad.append(name)
            print(f"{name}: SCHEMA MISMATCH {sorted(cols)} vs {sorted(ocols)}", flush=True)
        elif _rows(recs, cols) != _rows(orecs, ocols):
            bad.append(name)
            print(f"{name}: VALUE MISMATCH ({len(recs)} vs {len(orecs)} rows)", flush=True)
        else:
            n_match += 1
    except Exception as e:
        bad.append(name)
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}", flush=True)

print(f"\n{n_match} MATCH, {n_rows_only} rows-only, {len(bad)} BAD in {time.time()-t0:.0f}s")
print("BAD:", bad)

# entry() smoke check
res = mod.entry(spark)
print("entry rows:", len(res.collect()), "schema:", [f.name for f in res.schema.fields])
