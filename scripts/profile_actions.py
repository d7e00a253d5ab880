"""Profile registry entries: wall time + driver-action count + plan capture.

Wraps every driver-triggering DataFrame method (collect/count/first/take/
head/toPandas/write.*) so each call is counted, and optionally dumps
`.explain("formatted")` of the acting DataFrame per action — the harness
behind the action-count evidence and the `plans/r13/*_{before,after}.txt`
artifacts in OPTIMIZATION_r13.md.

Usage (from the repo root, so executors can import the package):
  python scripts/profile_actions.py [sf_dir] [only_csv] [plans_out_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = [s for s in (sys.argv[2].split(",") if len(sys.argv) > 2 else []) if s]
PLANS = sys.argv[3] if len(sys.argv) > 3 else ""

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from iceberg_evolve_spark.sources import get_session  # noqa: E402
import __spark_entry__ as em  # noqa: E402

spark = get_session(app_name="profile-actions")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.classic.dataframe import DataFrameWriter  # noqa: E402

STATE = {"n": 0, "entry": "", "fh": None}

def _plan_of(df):
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception:
        try:
            return df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # pragma: no cover
            return f"<plan unavailable: {e}>"

def _record(df, kind):
    STATE["n"] += 1
    if STATE["fh"] is not None:
        STATE["fh"].write(
            f"\n===== action {STATE['n']} [{kind}] =====\n" + _plan_of(df)
        )

_orig = {}
for name in ("collect", "count", "first", "take", "head", "toPandas"):
    _orig[name] = getattr(DataFrame, name)

def _wrap_df(name):
    orig = _orig[name]
    def f(self, *a, **k):
        _record(self, name)
        return orig(self, *a, **k)
    return f

for name in ("collect", "count", "first", "take", "head", "toPandas"):
    setattr(DataFrame, name, _wrap_df(name))

_wsave = {}
for name in ("save", "parquet", "orc", "csv", "json", "text", "saveAsTable"):
    _wsave[name] = getattr(DataFrameWriter, name)

def _wrap_w(name):
    orig = _wsave[name]
    def f(self, *a, **k):
        df = getattr(self, "_df", None)
        if df is not None:
            _record(df, f"write.{name}")
        else:
            STATE["n"] += 1
        return orig(self, *a, **k)
    return f

for name in ("save", "parquet", "orc", "csv", "json", "text", "saveAsTable"):
    setattr(DataFrameWriter, name, _wrap_w(name))

qs = dict(em.queries())
if hasattr(em, "queries_extended"):
    qs.update(em.queries_extended())
names = ONLY or list(qs)

# bench-style warmup so one-time costs (codegen, Arrow workers, MLlib) are
# not billed to the first entries
STATE["entry"] = "_warmup"
for wq in ("q1_pricing_summary", "dedup_minhash_signatures", "ann_topk_bruteforce"):
    _wsave["save"](qs[wq](spark, SF).write.format("noop").mode("overwrite"))
    spark.catalog.clearCache()
from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import functions as F
tiny = spark.createDataFrame([([0.0,0.0],),([1.0,1.0],),([2.0,2.0],)], "v array<double>").select(array_to_vector(F.col("v")).alias("features"))
KMeans(k=2, seed=1, maxIter=1).fit(tiny)
_wsave["save"](spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").write.format("noop").mode("overwrite"))
STATE["n"] = 0

out = {}
for nm in names:
    STATE["entry"] = nm
    STATE["n"] = 0
    if PLANS:
        os.makedirs(PLANS, exist_ok=True)
        STATE["fh"] = open(os.path.join(PLANS, f"{nm}.txt"), "w")
    t0 = time.time()
    try:
        df = qs[nm](spark, SF)
        _record(df, "noop-sink")
        STATE["n"] -= 1  # final sink not counted as an extra internal action
        _wsave["save"](df.write.format("noop").mode("overwrite"))
        dt = round(time.time() - t0, 3)
        out[nm] = {"sec": dt, "actions": STATE["n"]}
    except Exception as e:
        out[nm] = {"sec": None, "actions": STATE["n"], "err": repr(e)[:200]}
    finally:
        if STATE["fh"]:
            STATE["fh"].close()
            STATE["fh"] = None
        spark.catalog.clearCache()
    print(json.dumps({nm: out[nm]}), flush=True)

with open("/tmp/profile_actions_out.json", "w") as f:
    json.dump(out, f, indent=1)
print("TOTAL", round(sum(v["sec"] or 0 for v in out.values()), 1))
