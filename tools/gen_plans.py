import sys, io, contextlib
import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("plans")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
q = E.queries()
NAMES = ["q1_pricing_summary", "j2_asof_nearest_view", "j4_band_join_28d",
         "dedup_ngram_jaccard", "dedup_minhash_lsh", "ann_cosine_topk",
         "kg_stream_triples", "metrics_session_block", "w8_sessionize_gap"]
HEADER = '''# PLANS — formatted physical plans for headline queries (sf0.01, local[8])

Generated with `.explain("formatted")`; regenerate via
`python tools/gen_plans.py` (writes this file). What to look for
(asserted programmatically in tests/test_plans.py):
- every parquet scan carries PushedFilters + a pruned ReadSchema;
- dimension/as-of/band joins pick BroadcastHashJoin at this scale
  (Catalyst/AQE will flip to SortMergeJoin when the build side outgrows
  the broadcast threshold — the equi keys are in place for that);
- the triple lift is Exchange-free; aggregations show partial
  (map-side) combines; top-k plans as TakeOrderedAndProject.

```
'''
out = [HEADER]
for name in NAMES:
    df = q[name](spark, "/root/testdata/sf0.01")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    out.append(f"\n==================== {name} ====================\n")
    out.append(buf.getvalue())
out.append("```\n")
open(os.path.join(REPO, "PLANS.md"), "w").write("".join(out))
print("written", sum(len(o) for o in out), "chars")
