"""Executed-plan scan census: run every contract row and count base-table scans in the FINAL adaptive plan (round-15 sweep tool)."""
sys.path.insert(0, "/root/repo")
from lambda_sample_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark(app_name="scan-census")
q = e.queries()
out = {}
for name in sorted(q):
    try:
        df = q[name](spark, "/root/testdata/sf0.01")
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        locs = re.findall(r'file:[^\]\s,]*?/(\w+)\.parquet', plan)
        c = collections.Counter(l for l in locs if l in
            ("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"))
        amp = {t: n for t, n in c.items() if n >= 3}
        if amp:
            out[name] = amp
    except Exception as ex:
        out[name] = f"ERR {type(ex).__name__}"
print(json.dumps(out, indent=1))
spark.stop()
