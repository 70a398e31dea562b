"""Scaling-efficiency evidence: the BASELINE.json criterion is
``throughput(4N) / (4 x throughput(N)) >= 0.8`` between two cluster sizes.
No real cluster exists in this sandbox, so (per the driver instruction) we
run the identical spark-submit --py-files job at local[8] (N) and
local[32] (4N) on the same input and report both throughputs.

Usage: python bench/scaling.py [--rows 3000000] [--out BENCH_SCALING.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_zip() -> str:
    zpath = "/tmp/sparklog_pyfiles.zip"
    pkg = os.path.join(REPO, "sparklog")
    with zipfile.ZipFile(zpath, "w") as z:
        for fn in sorted(os.listdir(pkg)):
            if fn.endswith(".py"):
                z.write(os.path.join(pkg, fn), f"sparklog/{fn}")
    return zpath


def gen_source(rows: int, chunk: int = 500_000) -> str:
    """Chunked deterministic corpus generation (unique doc_ids per chunk)."""
    path = f"/tmp/sparklog_scale_src_{rows}"
    if os.path.exists(os.path.join(path, "_COMPLETE")):
        return path
    from pyspark.sql import functions as F

    from sparklog.encoding import tokenize_col
    from sparklog.fixtures import synth_lines
    from sparklog.session import get_spark

    spark = get_spark("local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    n_chunks = (rows + chunk - 1) // chunk
    for i in range(n_chunks):
        n = min(chunk, rows - i * chunk)
        pdf = synth_lines(n, seed=42 + i)
        pdf["doc_id"] = [f"c{i:03d}-{d}" for d in pdf["doc_id"]]
        df = spark.createDataFrame(pdf)
        (df.repartition(16)
           .withColumn("tokens", tokenize_col("raw"))
           .withColumn("n_tok", F.size("tokens").cast("int"))
           .select("doc_id", "tokens", "n_tok", "source")
           .write.mode("append" if i else "overwrite").parquet(path))
        print(f"generated chunk {i + 1}/{n_chunks}", flush=True)
    open(os.path.join(path, "_COMPLETE"), "a").close()
    spark.stop()
    return path


def submit(master: str, src: str, zpath: str) -> dict:
    spark_home = os.environ.get("SPARK_HOME")
    submit_bin = (os.path.join(spark_home, "bin", "spark-submit")
                  if spark_home else "spark-submit")
    cores = master.split("[")[1].rstrip("]")
    cmd = [
        submit_bin, "--master", master,
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        "--driver-memory", "32g",
        "--py-files", zpath,
        os.path.join(REPO, "bench", "pipeline_job.py"),
        "--src", src,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from spark-submit:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=3_000_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALING.md"))
    args = ap.parse_args()

    src = gen_source(args.rows)
    zpath = build_zip()
    r8 = submit("local[8]", src, zpath)
    print("local[8]:", r8, flush=True)
    r32 = submit("local[32]", src, zpath)
    print("local[32]:", r32, flush=True)

    eff = r32["rows_per_sec"] / (4 * r8["rows_per_sec"])
    md = f"""# Scaling efficiency evidence (north-rule criterion)

Criterion: `throughput(4N) / (4 x throughput(N)) >= 0.8`.
Sandbox stand-in for N vs 4N executors (no real cluster): identical
`spark-submit --py-files sparklog.zip bench/pipeline_job.py` runs at
`local[8]` and `local[32]` over the same {args.rows:,}-row tokens table
(best of 2 runs each; the job is the full parse -> enrich -> route ->
salted-repartition phase).

| level | rows | wall (s) | parsed-and-routed rows/sec |
|---|---|---|---|
| local[8]  (N)  | {r8['rows']:,} | {r8['best_sec']} | {r8['rows_per_sec']:,} |
| local[32] (4N) | {r32['rows']:,} | {r32['best_sec']} | {r32['rows_per_sec']:,} |

**Scaling efficiency = {r32['rows_per_sec']:,} / (4 x {r8['rows_per_sec']:,})
= {eff:.3f}**  ({'PASS' if eff >= 0.8 else 'BELOW TARGET'} vs the 0.8 bar)

Host-noise caveat: this sandbox shows 2-6x run-to-run wall-time variance;
best-of-2 per level mitigates but does not eliminate it.
"""
    with open(args.out, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
