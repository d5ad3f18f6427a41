"""Benchmark harness.

Default: run the headline queries once at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "pages_per_sec": ...}

--scaling: additionally run the flagship pages pipeline in fresh JVM
subprocesses at local[8] and local[32] on identical input and write
BENCH/BASELINE.md with throughputs and the N→4N scaling efficiency
(sandbox proxy for the north rule's two-cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES_BENCH = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "400000"))


def ensure_pages_parquet(spark, n_pages: int, partitions: int = 64) -> str:
    """Materialize the synthetic pages table once (the 10^12-row table is
    *read*, not synthesized, in production — and inlining the giant
    generator expression into every downstream regexp blows the 64KB
    whole-stage-codegen method limit into interpreted fallback)."""
    path = f"/tmp/zen3geo_bench_pages_{n_pages}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from zen3geo_spark.sources.pages import synth_pages

        synth_pages(spark, n_pages, partitions=partitions).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def flagship_pages_pipeline(spark, n_pages: int) -> int:
    """pages scan → extract → cell-encode → PIP join → counts. Returns
    rows processed (pages), the unit of the headline throughput metric."""
    from pyspark.sql import functions as F
    from zen3geo_spark.streaming.incremental import extract_and_encode
    from zen3geo_spark.operators.spatial_join import points_in_polygons
    import __spark_entry__ as E

    pages = spark.read.parquet(ensure_pages_parquet(spark, n_pages))
    pts = extract_and_encode(pages, res=12).select(
        F.regexp_extract("url", r"/page/(\d+)", 1).cast("long").alias("point_id"),
        "lat_us", "lon_us",
    )
    # salted PIP join (north rule: explicit skew splitting) — with only a
    # handful of polygons the refine groups are per-(geom, salt), so the
    # salt is what spreads the exact ray-cast work across all cores
    pip = points_in_polygons(pts, E._polys_df(spark), res=4, salt_factor=CPUS)
    pip.groupBy("geom_id").count().collect()
    return n_pages


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as E

    times: dict[str, float] = {}
    for name, fn in E.queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
    return times


def main() -> None:
    from zen3geo_spark.session import get_spark

    scaling = "--scaling" in sys.argv

    spark = get_spark(app_name="bench", cores=CPUS)
    # warm the JVM/JIT so per-query numbers measure the plan, not startup
    spark.range(1000).count()
    ensure_pages_parquet(spark, N_PAGES_BENCH)  # input materialization untimed

    t0 = time.time()
    n_pages = flagship_pages_pipeline(spark, N_PAGES_BENCH)
    flagship_sec = time.time() - t0
    pages_per_sec = n_pages / flagship_sec

    qtimes = run_queries(spark, SF_DIR)
    qtimes["flagship_pages_pipeline"] = round(flagship_sec, 3)
    total = round(sum(qtimes.values()), 3)
    spark.stop()

    out = {
        "metric": "pages geo-joined + tiled per second (flagship) + headline query wall",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "pages_per_sec": round(pages_per_sec, 1),
        "n_pages": n_pages,
        "cpus": CPUS,
    }

    if scaling:
        out["scaling"] = measure_scaling()

    print(json.dumps(out))


def _scaling_child(cores: int) -> None:
    from zen3geo_spark.session import get_spark

    spark = get_spark(app_name=f"scal{cores}", cores=cores,
                      shuffle_partitions=max(cores, 16))
    spark.range(1000).count()
    ensure_pages_parquet(spark, N_PAGES_BENCH)  # untimed input materialization
    t0 = time.time()
    n = flagship_pages_pipeline(spark, N_PAGES_BENCH)
    dt = time.time() - t0
    print(json.dumps({"cores": cores, "sec": dt, "pages_per_sec": n / dt}))
    spark.stop()


def measure_scaling() -> dict:
    """local[8] vs local[32] in fresh JVMs; efficiency =
    (thr32/thr8)/(32/8)."""
    results = {}
    for cores in (8, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cores)],
            capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    thr8 = results[8]["pages_per_sec"]
    thr32 = results[32]["pages_per_sec"]
    eff = (thr32 / thr8) / (32 / 8)
    summary = {
        "pages_per_sec_local8": round(thr8, 1),
        "pages_per_sec_local32": round(thr32, 1),
        "efficiency_8_to_32": round(eff, 3),
        "n_pages": N_PAGES_BENCH,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — two-parallelism scaling evidence\n\n"
            "North rule: throughput scaling efficiency >= 0.8 from N to 4N\n"
            "executors; sandbox proxy = the same flagship job (pages →\n"
            "extract → cell-encode → PIP join → counts) at local[8] vs\n"
            "local[32] on identical input, fresh JVM each.\n\n"
            f"| config | pages | wall (s) | pages/s |\n|---|---|---|---|\n"
            f"| local[8]  | {N_PAGES_BENCH} | {results[8]['sec']:.2f} | {thr8:,.0f} |\n"
            f"| local[32] | {N_PAGES_BENCH} | {results[32]['sec']:.2f} | {thr32:,.0f} |\n\n"
            f"**Scaling efficiency (8→32 cores, 4x): {eff:.3f}** "
            f"(gate: >= 0.8)\n"
        )
    return summary


if __name__ == "__main__":
    if "--child" in sys.argv:
        _scaling_child(int(sys.argv[sys.argv.index("--child") + 1]))
    else:
        main()
