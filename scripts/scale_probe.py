"""Scale-growth probe (VERDICT r10 #6): run a pinned set of headline
registry rows at sf0.01, sf0.1, and a synthetic 5x-replicated point,
and report per-row wall-clock ratios next to the data-growth ratios.
A row whose time grows FASTER than its data is the next plan-audit
target; a row growing slower is amortizing fixed overhead (session,
plan, tiny-table floors), which is what most of these fixtures do at
these sizes.

The synthetic point replicates sf0.1's tables 5x with id offsets
(original rows keep their ids, so the frozen-centroid / pinned-query
fixtures still resolve). Values are NOT compared across scales — this
probe measures time growth only; correctness is the oracle sweep's
job.

Usage: python scripts/scale_probe.py  (prints a markdown table; run on
an idle window — quote the canary next to it per the bench protocol).
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

ROWS = [
    # (row, dominant input table) — spans the cost classes: index
    # lifecycles, pruned serving, shuffle-heavy spans, agg/window SQL,
    # full-scan TPC-H, map+filter radius, the new binary-IVF family
    ("ivfsq_knn", "embeddings"),
    ("ivfsq_batch_knn", "embeddings"),
    ("ivfbq_knn", "embeddings"),
    ("embedding_range_search", "embeddings"),
    ("matryoshka_multi_recall", "embeddings"),
    ("repeated_ngram_spans", "documents"),
    ("token_span_removal", "documents"),
    ("quality_ensemble_rank", "documents"),
    ("hll_distinct_users", "events"),
    ("events_retention_cohorts", "events"),
    ("tpch_q1", "lineitem"),
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ID_COLS = {
    "embeddings": "vec_id",
    "documents": "doc_id",
    "events": "event_id",
    "lineitem": None,  # composite key; plain replication is fine for a
    # time probe (q1 is a scan+agg, duplicate keys only grow groups)
}

REPLICAS = 5

# VERDICT r11 #5: the two document rows that read ~2x time on 5x data
# (the shuffle term emerging from under fixed costs) get a deeper
# ~20x point to see whether that term is linear — only `documents`
# is replicated for it (these rows read nothing else).
DEEP_ROWS = ["repeated_ngram_spans", "quality_ensemble_rank"]
DEEP_REPLICAS = 20


def build_synthetic(
    spark, src_sf: str, replicas: int = REPLICAS, only: set | None = None
) -> str:
    """replicas-x replicate the probe tables with id offsets;
    symlink-copy the small dimension tables unchanged. ``only``
    restricts which tables are materialized (the deep point needs
    just `documents`)."""
    import pyspark.sql.functions as F

    out = tempfile.mkdtemp(prefix="scale_probe_sf_")
    for t in TABLES:
        if only is not None and t not in only:
            continue
        src = f"{src_sf}/{t}.parquet"
        if t not in ID_COLS:
            shutil.copy(src, f"{out}/{t}.parquet")
            continue
        df = spark.read.parquet(src)
        idc = ID_COLS[t]
        n = df.count()
        parts = [df]
        for i in range(1, replicas):
            d = df
            if idc is not None:
                d = d.withColumn(idc, F.col(idc) + i * 10_000_000)
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.coalesce(8).write.mode("overwrite").parquet(f"{out}/__{t}")
        # queries expect a single parquet file path, so re-read+write
        # is avoided: _t() reads directories fine via spark.read; but
        # DuckDB-style single files are not needed here. Rename dir.
        shutil.move(f"{out}/__{t}", f"{out}/{t}.parquet")
    return out


def time_rows(
    spark, queries, sf_dir: str, rows: list | None = None
) -> dict[str, float]:
    res = {}
    for name, _ in rows if rows is not None else ROWS:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        res[name] = round(time.perf_counter() - t0, 3)
    return res


def main() -> None:
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from bench import _cpu_canary_gflops
    from flechasdb_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    q = entry.queries()
    canary = _cpu_canary_gflops()
    # warm the session so sf0.01 doesn't absorb the JVM/plan floor
    time_rows(spark, q, "/root/testdata/sf0.01")
    t1 = time_rows(spark, q, "/root/testdata/sf0.01")
    t2 = time_rows(spark, q, "/root/testdata/sf0.1")
    syn = build_synthetic(spark, "/root/testdata/sf0.1")
    t3 = time_rows(spark, q, syn)
    shutil.rmtree(syn, ignore_errors=True)
    deep = build_synthetic(
        spark, "/root/testdata/sf0.1", replicas=DEEP_REPLICAS,
        only={"documents"},
    )
    deep_rows = [(n, "documents") for n in DEEP_ROWS]
    t4 = time_rows(spark, q, deep, rows=deep_rows)
    shutil.rmtree(deep, ignore_errors=True)

    growth = {
        "embeddings": (4.0, float(REPLICAS)),
        "documents": (10.0, float(REPLICAS)),
        "events": (10.0, float(REPLICAS)),
        "lineitem": (10.0, float(REPLICAS)),
    }
    print(f"canary_gflops={canary}")
    print(
        "| row | table | data x (.01->.1) | t(.01) s | t(.1) s | "
        "time x | data x (.1->5x) | t(5x) s | time x |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for name, tab in ROWS:
        g1, g2 = growth[tab]
        r1 = t2[name] / t1[name]
        r2 = t3[name] / t2[name]
        print(
            f"| {name} | {tab} | {g1:.0f}x | {t1[name]} | {t2[name]} | "
            f"{r1:.2f}x | {g2:.0f}x | {t3[name]} | {r2:.2f}x |"
        )
    print(
        f"\ndeep point ({DEEP_REPLICAS}x documents; per-step ratio vs "
        "the 5x point is over 4x more data):"
    )
    print("| row | t(5x) s | t(20x) s | time x (5x->20x) | data x |")
    print("|---|---|---|---|---|")
    for name in DEEP_ROWS:
        r = t4[name] / t3[name]
        print(
            f"| {name} | {t3[name]} | {t4[name]} | {r:.2f}x | "
            f"{DEEP_REPLICAS / REPLICAS:.0f}x |"
        )
    print(json.dumps({
        "canary": canary, "sf001": t1, "sf01": t2, "syn5x": t3,
        "syn20x": t4,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
