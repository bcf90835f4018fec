"""Profile the driver-side plan-build phase of one registry row:
cProfile the REGISTRY call (no collect), print the top cumulative
functions — separates py4j round-trips from internal Spark actions.
Usage: python scripts/prof_build.py <row>
"""
import cProfile
import io
import os
import pstats
import sys
import time


def main():
    from flechasdb_spark.queries import REGISTRY
    from flechasdb_spark.session import get_spark

    name = sys.argv[1]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="prof_build")
    spark.read.parquet(f"{sf}/embeddings.parquet").count()
    fn = REGISTRY[name]
    fn(spark, sf).collect()  # warm-up fully
    t0 = time.perf_counter()
    pr = cProfile.Profile()
    pr.enable()
    df = fn(spark, sf)
    pr.disable()
    t1 = time.perf_counter()
    print(f"build_s={t1 - t0:.3f}")
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(25)
    print(s.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
