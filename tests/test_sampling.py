"""Temperature sampling — rebalancing direction, determinism, and the
driver-row oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from flechasdb_spark.operators.sampling import temperature_sample
from flechasdb_spark.queries import ORACLES, REGISTRY
from tests.oracle_harness import compare, duck_con


def test_temperature_sample_matches_oracle(spark, sf_dir):
    con = duck_con(sf_dir)
    sdf = REGISTRY["temperature_sample"](spark, sf_dir)
    odf = con.execute(ORACLES["temperature_sample"]).df()
    assert compare(sdf, odf) == []


def test_temperature_flattens_skewed_mixture(spark):
    """With a 900/100 mixture, alpha=0.5 gives the small group a larger
    share than its 10% proportional share; alpha=1 stays proportional."""
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def share(alpha):
        got = temperature_sample(df, total=100, alpha=alpha).collect()
        small = sum(1 for r in got if r.source == "small")
        return small, len(got)

    small_flat, n_flat = share(0.5)
    small_prop, n_prop = share(1.0)
    assert small_prop <= 11  # ~10 of 100
    assert small_flat > small_prop  # upsampled by temperature
    assert abs(n_flat - 100) <= 2 and abs(n_prop - 100) <= 2

    a = sorted(map(tuple, temperature_sample(df, total=100).collect()))
    b = sorted(map(tuple, temperature_sample(df, total=100).collect()))
    assert a == b  # deterministic across runs
