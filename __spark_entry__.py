"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship parse→enrich→route→aggregate pipeline on the
                  deterministic synthetic token table (BASELINE.json
                  input_hint shape), returning the per-sink aggregates.
queries()       — one entry per implemented operator (SURVEY.md §2 +
                  training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()    — matching DuckDB SQL for every SQL-expressible query.

All real logic lives in the pastash_spark package; this module is the thin
contract layer.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from pastash_spark import datagen  # noqa: E402
from pastash_spark.plans import flagship  # noqa: E402
from pastash_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline; driver checks rows>0 and a stable schema.

    Input is the deterministic synthetic token table (seed=42) — the
    BASELINE.json input_hint shape — generated distributed, never collected.
    """
    df = datagen.token_sequences(spark, 5_000)
    out = flagship.run(spark, df)
    return out["aggregates"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
