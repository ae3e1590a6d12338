"""Dump `.explain("formatted")` for named registry queries to text files.

Usage:
    python tools/dump_plans_r19.py <repo_dir> <out_dir> <suffix> <query> [...]

Runs the queries from <repo_dir>'s registry (so a pristine clone of the
previous commit produces the `_before` dumps) against sf0.1 and writes
<out_dir>/<query>_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo, out_dir, suffix, *names = sys.argv[1:]
    sys.path.insert(0, repo)
    os.makedirs(out_dir, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_HOT_CACHE", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from robi_biometric_qdrant_vector_db_service_spark.session import get_spark
    from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import (
        warm_hot_cache,
    )
    from robi_biometric_qdrant_vector_db_service_spark.workload import (
        REGISTRY,
        prepare_all,
    )

    spark = get_spark("dump_plans_r19")
    warm_hot_cache(spark, sf_dir)
    prepare_all(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = REGISTRY[name].run(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path, len(plan), "bytes")


if __name__ == "__main__":
    main()
