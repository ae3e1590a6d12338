"""Local replica of the driver's t2 correctness pass: run every registry
query at sf0.01 against its DuckDB oracle, print per-query timing + status.

Usage: python tools/run_correctness.py [names ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from robi_biometric_qdrant_vector_db_service_spark.workload import REGISTRY  # noqa: E402
from tests.parity import check  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    names = sys.argv[1:] or list(REGISTRY)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("correctness-local")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    t_all = time.time()
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            if spec.oracle is None:
                n = spec.run(spark, SF_DIR).count()
                status = f"rows_only n={n}"
                ok = True
            else:
                errs = check(spark, name, spec, SF_DIR)
                ok = not errs
                status = "ok" if ok else "; ".join(errs)[:300]
        except Exception as e:  # noqa: BLE001
            ok = False
            status = f"EXC {type(e).__name__}: {e}"[:300]
        dt = time.time() - t0
        results[name] = {"ok": ok, "sec": round(dt, 2), "status": status}
        print(f"{'PASS' if ok else 'FAIL':4} {dt:7.2f}s  {name}: {status}", flush=True)
    print(f"TOTAL {time.time() - t_all:.1f}s")
    bad = {k: v for k, v in results.items() if not v["ok"]}
    print(json.dumps({"n": len(results), "fail": list(bad)}, indent=0))


if __name__ == "__main__":
    main()
