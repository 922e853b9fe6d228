"""Dump .explain("formatted") for named queries to plans/<outdir>/.

Usage: python scripts/dump_plans.py <outdir-suffix> q36_... q39_...
Writes <repo>/plans/r06/<qname>_<outdir-suffix>.txt
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
OUT = Path(os.environ.get("PLANS_OUT", str(REPO / "plans" / "r06")))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from ocr_inference_spark.queries import QUERIES
    from ocr_inference_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", master="local[8]")
    OUT.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (OUT / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
