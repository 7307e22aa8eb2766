"""Dump the formatted physical plan of named queries to files.

Usage: python tools/dump_plan_one.py <out_dir> <suffix> query [query ...]

Writes <out_dir>/<query>_<suffix>.txt with `.explain("formatted")`
output at sf0.1 — the before/after plan evidence for optimization
rounds (plans/r{N}/<query>_before.txt / _after.txt).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark import (  # noqa: E402
    get_spark,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (  # noqa: E402
    REGISTRY,
)


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump-one")
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
