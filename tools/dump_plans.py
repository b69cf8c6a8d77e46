"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX q1 q2 ...
Writes OUTDIR/<query>_<SUFFIX>.txt for each query (guide §1: the judge
checks plan claims against these captures).
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

from incubator_flink_spark import get_spark
from incubator_flink_spark.queries import REGISTRY


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name)


if __name__ == "__main__":
    main()
