"""Dump .explain("formatted") for every bench query (HEADLINE +
TPCDS_EXTRA) to plans/<tag>/<query>_<suffix>.txt — the before/after
evidence for optimization rounds.

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
e.g.   python scripts/capture_plans.py r09 before
       python scripts/capture_plans.py r09 after tpch_q9 events_session
"""
import contextlib
import io
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from bench import HEADLINE, TPCDS_EXTRA  # noqa: E402
from hive_spark import get_session  # noqa: E402
from hive_spark.operators import full_registry  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or list(HEADLINE) + list(TPCDS_EXTRA)
    out_dir = os.path.join(_REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(
        app_name="capture_plans", master="local[8]", shuffle_partitions=8
    )
    reg = full_registry()
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            reg[name].fn(spark, SF).explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {SF} ({suffix})\n")
            f.write(buf.getvalue())
        print(path)


if __name__ == "__main__":
    main()
