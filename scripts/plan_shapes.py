"""Regenerate the SCALE.md plan-shape table: explain("formatted") each
bench headline query and count the plan features that matter at scale."""
import contextlib
import io
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from bench import HEADLINE  # noqa: E402
from hive_spark import get_session  # noqa: E402
from hive_spark.operators import full_registry  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_session(app_name="plan_shapes", master="local[8]", shuffle_partitions=8)
    reg = full_registry()
    names = list(HEADLINE) + sorted(
        n for n in reg if n.startswith("tpcds_")
    )
    out = {}
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            reg[name].fn(spark, SF).explain("formatted")
        p = buf.getvalue()
        out[name] = {
            "exchanges": len(re.findall(r"\(\d+\) Exchange", p)),
            "broadcasts": len(re.findall(r"\(\d+\) BroadcastExchange", p)),
            "python_stages": len(
                re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|BatchEvalPython", p)
            ),
            "pushed_filters": bool(re.search(r"PushedFilters: \[[A-Za-z*]", p)),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
