"""Golden VALUE verification for qtest scripts: run a clientpositive .q
through the engine and compare every SELECT's rows against the
reference's own .q.out golden file (order-insensitive, NULL-normalized,
booleans lowercased to Hive's rendering).

The corpus manifest asserts final-statement ROWCOUNTS (regression
pinning); this tool checks VALUES — used in r8 to verify the quantifier
desugars (subquery_ALL/ANY: 46/46) and the string-RANGE peer-group
frames (windowing.q: 47/51; the 4 diffs are last-ULP float accumulation
and array-rendering artifacts, printed for inspection).

Usage: python scripts/qtest_golden_verify.py windowing.q [more.q ...]
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QDIR = "/root/reference/ql/src/test/queries/clientpositive"
GDIR = "/root/reference/ql/src/test/results/clientpositive"
DB = os.environ.get("QGOLD_DB", "qgold")
SCRATCH = os.path.expanduser(f"~/.hive_spark_scratch/{DB}")


def _norm_q(q: str) -> str:
    return re.sub(r"\s+", " ", q).strip().lower()


def _norm_val(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def golden_blocks(path: str) -> dict[str, list[str]]:
    text = open(path).read()
    out: dict[str, list[str]] = {}
    for gq, gres in re.findall(
        r"POSTHOOK: query: (select[\s\S]*?)\nPOSTHOOK: type:"
        r"[\s\S]*?####[^\n]*\n([\s\S]*?)(?=PREHOOK|Warning|\Z)",
        text,
    ):
        out[_norm_q(gq)] = sorted(
            l for l in gres.strip().splitlines()
            if l and not l.startswith("Warning")
        )
    return out


def main() -> int:
    from hive_spark import hqlscript as H
    from hive_spark.session import get_session
    from tests.qtest_fixture_lib import build_qtest_fixtures

    shutil.rmtree(f"{SCRATCH}_wh", ignore_errors=True)
    spark = get_session(
        app_name="qtest_golden_verify",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": f"{SCRATCH}_wh"},
    )
    build_qtest_fixtures(spark, DB, SCRATCH)
    total_bad = 0
    for name in sys.argv[1:]:
        gfiles = glob.glob(f"{GDIR}/**/{name}.out", recursive=True)
        if not gfiles:
            print(f"{name}: no golden file")
            continue
        blocks = golden_blocks(gfiles[0])
        ok = bad = nogold = 0
        for st in H.split_statements(open(os.path.join(QDIR, name)).read()):
            s = st.strip()
            if not s or s.startswith("--"):
                continue
            body = "\n".join(
                l for l in s.splitlines() if not l.strip().startswith("--")
            )
            try:
                res = H.run_script(spark, body + ";")
            except Exception as e:
                print(f"  STMT FAIL: {body[:70]!r}: {str(e)[:90]}")
                continue
            if not _norm_q(body).startswith("select") or not res.results:
                continue
            gv = blocks.get(_norm_q(body))
            if gv is None:
                nogold += 1
                continue
            rows = res.results[-1].collect()
            ours = sorted(
                "\t".join(_norm_val(v) for v in row) for row in rows
            )
            if ours == gv:
                ok += 1
            else:
                bad += 1
                diff = next(
                    (
                        (a, b)
                        for a, b in zip(ours, gv)
                        if a != b
                    ),
                    (f"<{len(ours)} rows>", f"<{len(gv)} rows>"),
                )
                print(f"  MISMATCH: {body[:80]!r}")
                print(f"    ours: {diff[0][:160]}")
                print(f"    gold: {diff[1][:160]}")
        print(f"{name}: {ok} value-match, {bad} mismatch, {nogold} no-golden")
        total_bad += bad
    return 1 if total_bad else 0


if __name__ == "__main__":
    sys.exit(main())
