"""HiveQL script runner — execute a `.q`/`.hql` file as-is.

Hive users run multi-statement scripts through CliDriver/beeline (ref:
ql/src/java/org/apache/hadoop/hive/ql/processors/CommandProcessorFactory
.java — SET/ADD/DFS/SQL dispatch; cli/src/java/org/apache/hadoop/hive/
cli/CliDriver.java:409 statement splitting). This module gives those
scripts a direct on-ramp: split statements the way CliDriver does
(semicolons outside quotes/comments), map the non-SQL command surface,
and hand everything else to `spark.sql`.

Command mapping:
- ``SET key=value``      -> spark.conf.set (Hive-only keys are accepted
                            and recorded, not errors — scripts set
                            hive.exec.* flags that have no Spark meaning)
- ``SET key``            -> echo the conf value
- txn statements         -> no-op with a warning (START TRANSACTION /
                            COMMIT / ROLLBACK; Spark has no multi-stmt
                            txn — SURVEY §2.14 documents the gap)
- ``ADD JAR/FILE``       -> recorded no-op (cluster-level concern)
- ``!shell`` / ``dfs``   -> rejected (side effects a query engine
                            should not silently run)
- everything else        -> spark.sql(stmt); SELECT results returned
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_TXN = re.compile(r"^\s*(START\s+TRANSACTION|BEGIN|COMMIT|ROLLBACK)\b", re.I)
_SET = re.compile(r"^\s*SET\s+(?!ROLE\b)([^=;\s]+)\s*(?:=\s*(.*))?$", re.I | re.S)
_ADD = re.compile(r"^\s*(ADD|DELETE)\s+(JAR|FILE|ARCHIVE)S?\b", re.I)
_SHELL = re.compile(r"^\s*(!|dfs\b)", re.I)


def split_statements(text: str) -> list[str]:
    """CliDriver-style split: ';' terminates a statement unless inside
    single/double quotes or backticks; '--' comments run to end of line."""
    out, buf = [], []
    quote: str | None = None
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if quote:
            buf.append(ch)
            if ch == quote and (quote != "'" or text[i - 1] != "\\"):
                quote = None
            i += 1
            continue
        if ch in "'\"`":
            quote = ch
            buf.append(ch)
        elif ch == "-" and text[i : i + 2] == "--":
            while i < n and text[i] != "\n":
                i += 1
            continue
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


@dataclass
class ScriptResult:
    results: list[DataFrame] = field(default_factory=list)  # SELECT outputs
    set_commands: dict[str, str] = field(default_factory=dict)
    skipped: list[str] = field(default_factory=list)  # no-op'd statements


def run_script(spark: SparkSession, text: str) -> ScriptResult:
    from hive_spark.operators import ensure_engine

    ensure_engine(spark)
    res = ScriptResult()
    for stmt in split_statements(text):
        if _SHELL.match(stmt):
            raise ValueError(
                f"shell/dfs commands are not executed by the engine: {stmt[:60]!r}"
            )
        if _TXN.match(stmt):
            res.skipped.append(stmt)
            continue
        if _ADD.match(stmt):
            res.skipped.append(stmt)
            continue
        m = _SET.match(stmt)
        if m and m.group(2) is not None:
            key, val = m.group(1), m.group(2).strip()
            res.set_commands[key] = val
            try:
                spark.conf.set(key, val)
            except Exception:
                pass  # hive-only knob: recorded above, nothing to set
            continue
        df = spark.sql(stmt)
        if df.columns:  # statements with a result shape (SELECT/SHOW/...)
            res.results.append(df)
    return res
