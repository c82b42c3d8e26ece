"""Scheduled queries: metadata-persisted, cron-matched, engine-executed.

Hive stores scheduled queries in the metastore and a poller executes the
due ones (ref: ql/src/java/org/apache/hadoop/hive/ql/scheduled/
ScheduledQueryExecutionService.java — polling loop;
ql/.../ddl/workloadmanagement + parser grammar `CREATE SCHEDULED QUERY
<name> CRON '<quartz expr>' AS <query>`; ScheduledQueryMaintenanceTask).
SURVEY §2.15 listed this as a non-goal; the surface is small enough to
cover for real:

- `ScheduledQueryRegistry` persists each query as JSON under
  `<spark.sql.warehouse.dir>/_scheduled_queries/` (the metastore-table
  analog; a new Engine instance sees existing schedules).
- Cron matching supports the standard 5 fields (min hour dom mon dow)
  with `*`, `*/n`, ranges, and lists; Hive's Quartz 6/7-field
  expressions are accepted by dropping the seconds (and year) fields
  and mapping `?` to `*`.
- There is deliberately NO daemon thread: `run_due(now)` executes every
  enabled schedule whose cron matches `now` and whose minute hasn't run
  yet, through `hqlscript.run_script` (so HiveQL rewrites, macros, and
  time travel apply inside scheduled statements — same as Hive routing
  scheduled text through the Driver). Callers own the tick cadence
  (cron, Airflow, a notebook loop), which is the honest boundary for a
  library engine: Hive's poller is a service-lifecycle concern, the
  query semantics are what this engine reproduces.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import asdict, dataclass
from datetime import datetime

from pyspark.sql import SparkSession


@dataclass
class ScheduledQuery:
    name: str
    cron: str  # normalized 5-field
    sql: str
    enabled: bool = True
    last_run: str | None = None  # ISO minute of the last execution


_DOW_NAMES = {
    "SUN": 0, "MON": 1, "TUE": 2, "WED": 3, "THU": 4, "FRI": 5, "SAT": 6
}


def _remap_dow(field: str, quartz: bool) -> str:
    """Normalize a day-of-week field to cron 0=SUN..6=SAT. Quartz uses
    1=SUN..7=SAT, so numeric Quartz values shift by (v-1) mod 7; standard
    cron's `7` is a Sunday alias for `0`. Names (SUN..SAT) map directly.
    Step divisors (after `/`) are left untouched."""

    def one(num: str) -> str:
        v = int(num)
        return str((v - 1) % 7 if quartz else v % 7)

    def tok(part: str) -> str:
        part, slash, step = part.partition("/")
        if part in ("*", "?"):
            return part + slash + step
        ends = part.split("-")
        ends = [
            one(e) if e.isdigit() else str(_DOW_NAMES.get(e.upper(), e))
            for e in ends
        ]
        return "-".join(ends) + slash + step

    return ",".join(tok(p) for p in field.split(","))


def normalize_cron(expr: str) -> str:
    """Accept 5-field standard or 6/7-field Quartz (sec min hour dom mon
    dow [year]); return the standard 5 fields. Quartz `?` becomes `*`,
    and Quartz's 1=SUN..7=SAT day-of-week numbering is remapped to cron's
    0=SUN..6=SAT (ref: Hive schedules are Quartz expressions —
    ql/.../parse/ScheduledQueryAnalyzer.java)."""
    fields = expr.split()
    quartz = len(fields) in (6, 7)
    if len(fields) == 7:
        fields = fields[1:6]  # drop seconds + year
    elif len(fields) == 6:
        fields = fields[1:]  # drop seconds
    if len(fields) != 5:
        raise ValueError(f"cron needs 5 (or Quartz 6/7) fields: {expr!r}")
    fields[4] = _remap_dow(fields[4], quartz)
    return " ".join("*" if f == "?" else f for f in fields)


def _field_matches(field: str, value: int, lo: int, hi: int) -> bool:
    for part in field.split(","):
        if part == "*":
            return True
        m = re.fullmatch(r"\*/(\d+)", part)
        if m:
            if (value - lo) % int(m.group(1)) == 0:
                return True
            continue
        m = re.fullmatch(r"(\d+)-(\d+)(?:/(\d+))?", part)
        if m:
            a, b, step = int(m.group(1)), int(m.group(2)), int(m.group(3) or 1)
            if a <= value <= b and (value - a) % step == 0:
                return True
            continue
        if part.isdigit() and int(part) == value:
            return True
    return False


def cron_matches(cron: str, ts: datetime) -> bool:
    mi, h, dom, mon, dow = cron.split()
    return (
        _field_matches(mi, ts.minute, 0, 59)
        and _field_matches(h, ts.hour, 0, 23)
        and _field_matches(dom, ts.day, 1, 31)
        and _field_matches(mon, ts.month, 1, 12)
        # cron dow: 0/7 = Sunday; Python: Monday = 0
        and _field_matches(dow, (ts.weekday() + 1) % 7, 0, 6)
    )


class ScheduledQueryRegistry:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        self.root = os.path.join(wh, "_scheduled_queries")
        os.makedirs(self.root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name.lower()}.json")

    def create(
        self, name: str, cron: str, sql: str, replace: bool = False
    ) -> ScheduledQuery:
        if os.path.exists(self._path(name)) and not replace:
            raise ValueError(f"scheduled query {name!r} already exists")
        sq = ScheduledQuery(name.lower(), normalize_cron(cron), sql)
        self._save(sq)
        return sq

    def _save(self, sq: ScheduledQuery) -> None:
        with open(self._path(sq.name), "w") as f:
            json.dump(asdict(sq), f)

    def get(self, name: str) -> ScheduledQuery | None:
        try:
            with open(self._path(name)) as f:
                return ScheduledQuery(**json.load(f))
        except FileNotFoundError:
            return None

    def list(self) -> list[ScheduledQuery]:
        out = []
        for fn in sorted(os.listdir(self.root)):
            if fn.endswith(".json"):
                with open(os.path.join(self.root, fn)) as f:
                    out.append(ScheduledQuery(**json.load(f)))
        return out

    def set_enabled(self, name: str, enabled: bool) -> None:
        sq = self.get(name)
        if sq is None:
            raise ValueError(f"no scheduled query {name!r}")
        sq.enabled = enabled
        self._save(sq)

    def drop(self, name: str) -> None:
        try:
            os.remove(self._path(name))
        except FileNotFoundError:
            pass

    def execute(self, name: str, now: datetime | None = None):
        """Run one schedule immediately (ALTER ... EXECUTE analog)."""
        from hive_spark.hqlscript import run_script

        sq = self.get(name)
        if sq is None:
            raise ValueError(f"no scheduled query {name!r}")
        out = run_script(self.spark, sq.sql if sq.sql.rstrip().endswith(";")
                         else sq.sql + ";")
        sq.last_run = (now or datetime.now()).strftime("%Y-%m-%dT%H:%M")
        self._save(sq)
        return out

    def due(self, now: datetime) -> list[ScheduledQuery]:
        minute = now.strftime("%Y-%m-%dT%H:%M")
        return [
            sq
            for sq in self.list()
            if sq.enabled
            and sq.last_run != minute  # at-most-once per matched minute
            and cron_matches(sq.cron, now)
        ]

    def run_due(self, now: datetime | None = None) -> list[str]:
        """One poller tick (ScheduledQueryExecutionService loop body):
        execute everything due at `now`; returns the executed names."""
        now = now or datetime.now()
        ran = []
        for sq in self.due(now):
            self.execute(sq.name, now=now)
            ran.append(sq.name)
        return ran
