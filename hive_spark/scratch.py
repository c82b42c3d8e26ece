"""Durable engine scratch root.

/tmp is tmpfiles-purged on some hosts MID-RUN (observed r7: one purge
event deleted live streaming checkpoints and shuffle scratch, failing
220 queries in a single replica run). Anything with a lifetime longer
than one statement — streaming checkpoints, materialized-view parquet,
query-result caches, staged sinks — therefore defaults under the user's
home instead of /tmp. Override the root with HIVE_SPARK_SCRATCH.

(The qtest harness's literal `/tmp/hive_spark_qtest_tmp` paths are NOT
routed through here: reference scripts name /tmp paths verbatim and
each script rebuilds its inputs, so a purge between scripts is
harmless there.)
"""

from __future__ import annotations

import os


def scratch_dir(*parts: str) -> str:
    root = os.environ.get(
        "HIVE_SPARK_SCRATCH",
        os.path.join(os.path.expanduser("~"), ".hive_spark_scratch", "engine"),
    )
    d = os.path.join(root, *parts)
    os.makedirs(d, exist_ok=True)
    return d
