"""Sort-clustered writes: verify the layout actually enables row-group
skipping (parquet min/max stats), not just that it runs — Hive's
SORTED BY / ORC row-index value proposition on plain parquet."""

import datetime

from pyspark.sql import functions as F

from hive_spark.ddl import row_groups_matching, sort_cluster
from hive_spark.operators import views


def test_clustered_layout_prunes_row_groups(spark, sf_dir, tmp_path):
    ev = views(spark, sf_dir)["events"].select("event_id", "ts", "value")

    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    sort_cluster(ev, clustered, ("ts",), n_files=8)
    ev.repartition(8).write.parquet(scattered)  # hash layout: no locality

    # one day out of the ~30-day span
    lo = datetime.datetime(2024, 1, 10)
    hi = datetime.datetime(2024, 1, 11)
    m_c, t_c = row_groups_matching(clustered, "ts", lo, hi)
    m_s, t_s = row_groups_matching(scattered, "ts", lo, hi)

    assert t_c > 0 and t_s > 0
    # scattered layout: every row group spans the full range -> none skip
    assert m_s == t_s
    # clustered layout: the day lives in a small fraction of row groups
    assert m_c * 4 <= t_c, (m_c, t_c)

    # and the clustered copy still returns the right rows
    got = (
        spark.read.parquet(clustered)
        .filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        .count()
    )
    want = ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))).count()
    assert got == want > 0


def test_clustered_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    li = views(spark, sf_dir)["lineitem"].select("l_orderkey", "l_quantity")
    path = str(tmp_path / "li")
    sort_cluster(li, path, ("l_orderkey",), n_files=6)

    import pyarrow.parquet as pq

    ds = pq.ParquetDataset(path)
    ranges = []
    for frag in ds.fragments:
        md = frag.metadata
        idx = {c: i for i, c in enumerate(frag.physical_schema.names)}["l_orderkey"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    overlaps = sum(
        1 for (a, b) in zip(ranges, ranges[1:]) if a[1] > b[0]
    )
    # range partitioner boundaries: at most tie-edge contact, no overlap
    assert overlaps == 0, ranges
