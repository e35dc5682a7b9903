"""write_range_sorted must produce files whose parquet footer min/max
ranges are (nearly) disjoint on the sort column — that is the physical
property row-group skipping depends on, checked directly in the footers
rather than inferred from timings."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from flashml_spark.sources.savepoint import write_range_sorted
from flashml_spark.sources.readers import load_table
from tests.conftest import SF_DIR


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    return ranges


def test_range_sorted_files_have_disjoint_stats(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    path = str(tmp_path / "sorted")
    write_range_sorted(docs, path, "n_chars", n_files=8)

    ranges = sorted(_file_ranges(path, "n_chars"))
    assert len(ranges) >= 4
    # consecutive files overlap at most at their shared boundary value
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2 + 1, (ranges,)

    # content unchanged
    back = spark.read.parquet(path)
    assert back.count() == docs.count()

    # and the default (unsorted) layout does NOT have this property —
    # the test would pass vacuously otherwise
    base = str(tmp_path / "plain")
    docs.repartition(8).write.parquet(base)
    plain = sorted(_file_ranges(base, "n_chars"))
    overlaps = sum(1 for (l1, h1), (l2, h2) in zip(plain, plain[1:]) if h1 > l2 + 1)
    assert overlaps > 0
