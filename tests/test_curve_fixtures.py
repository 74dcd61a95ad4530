"""Scale-curve fixture integrity (VERDICT r8 #3 / ADVICE r7 #1): the
per-table _SUCCESS markers must encode the replica-id stride for
stride-bearing tables, so scratch data built under an OLD stride is
rebuilt — never silently reused — after the stride changes. The x100+
curve points SCALE.md cites rest on these fixtures being what the
current layout says they are.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import pyarrow.parquet as pq

from scale_curve import DOC_SHIFT, build


def _doc_count(d: str) -> int:
    return pq.ParquetFile(os.path.join(d, "documents.parquet")).metadata.num_rows


def test_marker_encodes_stride_and_skips_only_current_layout(tmp_path):
    d = str(tmp_path / "curve")
    build(d, 1, ("documents",))
    marker = os.path.join(d, f"_SUCCESS_documents_s{DOC_SHIFT}")
    assert os.path.exists(marker), "marker must carry the id stride"
    n1 = _doc_count(d)
    # a re-build under the same stride is a no-op (mtime unchanged)
    mtime = os.path.getmtime(os.path.join(d, "documents.parquet"))
    build(d, 1, ("documents",))
    assert os.path.getmtime(os.path.join(d, "documents.parquet")) == mtime
    assert _doc_count(d) == n1


def test_stale_strideless_marker_forces_rebuild(tmp_path):
    """Plant the failure ADVICE r7 #1 described: a dir whose documents
    were built under a different stride, vouched for by a stride-LESS
    marker (the pre-fix format). build() must NOT reuse it."""
    d = str(tmp_path / "stale")
    os.makedirs(d)
    # stale fixture: wrong content, strideless marker, legacy _SUCCESS
    with open(os.path.join(d, "documents.parquet"), "w") as f:
        f.write("stale bytes from the old stride layout")
    open(os.path.join(d, "_SUCCESS_documents"), "w").close()
    open(os.path.join(d, "_SUCCESS"), "w").close()
    build(d, 1, ("documents",))
    assert os.path.exists(os.path.join(d, f"_SUCCESS_documents_s{DOC_SHIFT}"))
    # the stale file was replaced by a real parquet of the current layout
    assert _doc_count(d) > 0


def test_old_stride_marker_forces_rebuild(tmp_path):
    """A marker carrying a DIFFERENT stride (e.g. the old 10,000) must
    not vouch for the current layout."""
    d = str(tmp_path / "oldstride")
    os.makedirs(d)
    with open(os.path.join(d, "documents.parquet"), "w") as f:
        f.write("old-stride bytes")
    open(os.path.join(d, "_SUCCESS_documents_s10000"), "w").close()
    build(d, 1, ("documents",))
    assert _doc_count(d) > 0  # rebuilt as real parquet
