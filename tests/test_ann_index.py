"""Persisted ANN index lifecycle (llm/ann_index.py, VERDICT r12 #2):
build-once reuse, frozen-codebook append, atomic publish."""

import json
import os

import pytest
from pyspark.sql import functions as F

from benchmark_spark.llm import ann_index as ai

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from benchmark_spark.session import get_spark

    s = get_spark("tests-ann-index", shuffle_partitions=4,
                  extra_conf={"spark.locality.wait": "0s"})
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_build_is_reused_not_retrained(spark):
    """build-once/probe-many: a second build_index call with the
    artifact present returns WITHOUT retraining — the manifest file's
    mtime (and the whole artifact) is untouched."""
    path, meta = ai.build_index(spark, SF, force=True)
    mt = os.path.getmtime(ai._manifest_path(path))
    path2, meta2 = ai.build_index(spark, SF)
    assert path2 == path and meta2 == meta
    assert os.path.getmtime(ai._manifest_path(path)) == mt


def test_manifest_params_match_sizing_rule(spark):
    path, meta = ai.build_index(spark, SF)
    n = meta["n"]
    from benchmark_spark.llm.similarity import _ivfpq_params

    assert (meta["nlist"], meta["nprobe"], meta["train"]) == _ivfpq_params(n)
    # postings cover the corpus exactly once
    post = ai.read_postings(spark, path)
    assert post.count() == n
    assert post.select("vec_id").distinct().count() == n


def test_probe_plan_prunes_to_probed_lists(spark):
    """The artifact layout realizes the nprobe/nlist scan bound as
    partition pruning: every lid is a parquet partition directory."""
    path, meta = ai.build_index(spark, SF)
    lids = [
        d for d in os.listdir(os.path.join(path, "postings"))
        if d.startswith("lid=")
    ]
    assert len(lids) <= meta["nlist"]
    assert len(lids) >= 2  # non-degenerate clustering


def test_append_freezes_codebooks_and_base_postings(spark):
    """Incremental append never rewrites the base: coarse/pq parquet
    and the base postings segment are byte-identical before and after,
    and the delta segment holds exactly the appended vectors encoded
    against those frozen codebooks."""
    n_all = ai._vecs(spark, SF).count()
    base_n = (ai._BASE_NUM * n_all) // ai._BASE_DEN
    path, meta = ai.build_index(spark, SF, base_n=base_n, force=True)

    def _sig(sub):
        root = os.path.join(path, sub)
        return sorted(
            (os.path.relpath(os.path.join(dp, f), root),
             os.path.getmtime(os.path.join(dp, f)),
             os.path.getsize(os.path.join(dp, f)))
            for dp, _dn, fns in os.walk(root) for f in fns
        )

    before = {s: _sig(s) for s in ("coarse", "pq", "postings")}
    path, meta = ai.append_to_index(spark, SF, path, meta)
    assert {s: _sig(s) for s in ("coarse", "pq", "postings")} == before
    delta = ai.read_postings(spark, path, with_delta=True).filter(
        F.col("vec_id") >= base_n
    )
    assert delta.count() == n_all - base_n
    # idempotent: a second append reuses the segment
    mt = os.path.getmtime(ai._manifest_path(path))
    path2, meta2 = ai.append_to_index(spark, SF, path, meta)
    assert meta2.get("appended") and os.path.getmtime(ai._manifest_path(path)) == mt


def test_append_probe_retrieves_appended_vectors(spark):
    """The merged probe actually serves appended vectors: the fixture's
    top-10s include at least one neighbor with vec_id >= base_n, and
    from_append flags exactly those rows."""
    from benchmark_spark.llm.ann_index import q_ann_index_append

    rows = q_ann_index_append(spark, SF).collect()
    n_all = ai._vecs(spark, SF).count()
    base_n = (ai._BASE_NUM * n_all) // ai._BASE_DEN
    assert len(rows) == 50
    assert all(bool(r.from_append) == (r.neighbor_id >= base_n) for r in rows)
    assert any(r.from_append for r in rows)


def test_atomic_publish_leaves_no_tmp_dirs(spark):
    ai.build_index(spark, SF, force=True)
    leftovers = [d for d in os.listdir(ai._ROOT) if d.startswith("tmp-")]
    assert leftovers == []


def test_corrupt_manifest_triggers_rebuild(spark):
    path, _ = ai.build_index(spark, SF)
    with open(ai._manifest_path(path), "w") as f:
        f.write("{not json")
    path2, meta2 = ai.build_index(spark, SF)
    assert path2 == path
    assert json.load(open(ai._manifest_path(path)))["nlist"] == meta2["nlist"]


def test_index_key_tracks_fixture_content(spark, tmp_path):
    """ADVICE r13: the cache key folds a content fingerprint of the
    embeddings fixture — a regenerated fixture (same row count, new
    bytes/mtime) gets a NEW key instead of silently reusing a stale
    index artifact."""
    import shutil as sh

    d = tmp_path / "sfX"
    d.mkdir()
    sh.copy(os.path.join(SF, "embeddings.parquet"),
            d / "embeddings.parquet")
    k1 = ai._index_key(str(d), 100, None)
    os.utime(d / "embeddings.parquet", ns=(1, 1))  # simulate a re-gen
    k2 = ai._index_key(str(d), 100, None)
    assert k1 != k2
    # and the key stays stable when nothing changed
    assert ai._index_key(str(d), 100, None) == k2


def test_publish_replace_renames_old_aside(spark, tmp_path):
    """ADVICE r13: replacing an existing index never deletes in place —
    the old generation is renamed aside first, and no .old-/tmp-
    residue survives the publish."""
    old = tmp_path / "idx"
    old.mkdir()
    (old / "manifest.json").write_text("{}")
    new = tmp_path / "tmp-new"
    new.mkdir()
    (new / "manifest.json").write_text('{"fresh": true}')
    ai._publish(str(new), str(old))
    assert json.load(open(old / "manifest.json")) == {"fresh": True}
    assert [p.name for p in tmp_path.iterdir()] == ["idx"]


def test_stream_ingest_replay_is_idempotent(spark):
    """VERDICT r13 #6: a replayed batch_id (foreachBatch retry /
    checkpoint replay) is detected in the ledger and skipped — the
    segment set, ledger, and served results are unchanged; and the
    streamed index serves row-identical results to the batch append."""
    n_all = ai._corpus_rows(SF)
    base_n = (ai._BASE_NUM * n_all) // ai._BASE_DEN
    path, meta = ai.build_index(spark, SF, base_n=base_n)
    from benchmark_spark.registry import all_specs

    specs = all_specs()
    streamed = sorted(specs["q_ann_stream_ingest"].fn(spark, SF).collect())
    spath = f"{path}-stream"  # the query ingests into its own clone
    assert ai.stream_ledger(path) == []  # shared artifact stays ledger-free
    ledger = ai.stream_ledger(spath)
    assert len(ledger) >= 2  # genuinely multi-batch
    segs = ai.stream_segments(spath)
    # the streamed segments cover the tail exactly once
    tail = ai.read_postings(spark, spath, extra_segments=segs).filter(
        F.col("vec_id") >= base_n
    )
    assert tail.count() == n_all - base_n
    assert tail.select("vec_id").distinct().count() == n_all - base_n

    def _sig():
        return sorted(
            (os.path.relpath(os.path.join(dp, f), path),
             os.path.getmtime(os.path.join(dp, f)))
            for s in segs
            for dp, _dn, fns in os.walk(s) for f in fns
        )

    before = _sig()
    # replay EVERY batch id: all must be skipped, nothing rewritten
    tail_df = ai._vecs(spark, SF).filter(F.col("vec_id") >= base_n).select(
        "vec_id", F.col("v").cast("array<float>").alias("embedding")
    )
    for e in ledger:
        assert ai.stream_append_segment(spark, spath, tail_df, e["batch_id"]) is False
    assert ai.stream_ledger(spath) == ledger
    assert _sig() == before
    # convergence: hash-equal to the batch append (same oracle upstream)
    path2, meta2 = ai.append_to_index(spark, SF, path, meta)
    batch = sorted(
        ai._probe_plan(spark, SF, path2, meta2, with_delta=True,
                       flag_append=True).collect()
    )
    assert streamed == batch


def test_stream_ingest_empty_batch_is_recorded_not_written(spark):
    """An empty micro-batch must be ledger-recorded for idempotence but
    write NO segment — a zero-row partitioned parquet write leaves a
    schema-less directory that would break every later segment read."""
    n_all = ai._corpus_rows(SF)
    base_n = (ai._BASE_NUM * n_all) // ai._BASE_DEN
    path, meta = ai.build_index(spark, SF, base_n=base_n)
    # work on a clone so the shared base artifact stays ledger-free
    cpath = ai._clone_index(path, "-emptybatch")
    empty = ai._vecs(spark, SF).filter(F.col("vec_id") < 0).select(
        "vec_id", F.col("v").cast("array<float>").alias("embedding")
    )
    before = ai.stream_segments(cpath)
    assert ai.stream_append_segment(spark, cpath, empty, 99_999) is False
    ledger = ai.stream_ledger(cpath)
    assert {"batch_id": 99_999, "segment": None} in ledger
    assert ai.stream_segments(cpath) == before  # no unreadable dir added
    # replay of the empty batch is also skipped without re-recording
    assert ai.stream_append_segment(spark, cpath, empty, 99_999) is False
    assert ai.stream_ledger(cpath) == ledger
    # postings over the recorded segments still read fine
    ai.read_postings(spark, cpath, extra_segments=ai.stream_segments(cpath)).count()


def test_delete_is_merge_on_read_then_physical_at_compact(spark):
    """Round 14: deletes land as tombstones (no postings rewrite), a
    replayed delete batch is skipped, probes stop serving deleted
    vectors immediately, and compaction makes the removal physical —
    the compacted generation has no tombstones yet probes identically."""
    import shutil as sh

    path, meta = ai.build_index(spark, SF)
    dpath = f"{path}-mor2"
    sh.rmtree(dpath, ignore_errors=True)
    sh.copytree(path, dpath)

    def _postings_sig(root):
        pdir = os.path.join(root, "postings")
        return sorted(
            (os.path.relpath(os.path.join(dp, f), pdir),
             os.path.getmtime(os.path.join(dp, f)))
            for dp, _dn, fns in os.walk(pdir) for f in fns
        )

    before = _postings_sig(dpath)
    keys = ai._vecs(spark, SF).filter(F.col("vec_id") % 9 == 2).select("vec_id")
    assert ai.delete_from_index(spark, dpath, keys) is True
    # merge-on-read: no postings byte moved, replay skipped
    assert _postings_sig(dpath) == before
    assert ai.delete_from_index(spark, dpath, keys) is False
    # probes stop serving deleted vectors immediately
    mor = ai._probe_plan(spark, SF, dpath, meta)
    rows = mor.collect()
    assert rows and all(r.neighbor_id % 9 != 2 for r in rows)
    # baseline probe (no tombstones) DID serve some now-deleted ids,
    # so the filter above is load-bearing, not vacuous
    base_rows = ai._probe_plan(spark, SF, path, meta).collect()
    assert any(r.neighbor_id % 9 == 2 for r in base_rows)
    # compaction folds the tombstones out physically
    cpath, _cmeta = ai.compact_index(spark, dpath, meta)
    assert not os.path.exists(os.path.join(cpath, "tombstones"))
    deleted = {r.vec_id for r in keys.collect()}
    post = ai.read_postings(spark, cpath)
    assert post.filter(F.col("vec_id").isin(list(deleted))).count() == 0
    n = ai._corpus_rows(SF)
    assert post.count() == n - len(deleted)
    # the SERVED payload (anchor, neighbor, rank, score) is identical;
    # in_exact10 is a diagnostic against the fixture corpus, and the
    # compacted generation has physically forgotten the delete set, so
    # its diagnostic baseline is the full fixture again — compare the
    # serving columns, which is the lossless-fold claim
    served = lambda rs: sorted(  # noqa: E731
        (r.a_id, r.neighbor_id, r.rank, r.score) for r in rs
    )
    compacted = ai._probe_plan(spark, SF, cpath, meta).collect()
    assert served(compacted) == served(rows)


def test_compact_folds_stream_segments_and_detects_stale_generation(spark):
    """Code-review round 14: compaction folds ALL visible parts of its
    source (stream segments included, not just the append delta), and
    a generation is reused only while the source signature matches —
    tombstones added after a compaction force a fresh fold instead of
    silently serving the stale generation."""
    import shutil as sh

    n_all = ai._corpus_rows(SF)
    base_n = (ai._BASE_NUM * n_all) // ai._BASE_DEN
    path, _meta = ai.build_index(spark, SF, base_n=base_n)
    # self-cleaning: this test MUTATES its clone (post-compact delete),
    # so a rerun must start from a fresh clone, not last run's state
    sh.rmtree(f"{path}-cmpstream", ignore_errors=True)
    sh.rmtree(f"{path}-cmpstream-compact", ignore_errors=True)
    spath = ai._clone_index(path, "-cmpstream")
    meta = ai.load_manifest(spath)
    mid = base_n + (n_all - base_n) // 2
    tail = ai._vecs(spark, SF).filter(F.col("vec_id") >= base_n).select(
        "vec_id", F.col("v").cast("array<float>").alias("embedding")
    )
    ai.stream_append_segment(spark, spath, tail.filter(F.col("vec_id") < mid), 0)
    ai.stream_append_segment(spark, spath, tail.filter(F.col("vec_id") >= mid), 1)
    merged = sorted(
        ai._probe_plan(spark, SF, spath, meta,
                       extra_segments=ai.stream_segments(spath)).collect()
    )
    cpath, cmeta = ai.compact_index(spark, spath, meta)
    post = ai.read_postings(spark, cpath)
    assert post.count() == n_all  # stream segments folded, not dropped
    assert cmeta["n"] == n_all
    assert sorted(ai._probe_plan(spark, SF, cpath, cmeta).collect()) == merged
    # reuse while the source is unchanged...
    cpath2, cmeta2 = ai.compact_index(spark, spath, meta)
    assert (cpath2, cmeta2) == (cpath, cmeta)
    # ...but tombstones added AFTER the fold invalidate the generation
    keys = ai._vecs(spark, SF).filter(F.col("vec_id") % 13 == 1).select("vec_id")
    ai.delete_from_index(spark, spath, keys)
    cpath3, cmeta3 = ai.compact_index(spark, spath, ai.load_manifest(spath))
    assert cpath3 == cpath  # same generation dir, freshly re-published
    n_dead = keys.count()
    post3 = ai.read_postings(spark, cpath3)
    assert post3.filter(F.col("vec_id") % 13 == 1).count() == 0
    assert post3.count() == n_all - n_dead
    assert cmeta3["n"] == n_all - n_dead  # manifest counts LIVE rows


def test_compact_is_lossless_and_immutable(spark):
    """VERDICT r13 #2: compaction folds base+delta into a NEW
    generation whose single-segment probe returns row-identical
    results to the base+delta probe, without touching the source
    artifact; a second compact call reuses the generation."""
    n_all = ai._vecs(spark, SF).count()
    base_n = (ai._BASE_NUM * n_all) // ai._BASE_DEN
    path, meta = ai.build_index(spark, SF, base_n=base_n)
    path, meta = ai.append_to_index(spark, SF, path, meta)

    def _sig(root):
        return sorted(
            (os.path.relpath(os.path.join(dp, f), root),
             os.path.getmtime(os.path.join(dp, f)),
             os.path.getsize(os.path.join(dp, f)))
            for dp, _dn, fns in os.walk(root) for f in fns
        )

    before = _sig(path)
    cpath, cmeta = ai.compact_index(spark, path, meta)
    assert cpath != path and _sig(path) == before
    assert not cmeta["appended"] and cmeta["compacted_from"] == os.path.basename(path)
    # single postings segment, covering base + delta exactly once
    assert not os.path.exists(os.path.join(cpath, "postings_delta"))
    post = ai.read_postings(spark, cpath)
    assert post.count() == n_all
    assert post.select("vec_id").distinct().count() == n_all
    # served results are row-identical to the base+delta probe
    merged = sorted(
        ai._probe_plan(spark, SF, path, meta, with_delta=True,
                       flag_append=True).collect()
    )
    compacted = sorted(
        ai._probe_plan(spark, SF, cpath, cmeta, with_delta=False,
                       flag_append=True).collect()
    )
    assert compacted == merged
    # idempotent reuse
    mt = os.path.getmtime(ai._manifest_path(cpath))
    cpath2, _ = ai.compact_index(spark, path, meta)
    assert cpath2 == cpath
    assert os.path.getmtime(ai._manifest_path(cpath)) == mt
