"""Scratch artifact GC: a regenerated fixture mints a new scratch tag
(catalog.scratch_tag) and the stale tag dir would otherwise leak a full
artifact set per regeneration. The cold-publish prune must remove
exactly the stale vintages of the published dataset — not tags of
untouched tables, not other datasets."""

from __future__ import annotations

import os
import shutil

from kinesis_datastore_app_spark import catalog


def _copy_fixture(tmp_path, tables=("documents", "embeddings")):
    sfd = tmp_path / "sfx"
    sfd.mkdir()
    for t in tables:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", sfd / f"{t}.parquet")
    return str(sfd)


def test_scratch_gc_prunes_stale_vintages(spark, tmp_path, monkeypatch):
    sfd = _copy_fixture(tmp_path)
    monkeypatch.setattr(catalog, "SCRATCH", str(tmp_path / "scratch"))
    build = lambda: spark.range(5).toDF("x")

    catalog.published_parquet(spark, sfd, "art_a", build, src_table="documents")
    catalog.published_parquet(spark, sfd, "art_e", build, src_table="embeddings")
    doc_tag0 = catalog.scratch_tag(sfd, "documents")
    emb_tag = catalog.scratch_tag(sfd, "embeddings")

    # a different dataset sharing the scratch root must never be touched
    other = os.path.join(catalog.SCRATCH, "otherbase-aa-bb")
    os.makedirs(other)

    # regenerate the documents fixture: same path, new mtime -> new tag
    st = os.stat(os.path.join(sfd, "documents.parquet"))
    os.utime(
        os.path.join(sfd, "documents.parquet"),
        ns=(st.st_atime_ns, st.st_mtime_ns + 7_000_000),
    )
    doc_tag1 = catalog.scratch_tag(sfd, "documents")
    assert doc_tag1 != doc_tag0

    catalog.published_parquet(spark, sfd, "art_a", build, src_table="documents")

    scratch = catalog.SCRATCH
    assert not os.path.exists(f"{scratch}/{doc_tag0}"), "stale vintage pruned"
    assert os.path.exists(f"{scratch}/{doc_tag1}/art_a"), "fresh vintage published"
    assert os.path.exists(f"{scratch}/{emb_tag}/art_e"), "untouched table survives"
    assert os.path.exists(other), "other datasets survive"

    # warm re-read: no publish happens, nothing is pruned, content served
    df = catalog.published_parquet(
        spark, sfd, "art_a", lambda: (_ for _ in ()).throw(AssertionError), "documents"
    )
    assert df.count() == 5


def test_scratch_gc_ambiguous_prefixes_survive(spark, tmp_path, monkeypatch):
    """Tag prefix matching is dash-delimited: publishing for dataset
    'sfx' must not prune a sibling dataset named 'sfx2' (nor vice
    versa) — the hazard class of probe corpora named <hash>-m1 vs
    <hash>-m16."""
    sfd = _copy_fixture(tmp_path)
    sfd2 = str(tmp_path / "sfx2")
    shutil.copytree(sfd, sfd2)
    monkeypatch.setattr(catalog, "SCRATCH", str(tmp_path / "scratch"))
    build = lambda: spark.range(3).toDF("x")

    catalog.published_parquet(spark, sfd2, "art_b", build, src_table="documents")
    tag2 = catalog.scratch_tag(sfd2, "documents")
    catalog.published_parquet(spark, sfd, "art_a", build, src_table="documents")
    assert os.path.exists(f"{catalog.SCRATCH}/{tag2}/art_b")
