"""Object-store manifest posture (round-8 verdict ask #5).

The manifest layer documents a degraded mode for rename-less stores:
``_check_run_meta`` skips (no POSIX hard link), ``_commit_manifest``
commits through Spark instead of the driver-local write-then-rename,
``compact_manifest`` refuses outright, and ``run_extraction`` skips
auto-compaction — with the CLI's derived-lower-bound completeness
check picking up the slack for the never-stamped ``run_meta.json``.
None of that was ever exercised; these tests fake the store with a
``file://`` URI: every ``"://"`` branch in the library engages (the
code cannot tell it from ``s3a://``), while Hadoop's LocalFileSystem
still performs real I/O so the full commit → resume → reassemble path
runs end-to-end.  A monkeypatched guard additionally proves the
Python side performs NO ``os.rename`` / ``os.link`` against the store
— the documented posture is that the only atomic primitive used
there is Spark's committer (HDFS) or a transactional table format
(S3), never driver-local POSIX calls.
"""

from __future__ import annotations

import json
import os

import pytest

from exam_pdf_parser_spark.__main__ import _dispatch
from exam_pdf_parser_spark.operators.extract import corpus_df, extract
from exam_pdf_parser_spark.operators.extract_paged import (
    reassemble_sharded,
)
from exam_pdf_parser_spark.sources.manifest import (
    _commit_manifest, compact_manifest, completed_buckets,
    read_extracted, run_extraction,
)


class _Args:
    def __init__(self, **kw):
        self.master = None
        self.buckets = 8
        self.run_id = "t"
        self.__dict__.update(kw)


@pytest.fixture()
def store(tmp_path, monkeypatch):
    """A file:// 'object store' plus a guard failing the test on any
    Python-side rename/link against it."""
    posix = str(tmp_path / "store")
    real_rename, real_link = os.rename, os.link
    real_replace = os.replace  # r10 (r8 ADVICE #6): os.replace is the
    # third POSIX-atomicity escape hatch — guard it too, so a future
    # switch to os.replace against the store cannot silently pass

    def guarded(fn, name):
        def inner(src, dst, *a, **kw):
            assert posix not in str(src) and posix not in str(dst), (
                f"os.{name}({src!r}, {dst!r}) touched the object "
                "store — the documented posture forbids driver-local "
                "POSIX atomicity there")
            return fn(src, dst, *a, **kw)
        return inner

    monkeypatch.setattr(os, "rename", guarded(real_rename, "rename"))
    monkeypatch.setattr(os, "link", guarded(real_link, "link"))
    monkeypatch.setattr(os, "replace", guarded(real_replace, "replace"))
    return f"file://{posix}", posix


def test_objectstore_run_resume_reassemble(spark, store):
    """run_extraction → resume → read_extracted → reassemble over a
    '://' out_dir: manifest committed through Spark (one coalesced
    file per run), run_meta guard skipped, auto-compaction skipped
    even past its threshold, resume recomputes nothing, and the
    reassembled corpus is byte-identical to extract()."""
    uri, posix = store
    docs = corpus_df(spark, 12, partitions=2)

    res = run_extraction(spark, docs, uri, "os0", n_buckets=4,
                         compact_after=0)
    assert res["buckets_processed"] == 4
    assert res["compaction"] is None          # local-FS-only op skipped
    # the POSIX-atomicity surfaces never engaged
    assert not os.path.exists(os.path.join(posix, "run_meta.json"))
    # commit went through Spark: exactly ONE visible parquet file
    parts = [f for f in os.listdir(os.path.join(posix, "manifest"))
             if f.endswith(".parquet") and not f.startswith(".")]
    assert len(parts) == 1
    assert sorted(completed_buckets(spark, uri)) == [0, 1, 2, 3]

    # resume: the Spark-committed manifest is readable back through
    # the same '://' path and nothing is recomputed
    res2 = run_extraction(spark, docs, uri, "os1", n_buckets=4)
    assert res2["buckets_processed"] == 0
    assert res2["buckets_skipped"] == 4

    # full read → reassemble byte-identity, same rule as local dirs
    rx = read_extracted(spark, uri)
    back = {r["url"]: r for r in reassemble_sharded(
        rx.drop("proc_us", "bucket")).collect()}
    want = {r["url"]: r for r in extract(docs).collect()}
    assert set(back) == set(want)
    for url, w in want.items():
        assert back[url]["extracted_text"] == w["extracted_text"], url


def test_objectstore_compact_and_commit_guards(spark, store):
    """The two loud refusals: compact_manifest names the transactional
    alternative instead of attempting a rename-based rewrite, and a
    driver-only _commit_manifest (no session) cannot reach the store."""
    uri, _ = store
    with pytest.raises(ValueError, match="transactional"):
        compact_manifest(uri)
    with pytest.raises(ValueError, match="SparkSession"):
        _commit_manifest(uri, "r", [("r", 0, "done", 0, 0, 0, 0, 0, 0.0)],
                         spark=None)


def test_objectstore_reassemble_derived_lower_bound(spark, store,
                                                    tmp_path, capsys):
    """CLI reassemble over a store run dir: run_meta.json was never
    stamped ('://' skips the guard), so the derived-lower-bound
    completeness check must engage — a hole INSIDE the observed bucket
    id range is caught (exit 3), and --allow-partial proceeds with the
    unverified-completeness warning."""
    uri, _ = store
    docs = corpus_df(spark, 12, partitions=2)
    # slice run leaves bucket 1 pending inside the observed 0..2 range
    run_extraction(spark, docs, uri, "os0", n_buckets=3, buckets=[0, 2])

    whole = str(tmp_path / "whole.parquet")
    rc = _dispatch(spark, _Args(command="reassemble", input=uri,
                                output=whole))
    err = capsys.readouterr().err
    assert rc == 3 and "pending" in err

    rc = _dispatch(spark, _Args(command="reassemble", input=uri,
                                output=whole, allow_partial=True))
    out, err = capsys.readouterr()
    assert rc == 0
    assert "lower bound" in err
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["pending_buckets"] == 1
    assert 0 < summary["docs"] < 12
