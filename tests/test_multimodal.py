"""Multimodal plumbing tests: schema, batch shapes, null/corrupt rows,
deterministic fake kernels, and stubbed real backends (FIXTURES.md has
no binary tables, so media rows are synthesized from document text)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_vector_indexer_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media_df(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    rows = [
        (
            r.doc_id,
            "image" if r.doc_id % 3 == 0 else ("video" if r.doc_id % 3 == 1 else "audio"),
            r.text.encode() if r.doc_id % 10 != 7 else None,  # some corrupt rows
            "application/octet-stream",
            16,
            12,
            3500 if r.doc_id % 3 == 1 else None,
        )
        for r in docs.collect()
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_image_features_shape_and_determinism(spark, media_df):
    out = MM.image_features(media_df).orderBy("media_id")
    rows = out.collect()
    assert rows, "no image rows produced"
    for r in rows:
        if r.n_bytes == 0:
            assert r.thumbnail is None and r.mean_intensity is None
        else:
            assert len(r.thumbnail) == 64
            assert 0.0 <= r.mean_intensity <= 255.0
    # determinism across runs
    again = MM.image_features(media_df).orderBy("media_id").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_frame_sample_fanout(spark, media_df):
    out = MM.frame_sample(media_df, every_ms=1000)
    pdf = out.toPandas()
    assert not pdf.empty
    # 3500 ms at 1000 ms stride -> frames at 0,1000,2000,3000
    per = pdf.groupby("media_id").size()
    assert (per == 4).all()
    assert set(pdf.frame_idx.unique()) == {0, 1, 2, 3}


def test_image_resize(spark, media_df):
    out = MM.image_resize(media_df, target=(4, 4)).collect()
    assert out
    for r in out:
        assert (r.width, r.height) == (4, 4)
        if r.pixels is not None:
            assert len(r.pixels) == 16
            assert all(0.0 <= p <= 255.0 for p in r.pixels)


def test_media_stats_per_kind(spark, media_df):
    got = {r.kind: r for r in MM.media_stats(media_df).collect()}
    assert set(got) == {"image", "video", "audio"}
    assert all(r.n_items > 0 for r in got.values())
    assert got["video"].max_duration_ms == 3500


def test_real_backends_are_stubbed(spark, media_df):
    with pytest.raises(NotImplementedError):
        MM.image_features(media_df, backend="pil")
    with pytest.raises(NotImplementedError):
        MM.frame_sample(media_df, backend="ffmpeg")


def test_corrupt_rows_do_not_fail_job(spark, media_df):
    n_images = media_df.filter(F.col("kind") == "image").count()
    out = MM.image_features(media_df)
    assert out.count() == n_images  # corrupt rows present as null-feature rows
