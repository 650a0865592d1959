"""Multimodal plumbing: schema, Arrow batch shape, stub honesty."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from mini_sql_engine_spark.catalog import Catalog
from mini_sql_engine_spark.pipeline import multimodal as MM

from tests.conftest import SF_SMOKE


def _media(spark):
    return MM.synthesize_media(Catalog(spark, SF_SMOKE).table("documents").limit(50))


def test_media_schema(spark):
    media = _media(spark)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "mime", "width", "height",
    ]
    assert media.schema["payload"].dataType.simpleString() == "binary"


def test_metadata_predicates_prune_before_decode(spark):
    """Width filter must not require running the Python decode stage —
    it's a plain column predicate on the media table."""
    media = _media(spark).filter(F.col("width") > 100)
    assert media.count() > 0  # executes with no Python decode involved


def test_extract_features_fake_decode(spark):
    feats = MM.extract_features(_media(spark), fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r.n_bytes > 0
    assert len(r.feature) == 8
    assert abs(sum(r.feature) - 1.0) < 1e-3  # normalized stripes
    # deterministic across partitionings
    again = MM.extract_features(
        _media(spark).repartition(7), fake_decode=True
    ).collect()
    assert {(x.media_id, x.payload_hash) for x in again} == {
        (x.media_id, x.payload_hash) for x in rows
    }


def test_real_decode_path_is_honest_stub(spark):
    with pytest.raises(PythonException, match="NotImplementedError"):
        MM.extract_features(_media(spark), fake_decode=False).collect()


def test_frame_sample(spark):
    media = _media(spark)
    sampled = MM.frame_sample(media, every_n=10)
    assert {r.media_id % 10 for r in sampled.collect()} == {0}


def test_resize_rewrites_metadata_and_preserves_payload(spark):
    from mini_sql_engine_spark.catalog import Catalog
    from tests.conftest import SF_SMOKE

    media = MM.synthesize_media(Catalog(spark, SF_SMOKE).table("documents"))
    out = MM.resize(media, 224, 224, fake_decode=True)
    rows = out.limit(5).collect()
    assert all(r.width == 224 and r.height == 224 for r in rows)
    orig = {r.media_id: r for r in media.limit(50).collect()}
    for r in rows:
        assert bytes(r.payload) == bytes(orig[r.media_id].payload)
        assert r.orig_width == orig[r.media_id].width

    # the real-decode path must surface the stub, not silently no-op
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import PythonException

    with _pytest.raises(PythonException, match="NotImplementedError"):
        MM.resize(media, 224, 224, fake_decode=False).limit(1).collect()
