"""Multimodal column plumbing: schema, batch shape, determinism, stub gating."""

import pytest
from pyspark.sql import Row, functions as F, types as T

from valkey_search_spark.multimodal.columns import (
    IMAGE_META, attach_media_metadata, audio_features, image_features,
    image_resize, video_frame_sample,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [Row(id=i, image=bytes([i]) * 64, audio=bytes([i, 1]) * 32,
                video=bytes([i, 2]) * 128) for i in range(20)]
    rows.append(Row(id=99, image=None, audio=None, video=None))
    return spark.createDataFrame(rows).repartition(4)


def test_metadata_struct(media_df):
    df = attach_media_metadata(media_df, "image",
                               {"width": 8, "height": 8, "channels": 3,
                                "format": "png"})
    f = dict((x.name, x.dataType) for x in df.schema.fields)["image_meta"]
    assert isinstance(f, T.StructType)
    assert df.select("image_meta.width").first()[0] == 8


def test_image_features_schema_and_determinism(media_df):
    out = image_features(media_df, fake=True)
    rows1 = {r["id"]: r["img_phash"] for r in out.collect()}
    rows2 = {r["id"]: r["img_phash"] for r in image_features(media_df, fake=True).collect()}
    assert rows1 == rows2                       # deterministic across runs
    assert rows1[99] is None                    # null payload -> null features
    means = out.where("id = 3").first()["img_mean"]
    assert len(means) == 3 and all(0 <= m <= 255 for m in means)


def test_image_resize_binary_roundtrip(media_df):
    out = image_resize(media_df, size=16, fake=True)
    r = out.where("id = 1").first()
    assert len(r["image_resized"]) == 16 * 16 * 3
    assert r["image_resized_meta"]["width"] == 16


def test_audio_features(media_df):
    r = audio_features(media_df, fake=True).where("id = 2").first()
    assert r["audio_seconds"] == pytest.approx(0.1)
    assert 0.5 < r["audio_rms"] < 2.0


def test_video_frame_sample_explodes(media_df):
    out = video_frame_sample(media_df, every_n=10, fake=True)
    counts = out.groupBy("id").agg(F.count("*").alias("n")).collect()
    assert all(c["n"] >= 1 for c in counts)
    assert out.count() >= media_df.count() - 1  # null video row dropped
    assert out.schema["frame"].dataType == T.BinaryType()


def test_real_decode_is_gated(media_df):
    with pytest.raises(Exception, match="NotImplementedError|PIL|decode"):
        image_features(media_df, fake=False).collect()
