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


def test_image_features_on_error_null(spark):
    """A corrupt payload must not kill the job in on_error='null' mode:
    features null out and decode_error carries the message; good rows in
    the same batch decode normally. Default mode still raises."""
    import numpy as np
    from pyspark.sql import Row
    from valkey_search_spark.multimodal.codecs import encode_bmp
    from valkey_search_spark.multimodal.columns import image_features
    import pytest

    good = encode_bmp(np.full((4, 4, 3), 7, dtype=np.uint8))
    df = spark.createDataFrame([
        Row(id=1, image=bytearray(good)),
        Row(id=2, image=bytearray(good[:20])),         # truncated BMP
        Row(id=3, image=bytearray(b"RIFFnot-an-image")),
        Row(id=4, image=None),
    ])
    out = {r["id"]: r for r in
           image_features(df, fake=False, on_error="null").collect()}
    assert out[1]["img_mean"] == [7.0, 7.0, 7.0]
    assert out[1]["decode_error"] is None
    assert out[2]["img_mean"] is None and "BMP" in out[2]["decode_error"]
    assert out[3]["img_mean"] is None and out[3]["decode_error"]
    assert out[4]["img_mean"] is None and out[4]["decode_error"] is None
    from pyspark.errors import PySparkException
    with pytest.raises(PySparkException):              # strict default
        image_features(df, fake=False).collect()
    with pytest.raises(ValueError, match="on_error"):
        image_features(df, on_error="bogus")


def test_audio_features_on_error_null(spark):
    import numpy as np
    from pyspark.sql import Row
    from valkey_search_spark.multimodal.codecs import encode_wav
    from valkey_search_spark.multimodal.columns import audio_features

    good = encode_wav(np.zeros((100, 1), dtype=np.float32), 8000)
    df = spark.createDataFrame([
        Row(id=1, audio=bytearray(good)),
        Row(id=2, audio=bytearray(b"MP3junk" * 4)),
    ])
    out = {r["id"]: r for r in
           audio_features(df, fake=False, on_error="null").collect()}
    assert out[1]["audio_seconds"] == 100 / 8000
    assert out[2]["audio_rms"] is None and out[2]["decode_error"]


def test_on_error_null_operators_chain(spark):
    """image_features -> image_resize chained in on_error='null' mode
    share ONE decode_error column (first error wins) instead of
    colliding on a duplicate field name."""
    import numpy as np
    from pyspark.sql import Row
    from valkey_search_spark.multimodal.codecs import encode_bmp
    from valkey_search_spark.multimodal.columns import (
        image_features, image_resize,
    )

    good = encode_bmp(np.full((4, 4, 3), 5, dtype=np.uint8))
    df = spark.createDataFrame([Row(id=1, image=bytearray(good)),
                                Row(id=2, image=bytearray(b"junk"))])
    step1 = image_features(df, fake=False, on_error="null")
    out = {r["id"]: r for r in
           image_resize(step1, size=8, fake=False,
                        on_error="null").collect()}
    assert [f.name for f in
            image_resize(step1, fake=False, on_error="null")
            .schema.fields].count("decode_error") == 1
    assert out[1]["decode_error"] is None
    assert out[1]["image_resized"] is not None
    assert out[2]["decode_error"] and out[2]["image_resized"] is None
