"""Multimodal plumbing: media table extraction, stubbed codec kernels —
schemas, batch shapes, fan-out, and joinability with extraction media spans."""

import pyspark.sql.functions as F
import pytest

from docprompt_spark import multimodal, pipeline


@pytest.fixture(scope="module")
def media(spark):
    docs = pipeline.corpus_df(spark, 16, seed=11, skew_every=0)
    docs.persist().count()
    m = multimodal.media_table(docs.select("doc_id", "pdf", "n_pages"))
    m.persist().count()
    return docs, m


def test_media_table_matches_extraction_media_spans(spark, media):
    docs, m = media
    result = pipeline.run_extraction(spark, docs.select("doc_id", "pdf", "n_pages"))
    spans_media = (
        pipeline.spans_exploded(result)
        .filter(F.col("kind") == "media")
        .select("doc_id", "media_ref")
    )
    # every media span joins to exactly one media payload row (content-addressed)
    joined = spans_media.join(m, ["doc_id", "media_ref"], "left")
    assert joined.filter(F.col("payload").isNull()).count() == 0
    assert spans_media.count() == m.count()


def test_media_payload_content_addressed(media):
    import hashlib

    _, m = media
    rows = m.select("media_ref", "payload").collect()
    assert rows
    for r in rows:
        assert hashlib.md5(bytes(r["payload"])).hexdigest() == r["media_ref"]


def test_image_features_deterministic(media):
    _, m = media
    f1 = {r["media_ref"]: r for r in multimodal.image_features(m).collect()}
    f2 = {r["media_ref"]: r for r in multimodal.image_features(m).collect()}
    assert f1.keys() == f2.keys() and len(f1) > 0
    for k in f1:
        assert f1[k] == f2[k]
        assert 0.0 <= f1[k]["mean_intensity"] <= 255.0


def test_thumbnails_shape(media):
    _, m = media
    rows = multimodal.resize_thumbnails(m, out_w=8, out_h=8).collect()
    assert rows
    for r in rows:
        assert len(r["thumb"]) == 64


def test_frame_sample_fanout(media):
    _, m = media
    frames = multimodal.frame_sample(m)
    per_ref = frames.groupBy("media_ref").count().collect()
    assert per_ref
    assert all(1 <= r["count"] <= 4 for r in per_ref)
    # frame_idx dense from 0
    idx = frames.groupBy("media_ref").agg(
        F.min("frame_idx").alias("lo"), F.max("frame_idx").alias("hi"), F.count("*").alias("n")
    )
    bad = idx.filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count()
    assert bad == 0


def test_lossless_codecs_decode_real_pixels():
    """gray8 / flate-gray8 / png decode REAL pixels; dct raises (external
    codec genuinely required) and decode_or_stub falls back to the stub."""
    import zlib

    import numpy as np

    from docprompt_spark import png

    samples = bytes(range(24))
    arr = np.frombuffer(samples, dtype=np.uint8).reshape(4, 6)
    assert (multimodal.decode_image(samples, 6, 4, "gray8") == arr).all()
    assert (
        multimodal.decode_image(zlib.compress(samples), 6, 4, "flate-gray8") == arr
    ).all()
    assert (multimodal.decode_image(png.encode(arr), 6, 4, "png") == arr).all()
    # dct is REAL now (docprompt_spark.jpeg); jpx still needs external libs
    from docprompt_spark import jpeg

    jarr = multimodal.decode_image(jpeg.encode(arr, 95), 6, 4, "dct")
    assert jarr.shape == (4, 6)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"anything", 2, 2, "jpx")
    # corrupt payloads fall back to the deterministic stub, not a crash
    fake = multimodal.decode_or_stub(b"\xff\xd8truncated", 2, 2, "dct")
    assert fake.shape == (2, 2)


def test_ccitt_decode_honors_decodeparms_columns_rows():
    """DecodeParms /Columns (spec default 1728) governs the coded row
    geometry, not the XObject /Width; when they differ the codec tag carries
    c{cols};r{rows} and decode_image crops back to Width x Height."""
    import numpy as np

    from docprompt_spark import ccitt, multimodal

    rng = np.random.default_rng(5)
    cols, rows = 72, 20
    bits = (rng.integers(0, 4, size=(rows, cols)) == 0).astype(np.uint8)
    payload = ccitt.encode(bits)
    want = ((1 - bits) * 255).astype(np.uint8)

    got = multimodal.decode_image(payload, 64, 16, f"ccitt-g4;c{cols};r{rows}")
    assert got.shape == (16, 64)
    assert np.array_equal(got, want[:16, :64])
    # matched geometry still works through the bare tag
    full = multimodal.decode_image(payload, cols, rows, "ccitt-g4")
    assert np.array_equal(full, want)


def test_codec_of_emits_suffix_only_on_mismatch():
    from docprompt_spark import multimodal

    def resolve(x):
        return x

    base = {
        "Filter": "CCITTFaxDecode",
        "Width": 64,
        "Height": 16,
        "DecodeParms": {"K": -1, "Columns": 64, "Rows": 16},
    }
    assert multimodal._codec_of(base, resolve) == "ccitt-g4"
    mism = dict(base, DecodeParms={"K": -1, "Columns": 1728, "Rows": 16})
    assert multimodal._codec_of(mism, resolve) == "ccitt-g4;c1728;r16"
    # spec default when Columns absent
    nodp = dict(base, DecodeParms={"K": -1})
    assert multimodal._codec_of(nodp, resolve) == "ccitt-g4;c1728;r16"
