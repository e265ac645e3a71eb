"""Multimodal plumbing: format sniffing (JVM-side) and batched feature
extraction (stubbed decode, real dataflow)."""


def test_media_pipeline(spark):
    from trafilatura_spark.operators.multimodal import FEATURE_DIM, media_features

    rows = [
        (1, b"\x89PNG\r\n\x1a\n" + b"x" * 64),
        (2, b"\xff\xd8\xff\xe0" + b"y" * 64),
        (3, b"GIF89a" + b"z" * 32),
        (4, b"RIFF\x00\x00\x00\x00WAVE" + b"a" * 128),
        (5, b"\x00\x00\x00\x18ftypmp42" + b"v" * 256),
        (6, b"not a known container"),
    ]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    out = {r.media_id: r for r in media_features(df).collect()}

    assert out[1].format == "png"
    assert out[2].format == "jpeg"
    assert out[3].format == "gif"
    assert out[4].format == "riff"
    assert out[5].format == "mp4"
    assert out[6].format == "unknown"
    for r in out.values():
        assert len(r.feature) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.feature)

    # deterministic across runs
    again = {r.media_id: r.feature for r in media_features(df).collect()}
    assert {k: v.feature for k, v in out.items()} == again


def test_decode_real_is_explicit_stub():
    import pytest

    from trafilatura_spark.operators.multimodal import decode_real

    with pytest.raises(NotImplementedError):
        decode_real(b"")
