"""Multimodal asset plumbing tests: schema contract, Arrow-batched
mapInPandas decode/resize/frame-sample, and the stub boundary."""

import pytest

from reddit_data_pipeline_engineering_spark.schemas import MULTIMODAL_ASSET
from reddit_data_pipeline_engineering_spark.sources import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    return mm.synthesize_assets(spark, n=30).cache()


def test_asset_schema_contract(assets):
    assert assets.schema == MULTIMODAL_ASSET
    assert assets.count() == 30


def test_decode_assets(assets):
    decoded = {r["asset_id"]: r.asDict() for r in mm.decode_assets(assets).collect()}
    assert len(decoded) == 30
    # Deterministic synthetic pixels: verify one asset end-to-end.
    w, h, pixels = mm.decode_payload(mm.synth_payload(3, 11, 9))
    assert (w, h, len(pixels)) == (11, 9, 99)
    row = decoded[3]
    assert (row["width"], row["height"], row["n_bytes"]) == (
        8 + 3 % 5,
        6 + 3 % 4,
        (8 + 3 % 5) * (6 + 3 % 4),
    )
    expect_mean = sum(
        mm.decode_payload(mm.synth_payload(3, row["width"], row["height"]))[2]
    ) / row["n_bytes"]
    assert row["mean_intensity"] == pytest.approx(expect_mean)


def test_decode_stub_rejects_real_media():
    with pytest.raises(NotImplementedError):
        mm.decode_payload(b"\xff\xd8\xff\xe0 not really a jpeg")


def test_resize_assets(assets):
    resized = mm.resize_assets(assets, 4, 3)
    rows = resized.collect()
    assert len(rows) == 30
    for r in rows:
        assert (r["width"], r["height"]) == (4, 3)
        w, h, pixels = mm.decode_payload(bytes(r["payload"]))
        assert (w, h, len(pixels)) == (4, 3, 12)


def test_sample_frames(assets):
    frames = mm.sample_frames(assets, every_ms=5000).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append((r["frame_idx"], r["frame_ms"]))
    # Only audio/video assets produce frames; image rows filtered out.
    assert all(a % 3 != 0 for a in by_asset)
    # asset 1 (audio): duration 1000ms -> frames at 0 only... every_ms=5000
    # duration_ms = 1000*(i%30); asset 16 -> 16000ms -> 0,5000,10000,15000.
    assert by_asset[16] == [(0, 0), (1, 5000), (2, 10000), (3, 15000)]


def _wav_bytes(n_channels=2, rate=16000, n_frames=1600):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x01\x00" * n_channels * n_frames)
    return buf.getvalue()


def test_probe_media_real_wav_and_ppm():
    from reddit_data_pipeline_engineering_spark.sources.multimodal import probe_media

    wav = probe_media(_wav_bytes())
    assert wav["container"] == "wav"
    assert wav["n_channels"] == 2
    assert wav["sample_rate_hz"] == 16000
    assert wav["n_samples"] == 1600
    assert wav["duration_ms"] == 100

    ppm = probe_media(b"P6\n# a comment\n640 480\n255\n" + b"\x00" * 10)
    assert ppm == {"container": "ppm", "width": 640, "height": 480}

    assert probe_media(b"\xff\xd8\xff\xe0 jpeg-ish garbage")["container"] == "unknown"
    assert probe_media(None)["container"] == "unknown"


def test_probe_assets_mixed_containers(spark):
    from reddit_data_pipeline_engineering_spark.sources.multimodal import (
        probe_assets,
        synth_payload,
    )

    rows = [
        (0, _wav_bytes(1, 8000, 800)),
        (1, b"P6 4 3 255\n" + b"\x00" * 36),
        (2, synth_payload(2, 8, 6)),
        (3, b"not a media file at all"),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r["asset_id"]: r.asDict() for r in probe_assets(df).collect()}
    assert got[0]["container"] == "wav" and got[0]["duration_ms"] == 100
    assert got[1]["container"] == "ppm" and (got[1]["width"], got[1]["height"]) == (4, 3)
    assert got[2]["container"] == "synthetic" and got[2]["width"] == 8
    assert got[3]["container"] == "unknown"
