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
