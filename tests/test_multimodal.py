"""Multimodal operator tests: real bytes through real mapInPandas plumbing."""

from __future__ import annotations

import math

import pytest

from beacon_indexer_spark.operators import multimodal as M


def test_codec_roundtrip():
    px = bytes(range(12))
    buf = M.encode_image(2, 2, 3, px)
    assert M.decode_image_bytes(buf) == (2, 2, 3, px)
    a = M.encode_audio(16000, [0, 100, -100, 32767, -32768])
    assert M.decode_audio_bytes(a) == (16000, [0, 100, -100, 32767, -32768])
    frames = [bytes([i] * 4) for i in range(3)]
    v = M.encode_video(2, 2, 1, frames)
    assert M.decode_video_bytes(v) == (2, 2, 1, frames)


def test_external_format_raises_not_implemented():
    with pytest.raises(NotImplementedError, match="codec not available"):
        M.decode_image_bytes(b"\x89PNG\r\n\x1a\n....")


def test_truncated_image_and_video_fail_loudly():
    img = M.encode_image(2, 2, 3, bytes(range(12)))
    with pytest.raises(ValueError, match="truncated IMG1"):
        M.decode_image_bytes(img[:-3])
    vid = M.encode_video(2, 2, 1, [bytes([i] * 4) for i in range(3)])
    with pytest.raises(ValueError, match="truncated VID1"):
        M.decode_video_bytes(vid[:-2])


def test_truncated_audio_fails_loudly(spark):
    # header declares 5 samples but the payload was cut: the feature
    # extractor must raise, never emit silently-scaled rms/duration
    good = M.encode_audio(16000, [100, 200, 300, 400, 500])
    df = spark.createDataFrame([(1, good[:-4])], "doc_id long, content binary")
    with pytest.raises(Exception, match="truncated AUD1"):
        M.extract_audio_features(df).collect()


def test_decode_images(spark):
    rows = [
        (1, M.encode_image(2, 2, 1, bytes([10, 20, 30, 40]))),
        (2, M.encode_image(1, 3, 2, bytes([0, 0, 0, 0, 60, 60]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r.asDict() for r in M.decode_images(df).collect()}
    assert got[1]["width"] == 2 and got[1]["height"] == 2 and got[1]["channels"] == 1
    assert got[1]["mean_intensity"] == 25.0
    assert got[2]["channels"] == 2 and got[2]["mean_intensity"] == 20.0
    assert got[1]["byte_length"] == 9 + 4


def test_resize_images(spark):
    # 4x4 single-channel gradient → 2x2 nearest-neighbor
    px = bytes(range(16))
    df = spark.createDataFrame([(7, M.encode_image(4, 4, 1, px))],
                               "doc_id long, content binary")
    out = M.resize_images(df, 2, 2).collect()[0]
    w, h, c, rpx = M.decode_image_bytes(bytes(out["content"]))
    assert (w, h, c) == (2, 2, 1)
    # nearest-neighbor picks (0,0),(0,2),(2,0),(2,2) = 0,2,8,10
    assert list(rpx) == [0, 2, 8, 10]


def test_audio_features(spark):
    samples = [3, -4, 3, -4]
    df = spark.createDataFrame([(9, M.encode_audio(8000, samples))],
                               "doc_id long, content binary")
    r = M.extract_audio_features(df).collect()[0]
    assert r["sample_rate"] == 8000 and r["n_samples"] == 4
    assert r["duration_s"] == 4 / 8000
    assert math.isclose(r["rms"], math.sqrt((9 + 16 + 9 + 16) / 4))
    assert r["peak"] == 4


def test_sample_frames(spark):
    frames = [bytes([i] * 4) for i in range(6)]
    df = spark.createDataFrame([(5, M.encode_video(2, 2, 1, frames))],
                               "doc_id long, content binary")
    got = M.sample_frames(df, every_nth=2).collect()
    assert [r["frame_index"] for r in got] == [0, 2, 4]
    w, h, c, px = M.decode_image_bytes(bytes(got[1]["frame"]))
    assert px == bytes([2] * 4)


def test_media_fingerprint_dedup(spark):
    blob = M.encode_image(1, 1, 1, b"\x42")
    df = spark.createDataFrame(
        [(1, blob), (2, blob), (3, M.encode_image(1, 1, 1, b"\x43"))],
        "doc_id long, content binary",
    )
    fp = M.media_fingerprint(df)
    groups = fp.groupBy("media_sha256").count().collect()
    assert sorted(g["count"] for g in groups) == [1, 2]
    assert all(g["media_sha256"] and len(g["media_sha256"]) == 64 for g in groups)


def test_image_ahash_known_bitmap(spark):
    """2x2 image [10, 200 / 10, 10]: the 8x8 nearest-neighbor sample maps
    cols 0-3 -> pixel col 0, cols 4-7 -> col 1, rows likewise; only the
    (row<4, col>=4) quadrant's 16 samples hold 200, and 64*200 > total
    (230*16*... ) while 64*10 < total — expected hash = top-right
    quadrant bits set: rows 0-3, cols 4-7 -> 0x0f0f0f0f00000000."""
    img = M.encode_image(2, 2, 1, bytes([10, 200, 10, 10]))
    df = spark.createDataFrame([(1, img)], "doc_id long, content binary")
    got = M.image_ahash(df).collect()[0]
    assert got["ahash"] == "0f0f0f0f00000000"


def test_image_near_dupes_planted(spark):
    """Planted frame: base image, a 1-pixel-tweak near-dup (hamming<=3),
    an exact dup (hamming 0), and a far image — pairs must be exactly
    the planted ones with exact distances."""
    base_px = bytes(range(64))           # 8x8 gradient
    near_px = bytes([0, 63]) + bytes(range(2, 64))  # one pixel bumped
    # checkerboard: opposite brightness PATTERN (a reversed/inverted
    # gradient would ahash identically — pattern-equal is dup-equal)
    far_px = bytes([255 if (i + i // 8) % 2 else 0 for i in range(64)])
    rows = [
        (1, M.encode_image(8, 8, 1, base_px)),
        (2, M.encode_image(8, 8, 1, near_px)),
        (3, M.encode_image(8, 8, 1, base_px)),   # exact dup of 1
        (4, M.encode_image(8, 8, 1, far_px)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in M.image_near_dupes(df, max_dist=3).collect()}
    assert got[(1, 3)] == 0
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert got[(2, 3)] == got[(1, 2)]
    assert not any(4 in p for p in got)


def test_image_near_dupes_resize_invariant_for_nn_upscale(spark):
    """aHash of an image and its nearest-neighbor 2x upscale are identical
    (the sample grid hits the same source pixels) — the property that
    makes the hash 'perceptual' rather than byte identity."""
    px = bytes([(i * 7 + j * 13) % 256 for i in range(4) for j in range(4)])
    small = M.encode_image(4, 4, 1, px)
    df = spark.createDataFrame([(1, small)], "doc_id long, content binary")
    up = M.resize_images(df, 8, 8).select("doc_id", "content")
    h_small = M.image_ahash(df).collect()[0]["ahash"]
    h_up = M.image_ahash(up).collect()[0]["ahash"]
    assert h_small == h_up


def test_image_near_dupes_bucket_cap_routes_identical_cluster(spark):
    """The 100-TB OOM guard on the image path: a pathological cluster of
    IDENTICAL images collapses every band bucket onto one key; with
    max_bucket below the cluster size the overflow join must produce
    EXACTLY the same pairs as the uncapped in-row expansion (the cap is
    a physical-plan choice, never a semantics change)."""
    base_px = bytes(range(64))
    far_px = bytes([255 if (i + i // 8) % 2 else 0 for i in range(64)])
    rows = [(i, M.encode_image(8, 8, 1, base_px)) for i in range(12)]
    rows.append((100, M.encode_image(8, 8, 1, far_px)))
    df = spark.createDataFrame(rows, "doc_id long, content binary")

    def pairs(max_bucket):
        return sorted(
            (r["id_a"], r["id_b"], r["hamming"])
            for r in M.image_near_dupes(
                df, max_dist=3, max_bucket=max_bucket
            ).collect()
        )

    uncapped = pairs(None)
    capped = pairs(4)  # 12 identical images >> cap of 4
    assert capped == uncapped
    # all 12C2 identical pairs at hamming 0, far image in none
    assert len(uncapped) == 66
    assert all(h == 0 for _, _, h in uncapped)
    assert not any(100 in (a, b) for a, b, _ in uncapped)


def test_detect_scene_changes_planted(spark):
    """Three frames: f0==f1 (delta 0, no cut), f2 differs by exactly 50
    per pixel over 6 pixels (delta 300 > threshold 200 -> one cut)."""
    f0 = bytes([10, 20, 30, 40, 50, 60])
    f2 = bytes([60, 70, 80, 90, 100, 110])
    vid = M.encode_video(3, 2, 1, [f0, f0, f2])
    still = M.encode_video(3, 2, 1, [f0, f0])
    df = spark.createDataFrame(
        [(1, vid), (2, still)], "doc_id long, content binary"
    )
    got = {
        r.doc_id: (r.n_frames, r.n_cuts, r.max_delta)
        for r in M.detect_scene_changes(df, threshold=200).collect()
    }
    assert got[1] == (3, 1, 300)
    assert got[2] == (2, 0, 0)


def test_audio_silence_ratio_boundary(spark):
    """|s| < threshold is strict: a sample AT the threshold is not
    silent."""
    samples = [0, 5, -5, 100, -100, 99, -99, 1000]
    clip = M.encode_audio(8000, samples)
    df = spark.createDataFrame([(1, clip)], "doc_id long, content binary")
    r = M.audio_silence_ratio(df, threshold=100).collect()[0]
    # silent: 0, 5, -5, 99, -99 -> 5 of 8 (±100 and 1000 are not)
    assert (r.n_samples, r.n_silent) == (8, 5)
    assert abs(r.silence_ratio - 5 / 8) < 1e-12
