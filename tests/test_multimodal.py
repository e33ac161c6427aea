"""Real multimodal codecs: BMP / WAV round-trips, raw-video frame slicing,
decode stages' integer stats vs direct numpy computation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from cassovary_ray.multimodal import (
    AudioDecodeStage,
    audio_samples_for_id,
    decode_audio,
    decode_bmp,
    decode_images,
    decode_wav,
    encode_bmp,
    encode_wav,
    frame_sample,
    image_pixels_for_id,
    media_from_ids,
    pack_video,
    resize_nearest,
    video_frame,
    video_frames_for_id,
    video_header,
)


def test_bmp_round_trip_padded_rows():
    # W=3 -> 9-byte rows padded to 12: exercises the stride path
    rng = np.random.default_rng(7)
    for h, w in [(5, 3), (24, 40), (1, 1), (2, 4)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px), (h, w)


def test_wav_round_trip():
    s = audio_samples_for_id(11)
    got, rate = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000
    assert np.array_equal(got, s)


def test_video_header_and_frame_slicing():
    frames = video_frames_for_id(4)
    payload = pack_video(frames)
    f, h, w, c = video_header(payload)
    assert (f, h, w, c) == (6, 16, 16, 1)
    for i in range(f):
        assert np.array_equal(video_frame(payload, i)[:, :, 0], frames[i])


def test_resize_nearest_downsample():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    small = resize_nearest(px, (2, 2))
    assert small[:, :, 0].tolist() == [[0, 2], [8, 10]]


def _ids(n):
    return ray.data.from_arrow(
        pa.table({"media_id": pa.array(range(n), pa.int64())}))


def test_image_stage_stats_match_pixels():
    out = decode_images(media_from_ids(_ids(12), "image"),
                        concurrency=2, batch_size=4).to_pandas()
    assert len(out) == 12
    for r in out.itertuples():
        px = image_pixels_for_id(r.media_id).astype(np.int64)
        assert r.px_sum == px.sum()
        assert r.px_min == px.min()
        assert r.px_max == px.max()
        assert (r.height, r.width) == px.shape[:2]


def test_audio_stage_stats_match_samples():
    out = decode_audio(media_from_ids(_ids(10), "audio"),
                       concurrency=2, batch_size=4).to_pandas()
    assert len(out) == 10
    for r in out.itertuples():
        v = audio_samples_for_id(r.media_id).astype(np.int64)
        assert r.n_samples == len(v)
        assert r.s_sum == v.sum()
        assert r.abs_sum == np.abs(v).sum()
        assert r.zero_crossings == int(np.count_nonzero(v[1:] * v[:-1] < 0))
        assert len(r.rms_windows) == 8


def test_frame_sample_sums():
    out = frame_sample(media_from_ids(_ids(5), "video"), every_n=3).to_pandas()
    # 6 frames, every 3rd -> frames 0 and 3
    assert sorted(out["frame_idx"].unique()) == [0, 3]
    for r in out.itertuples():
        want = video_frames_for_id(r.media_id)[r.frame_idx].astype(np.int64).sum()
        assert r.frame_sum == want


def test_audio_stage_rejects_stereo():
    import io
    import wave

    import pytest

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(b"\x00\x00" * 8)
    stage = AudioDecodeStage()
    with pytest.raises(ValueError):
        stage(pa.table({"media_id": pa.array([0], pa.int64()),
                        "payload": pa.array([buf.getvalue()], pa.binary())}))


def test_image_ahash_near_dup_pairs():
    """aHash over real BMP payloads: an identical copy is Hamming 0; a
    mildly brightened copy stays within the near-dup threshold; a very
    different image does not pair."""
    import ray.data

    from cassovary_ray.multimodal import (
        encode_bmp,
        image_ahash,
        image_ahash_dup_pairs,
    )

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    bright = np.clip(base.astype(np.int32) + 3, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    media = ray.data.from_arrow(pa.table({
        "media_id": pa.array([0, 1, 2, 3], pa.int64()),
        "payload": pa.array([encode_bmp(base), encode_bmp(base),
                             encode_bmp(bright), encode_bmp(other)],
                            pa.binary()),
    }))
    ah = image_ahash(media).to_pandas().set_index("media_id")
    assert tuple(ah.loc[0]) == tuple(ah.loc[1])  # identical bytes, same hash
    pairs = image_ahash_dup_pairs(media, max_hamming=8).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values))
    assert (0, 1) in got
    ham01 = int(pairs[(pairs.a == 0) & (pairs.b == 1)]["hamming"].iloc[0])
    assert ham01 == 0
    # +3 brightness barely moves block means relative to the global mean
    assert (0, 2) in got or (1, 2) in got
    assert (0, 3) not in got and (1, 3) not in got and (2, 3) not in got


def test_image_ahash_matches_brute_force():
    from cassovary_ray.multimodal import ImageAHashStage, encode_bmp, image_pixels_for_id

    stage = ImageAHashStage()
    for i in (0, 7, 123):
        rgb = image_pixels_for_id(i)
        out = stage(pa.table({"media_id": pa.array([i], pa.int64()),
                              "payload": pa.array([encode_bmp(rgb)], pa.binary())}))
        gray = rgb.astype(np.int64).sum(axis=2)
        cells = gray.reshape(8, 3, 8, 5).sum(axis=(1, 3))
        bits = (cells.ravel() * 64 > cells.sum())
        lo = int((bits[:32].astype(np.int64) << np.arange(32)).sum())
        hi = int((bits[32:].astype(np.int64) << np.arange(32)).sum())
        assert out["ahash_lo"][0].as_py() == lo
        assert out["ahash_hi"][0].as_py() == hi
