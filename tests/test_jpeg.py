"""Baseline JPEG codec gates: every decode path (4:4:4, 4:2:0, restart
markers, grayscale, odd sizes) exercised against the engine's own
encoder, with PSNR floors and a pinned encode hash for determinism."""
import hashlib

import numpy as np
import pytest

from simplefeatures_ray.jpegcodec import jpeg_decode, jpeg_encode


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 255 // max(w, 1)),
                     (yy * 255 // max(h, 1)),
                     ((xx + yy) * 255 // max(h + w, 1))], axis=2).astype(np.uint8)


def _psnr(a, b):
    err = a.astype(np.float64) - b.astype(np.float64)
    mse = np.mean(err ** 2)
    return 1e9 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


@pytest.mark.parametrize("kw,floor", [
    (dict(), 45.0),
    (dict(subsample=True), 40.0),
    (dict(restart_interval=2), 45.0),
    (dict(subsample=True, restart_interval=3), 40.0),
])
def test_round_trip_paths(kw, floor):
    img = _gradient(50, 70)
    dec = jpeg_decode(jpeg_encode(img, quality=90, **kw))
    assert dec.shape == img.shape
    assert _psnr(dec, img) > floor


def test_grayscale_and_odd_sizes():
    g = ((np.sin(np.linspace(0, 6, 37))[:, None] * 127 + 128)
         .astype(np.uint8) * np.ones((1, 23), np.uint8))
    dec = jpeg_decode(jpeg_encode(g, quality=95))
    assert dec.shape == (37, 23, 1)
    assert _psnr(dec[:, :, 0], g) > 45.0


def test_noise_round_trip_high_quality():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=97))
    assert _psnr(dec, img) > 28.0  # noise is the worst case for DCT


def test_encode_deterministic_pinned():
    img = _gradient(24, 24)
    data = jpeg_encode(img, quality=90)
    assert data[:2] == b"\xFF\xD8" and data[-2:] == b"\xFF\xD9"
    assert jpeg_encode(img, quality=90) == data
    # pin (update deliberately with a reason, never casually)
    assert hashlib.sha256(data).hexdigest() == PINNED_JPEG_24
    # decode is also deterministic
    d1 = jpeg_decode(data)
    d2 = jpeg_decode(data)
    assert (d1 == d2).all()


PINNED_JPEG_24 = "de3384e12b12efaa7ac03b2f392325e67c75426bab027b6a9b2666e287b79877"


def test_bad_inputs():
    with pytest.raises(ValueError):
        jpeg_decode(b"nope")
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((4, 4, 2), np.uint8))


def test_decode_image_stage_handles_jpeg(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from simplefeatures_ray.stages.multimodal import DecodeImage, real_media_table

    media = real_media_table(12)  # PNG / JPEG 4:4:4 / JPEG 4:2:0 round-robin
    ds = rd.from_arrow(media).map_batches(
        DecodeImage, batch_format="pyarrow", concurrency=1, batch_size=4)
    df = ds.to_pandas()
    assert len(df) == 12
    assert {"pixels", "height", "width"} <= set(df.columns)
    # decoded JPEG pixels approximate the original pattern (not noise):
    # re-decode id=1 (JPEG 4:4:4) directly and compare against stage output
    from simplefeatures_ray.imagecodec import resize_nearest

    raw = media["image_bytes"][1].as_py()
    img = jpeg_decode(raw)
    want = resize_nearest(img, 32, 32).reshape(-1)
    got = np.asarray(df["pixels"][1], dtype=np.uint8)
    assert (got == want).all()


def test_mjpeg_index_and_sample():
    from simplefeatures_ray.jpegcodec import (
        jpeg_decode,
        mjpeg_encode,
        mjpeg_frame_index,
    )

    frames = [np.roll(_gradient(16, 16), 3 * f, axis=1) for f in range(7)]
    data = mjpeg_encode(frames, quality=85)
    idx = mjpeg_frame_index(data)
    assert len(idx) == 7
    # spans tile the stream exactly
    assert idx[0][0] == 0
    for (o1, l1), (o2, _) in zip(idx, idx[1:]):
        assert o1 + l1 == o2
    assert idx[-1][0] + idx[-1][1] == len(data)
    # each indexed frame decodes to its source (high PSNR)
    for fi, (off, ln) in enumerate(idx):
        dec = jpeg_decode(data[off:off + ln])
        # rolled gradients have a hard wrap edge -> lower PSNR than smooth
        assert _psnr(dec, frames[fi]) > 35.0


def test_sample_frames_real_mjpeg(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from simplefeatures_ray.jpegcodec import mjpeg_encode, mjpeg_frame_index
    from simplefeatures_ray.stages.multimodal import SampleFrames

    # 20 rows so no roll shift is a full period (distinct frames)
    frames = [np.roll(_gradient(20, 16), 2 * f, axis=0) for f in range(9)]
    data = mjpeg_encode(frames, quality=80)
    t = pa.table({"media_id": pa.array([0], pa.int64()),
                  "video_bytes": pa.array([data], pa.binary())})
    df = rd.from_arrow(t).map_batches(
        SampleFrames, batch_format="pyarrow", concurrency=1).to_pandas()
    offs = list(df["frame_offsets"][0])
    idx = mjpeg_frame_index(data)
    starts = [o for o, _ in idx]
    # sampled offsets are REAL frame starts: first and last frames included
    assert all(o in starts for o in offs)
    assert offs[0] == starts[0] and offs[-1] == starts[-1]
    assert len(set(df["frame_hashes"][0])) == len(offs)  # distinct content
    # deterministic across runs
    df2 = rd.from_arrow(t).map_batches(
        SampleFrames, batch_format="pyarrow", concurrency=1).to_pandas()
    assert list(df2["frame_hashes"][0]) == list(df["frame_hashes"][0])


def test_optimized_huffman_round_trip_and_size():
    """Per-image canonical length-limited tables: smaller stream, same
    decode, valid against the generic DHT decoder (incl. subsampling and
    restart markers)."""
    img = _gradient(50, 70)
    base = jpeg_encode(img, quality=90)
    for kw, floor in [(dict(optimize_huffman=True), 45.0),
                      (dict(optimize_huffman=True, subsample=True), 40.0),
                      (dict(optimize_huffman=True, restart_interval=2), 45.0)]:
        data = jpeg_encode(img, quality=90, **kw)
        dec = jpeg_decode(data)
        assert _psnr(dec, img) > floor
        if "subsample" not in kw:
            assert len(data) < len(base)  # strictly better compression
    # deterministic
    assert (jpeg_encode(img, 90, optimize_huffman=True)
            == jpeg_encode(img, 90, optimize_huffman=True))


def test_optimized_huffman_fuzz():
    rng = np.random.default_rng(9)
    for t in range(25):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        c = int(rng.choice([1, 3]))
        img = rng.integers(0, 256, (h, w, c) if c == 3 else (h, w), dtype=np.uint8)
        q = int(rng.integers(30, 99))
        data = jpeg_encode(img, q, optimize_huffman=True,
                           subsample=bool(t % 2 and c == 3),
                           restart_interval=int(rng.integers(0, 4)))
        dec = jpeg_decode(data)
        assert dec.shape[:2] == (h, w)
