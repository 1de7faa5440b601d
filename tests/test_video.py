"""MRV video codec: round-trip exactness, keyframe/delta seek, and the
stride-sampler decode-cost bound (decode only what you sample)."""

import zlib

import numpy as np
import pytest

from mvtspark.kernels import video


def test_synth_frames_deterministic_and_shaped():
    a = video.synth_frames(seed=17, n_frames=5, w=8, h=6)
    b = video.synth_frames(seed=17, n_frames=5, w=8, h=6)
    assert a.shape == (5, 6, 8, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    # closed-form spot check: pixel (y=2, x=3, c=1) of frame 4
    assert a[4, 2, 3, 1] == (3 * 3 + 2 * 7 + 1 * 11 + 4 * 13 + 17) % 256


@pytest.mark.parametrize("key_int", [1, 3, 4, 7])
def test_mrv_roundtrip_exact(key_int):
    frames = video.synth_frames(seed=99, n_frames=13, w=8, h=6)
    blob = video.encode_mrv(frames, key_int=key_int)
    assert video.mrv_info(blob) == (8, 6, 13, key_int)
    got = video.decode_mrv_frames(blob, range(13))
    for f in range(13):
        assert np.array_equal(got[f], frames[f]), f"frame {f} mismatch"


def test_mrv_roundtrip_random_content():
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(9, 5, 4, 3), dtype=np.uint8)
    blob = video.encode_mrv(frames, key_int=4)
    got = video.decode_mrv_frames(blob, [8, 0, 5])
    assert np.array_equal(got[0], frames[8])
    assert np.array_equal(got[1], frames[0])
    assert np.array_equal(got[2], frames[5])


def test_stride_sampler_decodes_bounded_payloads(monkeypatch):
    """Sampling every 30th frame of a 240-frame clip with key_int=4 must
    inflate <= ceil(240/30) * key_int payloads, not all 240."""
    frames = video.synth_frames(seed=3, n_frames=240, w=4, h=3)
    blob = video.encode_mrv(frames, key_int=4)
    calls = []
    real = zlib.decompress

    def counting(b):
        calls.append(1)
        return real(b)

    monkeypatch.setattr(video.zlib, "decompress", counting)
    want = list(range(0, 240, 30))
    got = video.decode_mrv_frames(blob, want)
    assert len(calls) <= len(want) * 4
    for i, t in enumerate(want):
        assert np.array_equal(got[i], frames[t])


def test_delta_frames_compress_smaller_than_intra():
    frames = video.synth_frames(seed=5, n_frames=32, w=16, h=12)
    intra = video.encode_mrv(frames, key_int=1)
    delta = video.encode_mrv(frames, key_int=8)
    assert len(delta) < len(intra)


def test_mrv_rejects_garbage():
    with pytest.raises(ValueError):
        video.mrv_info(b"nope" + b"\x00" * 32)
    frames = video.synth_frames(seed=1, n_frames=4, w=4, h=4)
    blob = video.encode_mrv(frames, key_int=2)
    with pytest.raises(ValueError):
        video.decode_mrv_frames(blob[: len(blob) - 5], [3])
    with pytest.raises(IndexError):
        video.decode_mrv_frames(blob, [4])


def test_frame_sample_clips_end_to_end(spark):
    """Operator decodes REAL pixels: cross-check every output row against
    a driver-side re-synthesis (lossless codec => exact equality)."""
    import hashlib

    from mvtspark.operators.multimodal import frame_sample_clips
    from mvtspark.sources.videos import synth_videos

    videos = synth_videos(spark, 6, w=8, h=6, key_int=4)
    rows = frame_sample_clips(videos, every_n=30).collect()
    n_frames = {f"vid{v}": 50 + v % 200 for v in range(6)}
    expect_rows = sum(len(range(0, n, 30)) for n in n_frames.values())
    assert len(rows) == expect_rows
    for r in rows:
        vid = int(r.video_id[3:])
        frame = video.synth_frames(vid % 251, n_frames[r.video_id], 8, 6)[r.frame_idx]
        flat = frame.reshape(-1)
        csv = ",".join(map(str, flat.tolist()))
        h = int.from_bytes(hashlib.md5(csv.encode()).digest()[:8], "little")
        assert r.pixel_sum == int(flat.sum(dtype="int64"))
        assert r.frame_hash == (h & 0x7FFFFFFFFFFFFFFF)
        assert r.n_px == 144
