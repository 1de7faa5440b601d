"""pbf kernel unit tests (mirrors reference src/VectorTiles.Tests/TestPbfReader.cs)."""

import numpy as np
import pytest

from mvtspark.kernels import pbf


def test_zigzag_roundtrip():
    v = np.array([0, -1, 1, -2, 2, 2**31 - 1, -(2**31), 123456789, -987654321])
    assert np.array_equal(pbf.zigzag_decode(pbf.zigzag_encode(v)), v)
    # known pairs from the public spec
    assert pbf.zigzag_encode(np.array([0]))[0] == 0
    assert pbf.zigzag_encode(np.array([-1]))[0] == 1
    assert pbf.zigzag_encode(np.array([1]))[0] == 2
    assert pbf.zigzag_encode(np.array([-2]))[0] == 3


def test_varint_stream_roundtrip():
    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [
            np.array([0, 1, 127, 128, 300, 2**32 - 1, 2**63, 2**64 - 1], dtype=np.uint64),
            rng.integers(0, 2**63, size=1000).astype(np.uint64),
        ]
    )
    enc = pbf.encode_varint_stream(vals)
    dec = pbf.decode_varint_stream(np.frombuffer(enc, dtype=np.uint8))
    assert np.array_equal(dec, vals)


def test_varint_known_bytes():
    # 300 = 0xAC 0x02 (public protobuf doc example)
    assert pbf.encode_varint(300) == b"\xac\x02"
    dec = pbf.decode_varint_stream(np.frombuffer(b"\xac\x02", dtype=np.uint8))
    assert dec[0] == 300


def test_varint_truncated_raises():
    with pytest.raises(pbf.PbfError):
        pbf.decode_varint_stream(np.array([0x80], dtype=np.uint8))


def test_varint_too_long_raises():
    # 11 continuation bytes — reference guards at 10 (PbfReader.cs:71-73)
    bad = np.array([0x80] * 11 + [0x01], dtype=np.uint8)
    with pytest.raises(pbf.PbfError):
        pbf.decode_varint_stream(bad)


def test_tag_guard():
    # tag 0 and tag >= 19000 rejected (PbfReader.cs:216-222)
    buf = memoryview(pbf.encode_varint(0 << 3 | 0))
    with pytest.raises(pbf.PbfError):
        pbf.read_key(buf, 0)
    buf = memoryview(pbf.encode_varint(19000 << 3 | 0))
    with pytest.raises(pbf.PbfError):
        pbf.read_key(buf, 0)


def test_skip_by_wiretype():
    body = (
        pbf.varint_field(1, 12345)
        + pbf.field_key(2, pbf.WT_FIXED64) + b"\x00" * 8
        + pbf.field_key(3, pbf.WT_FIXED32) + b"\x00" * 4
        + pbf.ld_field(4, b"hello")
        + pbf.varint_field(5, 7)
    )
    buf = memoryview(body)
    pos = 0
    seen = []
    while pos < len(buf):
        tag, wt, pos = pbf.read_key(buf, pos)
        seen.append(tag)
        if tag == 5:
            v, pos = pbf.read_varint(buf, pos)
            assert v == 7
        else:
            pos = pbf.skip(buf, pos, wt)
    assert seen == [1, 2, 3, 4, 5]
