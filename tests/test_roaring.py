"""Unit tests for the pure-Python Delta deletion-vector codec
(`azure_etl_spark/sources/roaring.py`). No SparkSession needed — the
codec is driver-side metadata by design."""

from __future__ import annotations

import struct
import uuid
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from azure_etl_spark.sources.roaring import (
    MAGIC_PORTABLE,
    NO_OFFSET_THRESHOLD,
    SERIAL_COOKIE,
    RoaringBitmapArray,
    decode_inline_dv,
    decode_uuid_z85,
    deserialize_dv,
    dv_file_bytes,
    dv_relative_path,
    encode_inline_dv,
    encode_uuid_z85,
    read_dv_from_file_bytes,
    serialize_dv,
    z85_decode,
    z85_encode,
)


# ---------------------------------------------------------------- Z85

def test_z85_rfc32_vector():
    # The test vector from ZeroMQ RFC 32.
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(data) == "HelloWorld"
    assert z85_decode("HelloWorld") == data


def test_z85_rejects_bad_lengths_and_chars():
    with pytest.raises(ValueError):
        z85_encode(b"abc")
    with pytest.raises(ValueError):
        z85_decode("abcd")
    with pytest.raises(ValueError):
        z85_decode('abcd"')  # '"' is not in the alphabet


@given(st.binary(min_size=0, max_size=64).map(lambda b: b + b"\x00" * ((-len(b)) % 4)))
def test_z85_roundtrip(data):
    assert z85_decode(z85_encode(data)) == data


def test_uuid_z85_roundtrip():
    u = uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
    enc = encode_uuid_z85(u)
    assert len(enc) == 20
    assert decode_uuid_z85(enc) == u


# ------------------------------------------------- roaring round-trip

@pytest.mark.parametrize(
    "positions",
    [
        [],
        [0],
        [0, 1, 2, 3],
        [5, 70000, 70001],  # two 16-bit containers
        [2**32 - 1, 2**32, 2**32 + 5],  # crosses a high-32 bucket boundary
        list(range(100, 5000)),  # forces a bitset container (card > 4096)
        [2**40 + i * 3 for i in range(10)],  # sparse, high bucket only
    ],
)
def test_dv_roundtrip_cases(positions):
    data = serialize_dv(positions)
    assert deserialize_dv(data) == sorted(set(positions))


@settings(max_examples=60, deadline=None)
@given(
    st.sets(
        st.one_of(
            st.integers(min_value=0, max_value=200_000),
            st.integers(min_value=2**32 - 100, max_value=2**32 + 200_000),
        ),
        max_size=6000,
    )
)
def test_dv_roundtrip_property(positions):
    data = serialize_dv(positions)
    assert deserialize_dv(data) == sorted(positions)


def test_bitmap_array_membership_and_len():
    r = RoaringBitmapArray.from_positions([1, 2, 2**33, 99])
    assert len(r) == 4
    assert 2 in r and 2**33 in r and 3 not in r
    assert list(r) == [1, 2, 99, 2**33]


def test_deserialize_rejects_bad_magic():
    bad = struct.pack("<iq", 12345678, 0)
    with pytest.raises(ValueError, match="magic"):
        RoaringBitmapArray.deserialize(bad)


def _run_flavored_bitmap(runs: list[tuple[int, int]], extra_array: list[int]) -> bytes:
    """Hand-build a 32-bit portable bitmap using the RUN cookie (12347):
    one run container at key 0 plus (optionally) one array container at
    key 1 — the flavor our writer never emits, to prove the reader
    handles foreign (real-Delta) streams."""
    containers = 1 + (1 if extra_array else 0)
    cookie = SERIAL_COOKIE | ((containers - 1) << 16)
    out = bytearray(struct.pack("<i", cookie))
    # run flag bitset: container 0 is a run container
    out += bytes([0b1])
    run_card = sum(l + 1 for _s, l in runs)
    out += struct.pack("<HH", 0, run_card - 1)
    if extra_array:
        out += struct.pack("<HH", 1, len(extra_array) - 1)
    if containers >= NO_OFFSET_THRESHOLD:  # pragma: no cover - not in this fixture
        raise AssertionError("fixture keeps container count below the threshold")
    out += struct.pack("<H", len(runs))
    for start, length in runs:
        out += struct.pack("<HH", start, length)
    if extra_array:
        out += struct.pack(f"<{len(extra_array)}H", *sorted(extra_array))
    return bytes(out)


def test_reader_handles_run_containers():
    bitmap = _run_flavored_bitmap([(10, 2), (100, 0)], [7, 9])
    payload = struct.pack("<iq", MAGIC_PORTABLE, 1) + struct.pack("<I", 0) + bitmap
    got = deserialize_dv(payload)
    expect = sorted([10, 11, 12, 100] + [(1 << 16) | 7, (1 << 16) | 9])
    assert got == expect


def test_reader_handles_run_cookie_with_offset_header():
    """>= NO_OFFSET_THRESHOLD containers under the run cookie carry an
    offset header the reader must skip."""
    n = 4
    cookie = SERIAL_COOKIE | ((n - 1) << 16)
    out = bytearray(struct.pack("<i", cookie))
    out += bytes([0b0000])  # no run containers, but run-cookie framing
    for k in range(n):
        out += struct.pack("<HH", k, 0)  # cardinality 1 each
    # offset header (required at n >= 4): offsets from bitmap start
    base = len(out) + 4 * n
    for k in range(n):
        out += struct.pack("<I", base + 2 * k)
    for k in range(n):
        out += struct.pack("<H", k + 1)
    payload = struct.pack("<iq", MAGIC_PORTABLE, 1) + struct.pack("<I", 0) + bytes(out)
    assert deserialize_dv(payload) == [
        (0 << 16) | 1, (1 << 16) | 2, (2 << 16) | 3, (3 << 16) | 4
    ]


# ------------------------------------------------------- file framing

def test_dv_file_roundtrip_multiple():
    p1 = serialize_dv([1, 5, 9])
    p2 = serialize_dv(range(0, 9000, 2))
    raw, offsets = dv_file_bytes([p1, p2])
    assert raw[0] == 1
    assert read_dv_from_file_bytes(raw, offsets[0], len(p1)) == p1
    assert read_dv_from_file_bytes(raw, offsets[1], len(p2)) == p2


def test_dv_file_crc_and_size_guards():
    p = serialize_dv([3, 4])
    raw, offsets = dv_file_bytes([p])
    with pytest.raises(ValueError, match="sizeInBytes"):
        read_dv_from_file_bytes(raw, offsets[0], len(p) - 1)
    corrupted = bytearray(raw)
    corrupted[offsets[0] + 4 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        read_dv_from_file_bytes(bytes(corrupted), offsets[0], len(p))
    with pytest.raises(ValueError, match="format version"):
        read_dv_from_file_bytes(b"\x02" + raw[1:], offsets[0], len(p))


def test_dv_file_crc_is_crc32_of_payload():
    p = serialize_dv([42])
    raw, (off,) = dv_file_bytes([p])
    (crc,) = struct.unpack_from(">I", raw, off + 4 + len(p))
    assert crc == (zlib.crc32(p) & 0xFFFFFFFF)


# ------------------------------------------------------- descriptors

def test_u_mode_path_with_and_without_prefix():
    u = uuid.uuid4()
    tail = encode_uuid_z85(u)
    assert dv_relative_path(tail) == f"deletion_vector_{u}.bin"
    assert dv_relative_path(f"ab{tail}") == f"ab/deletion_vector_{u}.bin"
    with pytest.raises(ValueError):
        dv_relative_path("short")


def test_inline_dv_padding_roundtrip():
    p = serialize_dv([0, 2, 7])  # length typically not a multiple of 4
    enc, size = encode_inline_dv(p)
    assert size == len(p)
    assert decode_inline_dv(enc, size) == p
    with pytest.raises(ValueError):
        decode_inline_dv(enc, size + 8)


def test_reader_handles_huge_run_cookie_container_count():
    """>= 32769 containers set the run cookie's sign bit; a signed read
    would compute a NEGATIVE count and silently decode an empty bitmap
    (resurrecting every deleted row on convert). 40000 single-value
    array containers under the run cookie must decode exactly."""
    n = 40_000
    cookie = (SERIAL_COOKIE | ((n - 1) << 16)) & 0xFFFFFFFF
    assert cookie >= 0x8000_0000  # the dangerous range
    out = bytearray(struct.pack("<I", cookie))
    out += bytes((n + 7) // 8)  # no run containers
    for k in range(n):
        out += struct.pack("<HH", k, 0)  # cardinality 1 each
    base = len(out) + 4 * n
    for k in range(n):
        out += struct.pack("<I", base + 2 * k)  # offset header (n >= 4)
    for k in range(n):
        out += struct.pack("<H", k % 7)
    payload = struct.pack("<iq", MAGIC_PORTABLE, 1) + struct.pack("<I", 0) + bytes(out)
    got = deserialize_dv(payload)
    assert len(got) == n
    assert got[:3] == [(0 << 16) | 0, (1 << 16) | 1, (2 << 16) | 2]
    assert got[-1] == ((n - 1) << 16) | ((n - 1) % 7)
