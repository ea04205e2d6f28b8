"""delta_interop codecs: Z85, portable roaring bitmaps, DV framing.

Every decoder is exercised against bytes our own spec-conformant
encoders produce (round-trip — the strongest interop proof available
without network access) plus hand-crafted spec fixtures (run
containers, corrupted CRC/magic) the encoders never emit."""

import glob
import struct

import pytest

from dagster_delta_spark import delta_interop as di


def test_z85_round_trip():
    for data in [b"", b"\x01", b"hello world!", bytes(range(256))]:
        enc = di.z85_encode(data)
        assert di.z85_decode(enc)[:len(data)] == data
    with pytest.raises(di.DeltaInteropError, match="multiple of 5"):
        di.z85_decode("abc")
    with pytest.raises(di.DeltaInteropError, match="alphabet"):
        di.z85_decode('"' * 5)


def test_roaring_array_round_trips():
    import random

    random.seed(7)
    cases = [
        [],
        [0, 1, 5, 100],
        sorted(random.sample(range(70000), 5000)),  # bitset container
        [3, 65536 + 2, 65536 * 5 + 7],              # 16-bit key gaps
        [2 ** 32 + 5, 2 ** 33 + 1, 7],              # high-32 bitmap keys
        list(range(10000)),                          # dense bitset
    ]
    for vals in cases:
        data = di.serialize_roaring_array(vals)
        assert di.deserialize_roaring_array(data) == sorted(set(vals))
    with pytest.raises(di.DeltaInteropError, match="magic"):
        di.deserialize_roaring_array(b"\x00" * 12)
    with pytest.raises(di.DeltaInteropError, match="shorter"):
        di.deserialize_roaring_array(b"\x00\x01")


def test_run_container_decodes():
    # hand-crafted: cookie 12347, one run container [10, 14]
    n = 1
    cookie = ((n - 1) << 16) | 12347
    body = struct.pack("<I", cookie) + b"\x01"
    body += struct.pack("<HH", 0, 4)      # key 0, cardinality-1 = 4
    body += struct.pack("<H", 1)          # one run
    body += struct.pack("<HH", 10, 4)     # start 10, length+1 = 5
    arr = struct.pack("<iq", 1681511377, 1) + body
    assert di.deserialize_roaring_array(arr) == [10, 11, 12, 13, 14]


def test_inline_and_file_descriptors(tmp_path):
    d = di.inline_dv_descriptor([1, 3, 9, 70000])
    assert di.decode_deletion_vector("/nowhere", d) == [1, 3, 9, 70000]

    root = str(tmp_path)
    desc = di.write_dv_file(root, [0, 2, 4], prefix="ab")
    assert di.decode_deletion_vector(root, desc) == [0, 2, 4]
    big = di.write_dv_file(root, list(range(9000)))
    assert di.decode_deletion_vector(root, big) == list(range(9000))

    # corrupt the big file's trailing CRC byte
    target = di._dv_file_path(root, big["pathOrInlineDv"])
    blob = bytearray(open(target, "rb").read())
    blob[-1] ^= 0xFF
    open(target, "wb").write(bytes(blob))
    with pytest.raises(di.DeltaInteropError, match="checksum"):
        di.decode_deletion_vector(root, big)

    # version byte / size mismatch / unknown storage type
    blob[0] = 2
    open(target, "wb").write(bytes(blob))
    with pytest.raises(di.DeltaInteropError, match="version"):
        di.decode_deletion_vector(root, big)
    with pytest.raises(di.DeltaInteropError, match="size prefix"):
        di.decode_deletion_vector(root, {**desc, "sizeInBytes": 5})
    with pytest.raises(di.DeltaInteropError, match="storageType"):
        di.decode_deletion_vector(root, {**desc, "storageType": "q"})
    with pytest.raises(di.DeltaInteropError, match="cardinality"):
        di.decode_deletion_vector(
            "/nowhere", {**di.inline_dv_descriptor([1]),
                         "cardinality": 9})


def test_checkpoint_reader_rejects_multi_action_rows(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "cp.parquet")
    pq.write_table(pa.table({
        "txn": [{"appId": "a", "version": 1}],
        "add": [{"path": "x", "size": 1}],
    }), p)
    with pytest.raises(di.DeltaInteropError, match="exactly one"):
        di.read_checkpoint_actions(p)
    pq.write_table(pa.table({"other": [1]}), p)
    with pytest.raises(di.DeltaInteropError, match="action columns"):
        di.read_checkpoint_actions(p)
