"""Deletion-vector interop: converting real Delta tables whose live
files carry DVs (u-mode file-backed and i-mode inline), and the honest
refusals around them. Fixtures are hand-built from the PUBLIC protocol
layout only (delta-io PROTOCOL.md), since delta-spark itself is
environment-blocked."""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from azure_etl_spark.sources.delta_export import (
    DELTA_LOG_DIR,
    convert_from_delta_log,
    export_delta_log,
    replay_delta_log,
)
from azure_etl_spark.sources.roaring import (
    dv_file_bytes,
    encode_inline_dv,
    encode_uuid_z85,
    serialize_dv,
)
from azure_etl_spark.sources.snapshot import (
    SnapshotVersionError,
    _load_manifest,
    compact_snapshot,
    read_snapshot,
    snapshot_history,
    write_snapshot,
)


def _write_parquet(path: str, ids: range) -> int:
    """One data file with ascending ids — physical row order == id
    order, so DV positions map 1:1 to ids. Returns the row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "id": pa.array(list(ids), type=pa.int64()),
            "val": pa.array([i * 10 for i in ids], type=pa.int64()),
        }
    )
    pq.write_table(tbl, path)
    return len(ids)


def _dv_delta_fixture(spark, tmp_path, name="dvtbl"):
    """Two-file Delta table, reader v3 with the deletionVectors
    feature: file A (ids 0-49) has a u-mode on-disk DV masking rows
    0 and 3; file B (ids 50-99) has an i-mode inline DV masking its
    last row (id 99)."""
    path = str(tmp_path / name)
    os.makedirs(os.path.join(path, DELTA_LOG_DIR))

    fa, fb = "part-00000-aaaa.parquet", "part-00001-bbbb.parquet"
    _write_parquet(os.path.join(path, fa), range(0, 50))
    _write_parquet(os.path.join(path, fb), range(50, 100))

    # u-mode DV for file A
    payload_a = serialize_dv([0, 3])
    raw, offsets = dv_file_bytes([payload_a])
    u = uuid.uuid4()
    os.makedirs(os.path.join(path, "ab"), exist_ok=True)
    with open(os.path.join(path, "ab", f"deletion_vector_{u}.bin"), "wb") as f:
        f.write(raw)
    dv_a = {
        "storageType": "u",
        "pathOrInlineDv": "ab" + encode_uuid_z85(u),
        "offset": offsets[0],
        "sizeInBytes": len(payload_a),
        "cardinality": 2,
    }
    # i-mode inline DV for file B: mask its row 49 (id 99)
    payload_b = serialize_dv([49])
    enc, size = encode_inline_dv(payload_b)
    dv_b = {
        "storageType": "i",
        "pathOrInlineDv": enc,
        "sizeInBytes": size,
        "cardinality": 1,
    }

    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "val", "type": "long", "nullable": True, "metadata": {}},
        ],
    }
    actions = [
        {"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }},
        {"metaData": {
            "id": "99999999-8888-7777-6666-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.enableDeletionVectors": "true"},
            "createdTime": 1700000000000,
        }},
        {"add": {
            "path": fa, "partitionValues": {}, "dataChange": True,
            "size": os.path.getsize(os.path.join(path, fa)),
            "modificationTime": 1700000000000,
            "stats": json.dumps({"numRecords": 50,
                                 "minValues": {"id": 0}, "maxValues": {"id": 49}}),
            "deletionVector": dv_a,
        }},
        {"add": {
            "path": fb, "partitionValues": {}, "dataChange": True,
            "size": os.path.getsize(os.path.join(path, fb)),
            "modificationTime": 1700000000000,
            "stats": json.dumps({"numRecords": 50,
                                 "minValues": {"id": 50}, "maxValues": {"id": 99}}),
            "deletionVector": dv_b,
        }},
    ]
    with open(os.path.join(path, DELTA_LOG_DIR, f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a, sort_keys=True) for a in actions))
    return path


def test_convert_dv_table(spark, tmp_path):
    path = _dv_delta_fixture(spark, tmp_path)
    assert convert_from_delta_log(spark, path) == 0
    got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
    assert got == sorted(set(range(100)) - {0, 3, 99})
    # the DVs became ONE positional MOR entry at v0 — zero data rewritten
    m = _load_manifest(spark, path, 0)
    entries = m["deletes"]
    assert len(entries) == 1 and "positions_dir" in entries[0]
    assert len(entries[0]["files"]) == 2
    # the .bin file is an inert orphan, still on disk but never read
    assert any("deletion_vector_" in f for f in os.listdir(os.path.join(path, "ab")))


def test_convert_dv_then_engine_dml(spark, tmp_path):
    """Post-convert the table is a first-class snapshot table: appends
    stack on top of the adopted DV mask, compaction materializes it."""
    path = _dv_delta_fixture(spark, tmp_path, name="dvtbl2")
    convert_from_delta_log(spark, path)
    write_snapshot(
        spark.range(100, 110).select(F.col("id"), (F.col("id") * 10).alias("val")),
        path,
        mode="append",
    )
    got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
    assert got == sorted(set(range(110)) - {0, 3, 99})
    compact_snapshot(spark, path, target_file_bytes=1 << 30)
    tip = snapshot_history(spark, path).agg(F.max("version")).collect()[0][0]
    assert _load_manifest(spark, path, tip)["deletes"] == []
    got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
    assert got == sorted(set(range(110)) - {0, 3, 99})


def test_convert_dv_cardinality_mismatch_refuses(spark, tmp_path):
    path = _dv_delta_fixture(spark, tmp_path, name="dvbad")
    log = os.path.join(path, DELTA_LOG_DIR, f"{0:020d}.json")
    lines = open(log).read().splitlines()
    patched = []
    for ln in lines:
        a = json.loads(ln)
        if "add" in a and a["add"].get("deletionVector", {}).get("storageType") == "i":
            a["add"]["deletionVector"]["cardinality"] = 7
        patched.append(json.dumps(a, sort_keys=True))
    open(log, "w").write("\n".join(patched))
    with pytest.raises(SnapshotVersionError, match="cardinality"):
        convert_from_delta_log(spark, path)


def test_convert_still_refuses_unknown_reader_features(spark, tmp_path):
    path = _dv_delta_fixture(spark, tmp_path, name="dvunknown")
    log = os.path.join(path, DELTA_LOG_DIR, f"{0:020d}.json")
    lines = open(log).read().splitlines()
    patched = []
    for ln in lines:
        a = json.loads(ln)
        if "protocol" in a:
            a["protocol"]["readerFeatures"] = ["deletionVectors", "variantType"]
        patched.append(json.dumps(a, sort_keys=True))
    open(log, "w").write("\n".join(patched))
    with pytest.raises(SnapshotVersionError, match="variantType"):
        convert_from_delta_log(spark, path)


@pytest.mark.slow
def test_dv_full_round_trip(spark, tmp_path):
    """The complete migration loop with live MOR state: snapshot table
    with predicate + equality + positional deletes -> export (real DV
    files, reader-3 protocol) -> adopt the exported tree as a FOREIGN
    Delta table (manifests stripped) -> convert -> identical rows."""
    import shutil

    from azure_etl_spark.sources.snapshot import (
        MANIFEST_DIR,
        delete_from_snapshot,
        delete_keys_from_snapshot,
        delete_positions_from_snapshot,
    )

    src = str(tmp_path / "src")
    for lo, mode in ((0, "overwrite"), (40, "append"), (80, "append")):
        df = (
            spark.range(lo, lo + 40)
            .select(F.col("id"), (F.col("id") % 7).alias("grp"))
            .coalesce(1)
            .sortWithinPartitions("id")
        )
        write_snapshot(df, src, mode=mode)
    delete_from_snapshot(spark, src, [("id", "between", (10, 15))], mode="merge_on_read")
    keys = spark.createDataFrame([(77,), (101,)], "id long")
    delete_keys_from_snapshot(spark, src, keys, ["id"])
    m = _load_manifest(
        spark, src,
        snapshot_history(spark, src).agg(F.max("version")).collect()[0][0],
    )
    from azure_etl_spark.sources.snapshot import _manifest_files

    some_file = sorted(_manifest_files(spark, src, m)[0])[0]
    delete_positions_from_snapshot(spark, src, {some_file: [2]})
    export_delta_log(spark, src)
    expected = sorted(
        (r["id"], r["grp"]) for r in read_snapshot(spark, src).collect()
    )

    dst = str(tmp_path / "dst")
    shutil.copytree(src, dst)
    shutil.rmtree(os.path.join(dst, MANIFEST_DIR))
    shutil.rmtree(os.path.join(dst, "deletes"), ignore_errors=True)
    assert convert_from_delta_log(spark, dst) == 0
    got = sorted((r["id"], r["grp"]) for r in read_snapshot(spark, dst).collect())
    assert got == expected
    # replay of the source log agrees too (DV descriptors live at tip)
    state = replay_delta_log(spark, src)
    assert sum(
        a["deletionVector"]["cardinality"]
        for a in state["live"].values()
        if a.get("deletionVector")
    ) == 120 - len(expected)


def test_mirror_extends_with_dv_commits(spark, tmp_path):
    """The armed mirror exports each MOR commit incrementally. A second
    MOR delete on an already-DV'd file must re-add it with the UNION
    bitmap and a remove carrying the superseded descriptor — the
    walk-back recovers the previously-expressed DVs from the exported
    log itself; an append in between must not re-add unchanged DVs."""
    from azure_etl_spark.sources.delta_export import _decode_deletion_vector
    from azure_etl_spark.sources.snapshot import delete_from_snapshot

    path = str(tmp_path / "tbl")
    df = (
        spark.range(0, 100)
        .select(F.col("id"), (F.col("id") % 5).alias("grp"))
        .coalesce(1)
        .sortWithinPartitions("id")
    )
    write_snapshot(df, path)
    export_delta_log(spark, path)  # arm the mirror

    delete_from_snapshot(spark, path, [("id", "between", (3, 7))], mode="merge_on_read")
    delta_dir = os.path.join(path, DELTA_LOG_DIR)
    logs = sorted(f for f in os.listdir(delta_dir) if f.endswith(".json"))
    assert len(logs) == 2  # hook exported the MOR commit

    # an append changes no DVs: no re-adds of the DV'd file
    write_snapshot(
        spark.range(100, 120).select(F.col("id"), (F.col("id") % 5).alias("grp")),
        path,
        mode="append",
    )
    logs = sorted(f for f in os.listdir(delta_dir) if f.endswith(".json"))
    acts = [
        json.loads(ln)
        for ln in open(os.path.join(delta_dir, logs[-1])).read().splitlines()
        if ln.strip()
    ]
    assert not any("remove" in a for a in acts)
    assert not any(a["add"].get("deletionVector") for a in acts if "add" in a)

    # a second MOR delete on the same file: union bitmap, superseded
    # descriptor on the remove
    delete_from_snapshot(spark, path, [("id", "=", 50)], mode="merge_on_read")
    logs = sorted(f for f in os.listdir(delta_dir) if f.endswith(".json"))
    acts = [
        json.loads(ln)
        for ln in open(os.path.join(delta_dir, logs[-1])).read().splitlines()
        if ln.strip()
    ]
    rms = [a["remove"] for a in acts if "remove" in a]
    adds = [a["add"] for a in acts if "add" in a]
    assert len(rms) == 1 and len(adds) == 1
    assert rms[0].get("deletionVector"), "remove must carry the superseded DV"
    assert adds[0]["deletionVector"]["cardinality"] == 6  # {3..7} + {50}
    old = set(_decode_deletion_vector(spark, path, rms[0]["deletionVector"]))
    new = set(_decode_deletion_vector(spark, path, adds[0]["deletionVector"]))
    assert len(old) == 5 and old < new and len(new - old) == 1

    from azure_etl_spark.sources.snapshot import resolve_scan

    state = replay_delta_log(spark, path)
    assert set(state["live"]) == set(resolve_scan(spark, path)[0])
    got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
    assert got == sorted(set(range(120)) - {3, 4, 5, 6, 7, 50})


def _sidecar_schema():
    import pyarrow as pa

    str_map = pa.map_(pa.string(), pa.string())
    dv = pa.struct([("storageType", pa.string()),
                    ("pathOrInlineDv", pa.string()),
                    ("offset", pa.int32()),
                    ("sizeInBytes", pa.int32()),
                    ("cardinality", pa.int64())])
    return pa.schema([
        ("add", pa.struct([("path", pa.string()),
                           ("partitionValues", str_map),
                           ("size", pa.int64()),
                           ("modificationTime", pa.int64()),
                           ("dataChange", pa.bool_()),
                           ("stats", pa.string()),
                           ("deletionVector", dv)])),
        ("remove", pa.struct([("path", pa.string()),
                              ("deletionTimestamp", pa.int64()),
                              ("dataChange", pa.bool_())])),
    ])


def _v2_checkpoint_fixture(spark, tmp_path, name, with_dv=False):
    """Foreign Delta table whose state at v1 lives ONLY in a V2 spec
    checkpoint (json manifest + parquet sidecars under
    _delta_log/_sidecars/); 0.json and 1.json are absent, so a reader
    that cannot seed from the v2 checkpoint cannot open the table.
    A 2.json append follows the checkpoint."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / name)
    sidecars = os.path.join(path, DELTA_LOG_DIR, "_sidecars")
    os.makedirs(sidecars)
    fa, fb, fc = (f"part-0000{i}-v2fix.parquet" for i in range(3))
    _write_parquet(os.path.join(path, fa), range(0, 30))
    _write_parquet(os.path.join(path, fb), range(30, 60))
    _write_parquet(os.path.join(path, fc), range(60, 80))

    def _add(fname, lo, hi, dv=None):
        a = {"path": fname, "partitionValues": [], "dataChange": True,
             "size": os.path.getsize(os.path.join(path, fname)),
             "modificationTime": 1700000000000,
             "stats": json.dumps({"numRecords": hi - lo,
                                  "minValues": {"id": lo},
                                  "maxValues": {"id": hi - 1}}),
             "deletionVector": dv}
        return {"add": a, "remove": None}

    dv_b = None
    if with_dv:
        enc, size = encode_inline_dv(serialize_dv([0, 1]))  # ids 30, 31
        dv_b = {"storageType": "i", "pathOrInlineDv": enc,
                "offset": None, "sizeInBytes": size, "cardinality": 2}
    sc1, sc2 = "sc-aaaa.parquet", "sc-bbbb.parquet"
    pq.write_table(
        pa.Table.from_pylist([_add(fa, 0, 30)], schema=_sidecar_schema()),
        os.path.join(sidecars, sc1),
    )
    pq.write_table(
        pa.Table.from_pylist([_add(fb, 30, 60, dv_b)], schema=_sidecar_schema()),
        os.path.join(sidecars, sc2),
    )

    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "val", "type": "long", "nullable": True, "metadata": {}},
        ],
    }
    features = ["v2Checkpoint"] + (["deletionVectors"] if with_dv else [])
    manifest_actions = [
        {"checkpointMetadata": {"version": 1, "tags": {}}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": features,
                      "writerFeatures": features}},
        {"metaData": {
            "id": "123e4567-e89b-42d3-a456-426614174000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [], "configuration": {},
            "createdTime": 1700000000000,
        }},
        {"txn": {"appId": "upstream-app", "version": 9}},
        {"sidecar": {"path": sc1, "sizeInBytes": 1, "modificationTime": 0}},
        {"sidecar": {"path": sc2, "sizeInBytes": 1, "modificationTime": 0}},
    ]
    ckpt = os.path.join(
        path, DELTA_LOG_DIR, f"{1:020d}.checkpoint.80a083e8-7026.json"
    )
    with open(ckpt, "w") as f:
        f.write("\n".join(json.dumps(a, sort_keys=True) for a in manifest_actions))
    with open(os.path.join(path, DELTA_LOG_DIR, "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": 1, "size": len(manifest_actions)}))
    # a JSON commit after the checkpoint: appends fc
    with open(os.path.join(path, DELTA_LOG_DIR, f"{2:020d}.json"), "w") as f:
        f.write(json.dumps(_fc_add(path, fc), sort_keys=True))
    return path


def _fc_add(path, fc):
    return {"add": {
        "path": fc, "partitionValues": {}, "dataChange": True,
        "size": os.path.getsize(os.path.join(path, fc)),
        "modificationTime": 1700000000000,
        "stats": json.dumps({"numRecords": 20,
                             "minValues": {"id": 60}, "maxValues": {"id": 79}}),
    }}


def test_convert_v2_checkpoint(spark, tmp_path):
    """A table whose pre-checkpoint commits are GONE converts by
    seeding from the V2 checkpoint (json manifest + parquet sidecars)
    and replaying the post-checkpoint json commit; txn watermarks from
    the checkpoint carry into the snapshot ledger."""
    path = _v2_checkpoint_fixture(spark, tmp_path, "v2tbl")
    assert convert_from_delta_log(spark, path) == 0
    got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
    assert got == list(range(80))
    m = _load_manifest(spark, path, 0)
    assert m["txns"] == {"upstream-app": 9}


def test_convert_v2_checkpoint_with_dv_sidecar(spark, tmp_path):
    """Feature composition: v2Checkpoint + deletionVectors — a
    sidecar add carrying an inline DV converts to the positional MOR
    entry, masked at read."""
    path = _v2_checkpoint_fixture(spark, tmp_path, "v2dv", with_dv=True)
    assert convert_from_delta_log(spark, path) == 0
    got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
    assert got == sorted(set(range(80)) - {30, 31})


def test_convert_timestamp_ntz_feature(spark, tmp_path):
    """timestampNtz is a pure type feature — Spark reads the parquet
    natively, so a reader-v3 table declaring it converts."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "ntz")
    os.makedirs(os.path.join(path, DELTA_LOG_DIR))
    fname = "part-00000-cccc.parquet"
    tbl = pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array(
            [datetime.datetime(2024, 1, 1, 12), datetime.datetime(2024, 6, 1, 7)],
            type=pa.timestamp("us"),  # no timezone = NTZ semantics
        ),
    })
    pq.write_table(tbl, os.path.join(path, fname))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "ts", "type": "timestamp_ntz", "nullable": True, "metadata": {}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["timestampNtz"],
                      "writerFeatures": ["timestampNtz"]}},
        {"metaData": {
            "id": "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [], "configuration": {},
            "createdTime": 1700000000000,
        }},
        {"add": {"path": fname, "partitionValues": {}, "dataChange": True,
                 "size": os.path.getsize(os.path.join(path, fname)),
                 "modificationTime": 1700000000000,
                 "stats": json.dumps({"numRecords": 2})}},
    ]
    with open(os.path.join(path, DELTA_LOG_DIR, f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a, sort_keys=True) for a in actions))
    convert_from_delta_log(spark, path)
    out = read_snapshot(spark, path)
    assert out.count() == 2
    assert dict(out.dtypes)["ts"].startswith("timestamp")


def test_dv_export_partitioned_table(spark, tmp_path):
    """DV export on a hive-partitioned snapshot table: re-adds keep
    their partitionValues, the DV masks apply per covered file, and the
    full adopt-as-foreign-Delta round trip preserves both partitions
    and masked rows."""
    import shutil

    from azure_etl_spark.sources.snapshot import MANIFEST_DIR, delete_from_snapshot

    src = str(tmp_path / "psrc")
    df = spark.range(0, 90).select(
        F.col("id"), (F.col("id") % 3).alias("bucket"), (F.col("id") * 2).alias("val")
    )
    write_snapshot(df, src, partition_by=["bucket"])
    delete_from_snapshot(spark, src, [("id", "between", (10, 20))], mode="merge_on_read")
    export_delta_log(spark, src)
    logs = sorted(
        f for f in os.listdir(os.path.join(src, DELTA_LOG_DIR)) if f.endswith(".json")
    )
    acts = [
        json.loads(ln)
        for ln in open(os.path.join(src, DELTA_LOG_DIR, logs[-1])).read().splitlines()
        if ln.strip()
    ]
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and all(a.get("deletionVector") for a in adds)
    assert all(a["partitionValues"].get("bucket") in {"0", "1", "2"} for a in adds)

    expected = sorted(
        (r["id"], r["bucket"]) for r in read_snapshot(spark, src).collect()
    )
    dst = str(tmp_path / "pdst")
    shutil.copytree(src, dst)
    shutil.rmtree(os.path.join(dst, MANIFEST_DIR))
    shutil.rmtree(os.path.join(dst, "deletes"), ignore_errors=True)
    convert_from_delta_log(spark, dst)
    got = sorted((r["id"], r["bucket"]) for r in read_snapshot(spark, dst).collect())
    assert got == expected
    assert not any(10 <= i <= 20 for i, _b in got)


def test_dv_mirror_on_special_char_partitions(spark, tmp_path):
    """DV export + incremental mirror resume on a table partitioned by
    values with spaces and '+': bookkeeping keys are LITERAL paths on
    both the in-run and the resume (log-replay) sides, so a second MOR
    delete re-adds with the UNION bitmap and a remove carrying the
    superseded descriptor — and the masked replay equals the table."""
    from azure_etl_spark.sources.delta_export import _decode_deletion_vector
    from azure_etl_spark.sources.snapshot import delete_from_snapshot

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, "North America" if i < 10 else "EMEA+APAC", i * 10) for i in range(20)],
        "id long, region string, val long",
    ).coalesce(1).sortWithinPartitions("id")
    write_snapshot(df, path, partition_by=["region"])
    export_delta_log(spark, path)  # arm
    delete_from_snapshot(spark, path, [("id", "between", (2, 4))], mode="merge_on_read")
    # resume path: entries change again -> recovery decodes prior DVs;
    # same covered file, so the new commit SUPERSEDES its DV
    delete_from_snapshot(spark, path, [("id", "=", 7)], mode="merge_on_read")

    state = replay_delta_log(spark, path)
    root = path.rstrip("/")
    got = set()
    for rel, add in state["live"].items():
        import pyarrow.parquet as pq
        from urllib.parse import unquote

        tbl = pq.read_table(f"{root}/{unquote(rel)}")
        masked = set()
        if add.get("deletionVector"):
            masked = set(_decode_deletion_vector(spark, path, add["deletionVector"]))
        for pos, i in enumerate(tbl["id"].to_pylist()):
            if pos not in masked:
                got.add(i)
    want = set(r["id"] for r in read_snapshot(spark, path).collect())
    assert got == want == set(range(20)) - {2, 3, 4, 7}
    # the second MOR commit superseded a DV: its remove carries it
    logs = sorted(
        f for f in os.listdir(os.path.join(path, DELTA_LOG_DIR)) if f.endswith(".json")
    )
    acts = [
        json.loads(ln)
        for ln in open(os.path.join(path, DELTA_LOG_DIR, logs[-1])).read().splitlines()
        if ln.strip()
    ]
    rms = [a["remove"] for a in acts if "remove" in a]
    assert rms and all(r.get("deletionVector") for r in rms)


def test_protocol_cache_resumes_exact(spark, tmp_path):
    """The sidecar caches the protocol the log ACTUALLY declares: a log
    armed without change-data (writer 2) gets the writer-4 upgrade
    action when CDF-enabled commits extend it, exactly once."""
    from azure_etl_spark.sources.snapshot import write_snapshot as _ws

    path = str(tmp_path / "tbl")
    _ws(
        spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("val")), path
    )
    export_delta_log(spark, path, change_data=False)
    logs_dir = os.path.join(path, DELTA_LOG_DIR)

    def _protos(name):
        return [
            json.loads(ln)["protocol"]
            for ln in open(os.path.join(logs_dir, name)).read().splitlines()
            if ln.strip() and "protocol" in json.loads(ln)
        ]

    names = sorted(f for f in os.listdir(logs_dir) if f.endswith(".json"))
    assert _protos(names[0]) == [{"minReaderVersion": 1, "minWriterVersion": 2}]
    # the commit hook extends with change_data=True (its default):
    # the cached writer-2 protocol forces the writer-4 upgrade action
    _ws(
        spark.range(5, 8).select(F.col("id"), (F.col("id") * 2).alias("val")),
        path,
        mode="append",
    )
    names = sorted(f for f in os.listdir(logs_dir) if f.endswith(".json"))
    assert _protos(names[1]) == [{"minReaderVersion": 1, "minWriterVersion": 4}]
    # ...and exactly once: the next commit emits no protocol action
    _ws(
        spark.range(8, 9).select(F.col("id"), (F.col("id") * 2).alias("val")),
        path,
        mode="append",
    )
    names = sorted(f for f in os.listdir(logs_dir) if f.endswith(".json"))
    assert _protos(names[2]) == []


def test_zero_match_mor_entry_keeps_reader1_protocol(spark, tmp_path):
    """A merge-on-read entry whose stats-scoped predicate matches NO
    actual rows produces no deletion vectors — the log must NOT
    upgrade to reader 3, or plain readers would be locked out of a
    table containing no DVs."""
    from azure_etl_spark.sources.snapshot import delete_from_snapshot

    path = str(tmp_path / "tbl")
    write_snapshot(
        spark.range(10).select(F.col("id"), (F.col("id") * 10).alias("val")),
        path,
    )
    export_delta_log(spark, path)
    # val stats cover [0,90] so the file is a candidate, but no row
    # has val=55 (values are multiples of 10)
    delete_from_snapshot(spark, path, [("val", "=", 55)], mode="merge_on_read")
    logs_dir = os.path.join(path, DELTA_LOG_DIR)
    names = sorted(f for f in os.listdir(logs_dir) if f.endswith(".json"))
    acts = [
        json.loads(ln)
        for ln in open(os.path.join(logs_dir, names[-1])).read().splitlines()
        if ln.strip()
    ]
    assert not any("protocol" in a for a in acts)
    assert not any("add" in a or "remove" in a for a in acts)
    state = replay_delta_log(spark, path)
    assert state["protocol"]["minReaderVersion"] == 1
    assert read_snapshot(spark, path).count() == 10
