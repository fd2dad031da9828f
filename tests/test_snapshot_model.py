"""Model-based property test for the snapshot table format: random
operation sequences (append / overwrite / COW delete / merge-on-read
delete / merge upsert / compact / checkpointed stats / vacuum, plus —
round 9, VERDICT r8 #3 — the write-audit-publish ops: stage+publish,
stage+audit-block+discard under interleaved vacuum, stage+discard)
applied both to a real snapshot table AND to a trivial in-memory dict
model; WAP invariants: readers NEVER see staged files, and
discard∘stage ≡ id (including with a vacuum while the stage is live);
after every step the table's full read must equal the model, and
stats-backed predicate scans must equal brute-force filters.

This is the natural extension of the concurrent-writer race test (the
repo's best bug-finder): the race test stresses one operation's
atomicity, this stresses the FORMAT'S algebra — especially the round-6
two-level stats log, whose sidecar carrying/pruning and file-list-from-
stats-keys derivation must stay coherent across every DML interleaving.
Seeds are fixed, so failures replay deterministically.
"""

from __future__ import annotations

import random

import pytest

pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from azure_etl_spark.sources import snapshot as snap


def _rows_df(spark, rows):
    return spark.createDataFrame(
        [(k, v, k % 3) for k, v in rows.items()],
        "id long, val long, bucket long",
    )


def _read_state(spark, path):
    df = snap.read_snapshot(spark, path)
    return {r["id"]: r["val"] for r in df.collect()}


def _apply_random_op(spark, path, model, rng, next_id):
    """One random operation on both the table and the model; returns
    the op label (for failure diagnostics) and the next fresh id."""
    op = rng.choice(
        ["append", "append", "overwrite", "delete_cow", "delete_mor",
         "delete_pos", "merge", "compact", "vacuum",
         "wap_publish", "wap_blocked", "wap_discard"]
    )
    if op == "append" or (op == "overwrite" and not model):
        n = rng.randint(1, 6)
        fresh = {next_id + i: rng.randint(0, 99) for i in range(n)}
        snap.write_snapshot(
            _rows_df(spark, fresh), path,
            mode="append" if snap.is_snapshot_table(spark, path) else "overwrite",
        )
        model.update(fresh)
        return f"append({n})", next_id + n
    if op == "overwrite":
        n = rng.randint(1, 6)
        fresh = {next_id + i: rng.randint(0, 99) for i in range(n)}
        snap.write_snapshot(_rows_df(spark, fresh), path, mode="overwrite")
        model.clear()
        model.update(fresh)
        return f"overwrite({n})", next_id + n
    if not model:
        return "noop", next_id
    if op == "delete_cow":
        cut = rng.choice(sorted(model))
        snap.delete_from_snapshot(spark, path, [("id", "<=", cut)])
        for k in [k for k in model if k <= cut]:
            del model[k]
        return f"delete_cow(<={cut})", next_id
    if op == "delete_mor":
        cut = rng.choice(sorted(model))
        snap.delete_from_snapshot(
            spark, path, [("id", ">=", cut)], mode="merge_on_read"
        )
        for k in [k for k in model if k >= cut]:
            del model[k]
        return f"delete_mor(>={cut})", next_id
    if op == "delete_pos":
        # positional delete (the deletion-vector shape): pick a live
        # file, learn its physical (row_index -> id) mapping, mask up
        # to 2 positions. Masking an already-deleted row is idempotent
        # on both the table and the model.
        m = snap._load_manifest(spark, path, snap._resolve_version(spark, path, None))
        files = snap._manifest_files(spark, path, m)[0]
        f = rng.choice(sorted(files))
        rows = (
            spark.read.parquet(f"{path}/{f}")
            .select(F.col("id"), F.col("_metadata.row_index").alias("p"))
            .collect()
        )
        if not rows:
            return "noop", next_id
        picked = rng.sample(rows, k=min(2, len(rows)))
        snap.delete_positions_from_snapshot(
            spark, path, {f: [int(r["p"]) for r in picked]}
        )
        for r in picked:
            model.pop(r["id"], None)
        return f"delete_pos({len(picked)})", next_id
    if op == "merge":
        # update half the surviving ids, insert two fresh ones
        upd = {k: rng.randint(100, 199) for k in sorted(model)[::2]}
        ins = {next_id: rng.randint(100, 199), next_id + 1: rng.randint(100, 199)}
        src = {**upd, **ins}
        snap.merge_snapshot(spark, path, _rows_df(spark, src), key_cols=["id"])
        model.update(src)
        return f"merge({len(upd)}u+{len(ins)}i)", next_id + 2
    if op == "compact":
        snap.compact_snapshot(spark, path)
        return "compact", next_id
    if op == "wap_publish":
        # stage -> audit passes -> publish: only then does the model see it
        n = rng.randint(1, 4)
        fresh = {next_id + i: rng.randint(0, 99) for i in range(n)}
        sid = snap.stage_snapshot_commit(_rows_df(spark, fresh), path)
        # invariant: readers never see staged files (model unchanged)
        assert _read_state(spark, path) == model, f"staged rows leaked ({sid})"
        snap.publish_staged_commit(
            spark, path, sid, expectations={"val_sane": F.col("val") < 1000}
        )
        model.update(fresh)
        return f"wap_publish({n})", next_id + n
    if op == "wap_blocked":
        # stage BAD rows -> audit blocks publish -> stage left intact
        # (and invisible) -> discard == identity, even with a vacuum
        # interleaved while the stage is live
        bad = {next_id: 5000, next_id + 1: 6000}
        sid = snap.stage_snapshot_commit(_rows_df(spark, bad), path)
        assert _read_state(spark, path) == model, f"staged rows leaked ({sid})"
        try:
            snap.publish_staged_commit(
                spark, path, sid,
                expectations={"val_sane": F.col("val") < 1000},
            )
            raise AssertionError("audit gate let violating rows publish")
        except snap.SnapshotConstraintError:
            pass
        snap.vacuum_snapshots(spark, path, keep_last=2, min_age_s=0.0)
        # the stage must survive the vacuum and still be discardable
        snap.discard_staged_commit(spark, path, sid)
        return "wap_blocked", next_id + 2
    if op == "wap_discard":
        # stage GOOD rows, then discard without publishing: identity
        fresh = {next_id: rng.randint(0, 99)}
        sid = snap.stage_snapshot_commit(_rows_df(spark, fresh), path)
        assert _read_state(spark, path) == model, f"staged rows leaked ({sid})"
        snap.discard_staged_commit(spark, path, sid)
        return "wap_discard", next_id + 1
    snap.vacuum_snapshots(spark, path, keep_last=2, min_age_s=0.0)
    return "vacuum", next_id


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_random_op_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"model_{seed}")
    model: dict[int, int] = {}
    next_id = 0
    trace = []
    for step in range(12):
        label, next_id = _apply_random_op(spark, path, model, rng, next_id)
        trace.append(label)
        if not snap.is_snapshot_table(spark, path):
            continue
        got = _read_state(spark, path)
        assert got == model, f"seed={seed} step={step} trace={trace}"
        # stats-backed predicate scan == brute-force filter of the model
        if model:
            cut = rng.choice(sorted(model))
            scan = {
                r["id"]: r["val"]
                for r in snap.read_snapshot(
                    spark, path, where=[("id", ">=", cut)]
                ).collect()
            }
            want = {k: v for k, v in model.items() if k >= cut}
            assert scan == want, f"seed={seed} step={step} where>={cut} trace={trace}"


def test_long_append_chain_with_interleaved_dml_and_checkpoints(spark, tmp_path):
    """A chain long enough to cross multiple stats checkpoints, with
    deletes and a compact in the middle: the two-level log must keep
    every read and every pruned scan exact."""
    path = str(tmp_path / "chain")
    model: dict[int, int] = {}
    for i in range(20):  # > _STATS_CHECKPOINT_EVERY appends
        fresh = {i * 10 + j: i for j in range(3)}
        snap.write_snapshot(
            _rows_df(spark, fresh), path,
            mode="append" if i else "overwrite",
        )
        model.update(fresh)
        if i == 9:
            snap.delete_from_snapshot(spark, path, [("id", "<", 30)])
            model = {k: v for k, v in model.items() if k >= 30}
        if i == 14:
            snap.compact_snapshot(spark, path)
    assert _read_state(spark, path) == model
    m = snap._load_manifest(spark, path, snap._resolve_version(spark, path, None))
    assert m["stats"] == {} and any("ckpt" in r for r in m.get("stats_refs", []))
    files, stats = snap._manifest_files(spark, path, m)
    assert set(files) <= set(stats)  # file list derivable from stats keys
    scan = {
        r["id"]: r["val"]
        for r in snap.read_snapshot(spark, path, where=[("id", ">=", 150)]).collect()
    }
    assert scan == {k: v for k, v in model.items() if k >= 150}


@pytest.mark.parametrize("seed", [404, 505])
def test_random_op_sequences_keep_delta_mirror_faithful(spark, tmp_path, seed):
    """Round-9 composition property: arm the _delta_log mirror on the
    model table and random-walk the SAME op vocabulary (appends,
    overwrites, COW + MOR deletes, merges, compacts, vacuums, WAP) —
    after EVERY step (merge-on-read tips included — round 10 expresses
    them as deletion vectors), replaying the exported Delta log must
    name EXACTLY the table's live file set, and reading those parquet
    files under the log's DV masks must equal the dict model. This is
    the composition stress for the DV exporter: entries appearing,
    narrowing (COW carries), vanishing (compact/restore/overwrite),
    stacking (several MOR commits on one file), and interleaving with
    vacuum + WAP, each mirrored by the commit hook alone."""
    from azure_etl_spark.sources.delta_export import (
        _decode_deletion_vector,
        export_delta_log,
        replay_delta_log,
    )

    rng = random.Random(seed)
    path = str(tmp_path / f"mirror_{seed}")
    model: dict[int, int] = {}
    next_id = 0
    # seed commit + arm
    fresh = {next_id + i: rng.randint(0, 99) for i in range(4)}
    snap.write_snapshot(_rows_df(spark, fresh), path)
    model.update(fresh)
    next_id += 4
    export_delta_log(spark, path)
    trace = []
    root = path.rstrip("/")
    for step in range(10):
        label, next_id = _apply_random_op(spark, path, model, rng, next_id)
        trace.append(label)
        state = replay_delta_log(spark, path)
        want_files = set(snap.resolve_scan(spark, path)[0])
        assert set(state["live"]) == want_files, (
            f"seed={seed} step={step} trace={trace}"
        )
        got: dict[int, int] = {}
        for rel in sorted(state["live"]):
            add = state["live"][rel]
            df = spark.read.parquet(f"{root}/{rel}").select(
                "id", "val", F.col("_metadata.row_index").alias("__p")
            )
            dv = add.get("deletionVector")
            masked = set(_decode_deletion_vector(spark, path, dv)) if dv else set()
            for r in df.collect():
                if int(r["__p"]) not in masked:
                    got[r["id"]] = r["val"]
        assert got == model, f"seed={seed} step={step} trace={trace}"
