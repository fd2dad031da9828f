#!/usr/bin/env python
"""Stress the snapshot format's optimistic-concurrency commit path
with CONCURRENT VACUUM (round 7; VERDICT r6 #6): the concurrent-writer
race test is the repo's best bug-finder, and round 7 added the vacuum
age guard specifically so a maintenance vacuum can run while writers
are mid-commit — this probe runs that exact mix repeatedly.

Per run: 4 writer threads race ``appends_per_writer`` appends each
through the optimistic protocol while a maintenance thread loops
``vacuum_snapshots(keep_last=5)`` (DEFAULT age guard — the point under
test: fresh in-flight sidecars/data dirs must survive) and a reader
thread re-reads the live table. Invariants checked per run: no thread
errors, every commit landed (contiguous versions), the final table
holds every writer's rows exactly once, and the final read resolves
all stats refs (no dangling sidecar).

    python tools/snapshot_race_probe.py [n_runs] [appends_per_writer] [dml] [mirror]
                                        # default 6 3; pass "dml" to add
                                        # looping OPTIMIZE + MERGE threads
                                        # (round-7 rebase-over-appends path:
                                        # a DML racing an append must carry
                                        # the appended files, or conflict and
                                        # retry — never drop them); pass
                                        # "mirror" (round 9) to arm the
                                        # _delta_log export hook on every
                                        # racing commit and assert the
                                        # replayed log equals the final scan
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from azure_etl_spark.session import get_session  # noqa: E402
from azure_etl_spark.sources import snapshot as snap  # noqa: E402

N_WRITERS = 4
ROWS_PER_APPEND = 10


def _keyed(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("tag"), (F.col("id") % 7).alias("val")
    )


def one_run(spark, run: int) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"race_probe_{run}_")
    path = os.path.join(tmp, "tbl")
    appends = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    snap.write_snapshot(_keyed(spark, 0, 10, "seed"), path)
    mirror = "mirror" in sys.argv[1:]
    if mirror:
        # round 9: arm the _delta_log mirror so EVERY racing commit
        # also exercises the post-commit export hook (racing exporters
        # settle via the same O_EXCL create; a hook that falls behind
        # must catch up, never corrupt)
        from azure_etl_spark.sources.delta_export import export_delta_log

        export_delta_log(spark, path)
    errors: list = []
    stop = threading.Event()
    vacuums = [0]

    def writer(w: int) -> None:
        try:
            for j in range(appends):
                lo = 1000 * (w + 1) + 100 * j
                snap.write_snapshot(
                    _keyed(spark, lo, lo + ROWS_PER_APPEND, f"w{w}"),
                    path,
                    mode="append",
                    max_retries=60,
                )
        except Exception as e:
            errors.append(("writer", w, repr(e)))

    def vacuumer() -> None:
        # DEFAULT min_age_s: in-flight debris younger than the guard
        # must survive; dropped-version manifests are still reclaimed
        while not stop.is_set():
            try:
                snap.vacuum_snapshots(spark, path, keep_last=5)
                vacuums[0] += 1
            except Exception as e:
                errors.append(("vacuum", -1, repr(e)))
            time.sleep(0.05)

    def reader() -> None:
        while not stop.is_set():
            try:
                snap.read_snapshot(spark, path).count()
            except Exception as e:
                if not snap._is_transient_read_error(e):
                    errors.append(("reader", -1, repr(e)))
            time.sleep(0.02)

    dml = len(sys.argv) > 3 and sys.argv[3] == "dml"
    dml_stats = {"compacts": 0, "merges": 0, "conflicts": 0}

    def compactor() -> None:
        # content-neutral DML: every compact racing an append must
        # rebase (appended dirs carried) or conflict-and-retry; a
        # dropped append shows up as missing rows at the end
        while not stop.is_set():
            try:
                snap.compact_snapshot(spark, path)
                dml_stats["compacts"] += 1
            except (snap.SnapshotConflictError, snap.SnapshotVersionError):
                # conflict-class: the tip moved (or the pinned version
                # was vacuumed) under the op — recompute next loop
                dml_stats["conflicts"] += 1
            except Exception as e:
                errors.append(("compact", -1, repr(e)))
            time.sleep(0.03)

    def merger() -> None:
        # count-neutral DML: upserts the 10 seed keys with a new tag —
        # updates only, so expected_rows is untouched
        i = 0
        while not stop.is_set():
            try:
                snap.merge_snapshot(
                    spark, path, _keyed(spark, 0, 10, f"m{i}"), ["id"]
                )
                dml_stats["merges"] += 1
                i += 1
            except (snap.SnapshotConflictError, snap.SnapshotVersionError):
                dml_stats["conflicts"] += 1
            except Exception as e:
                errors.append(("merge", -1, repr(e)))
            time.sleep(0.04)

    # write-audit-publish writer (round 8, VERDICT r7 #5): stages land
    # invisibly, good stages publish through the same optimistic loop
    # the appenders race, bad stages are blocked by the audit and
    # discarded WHILE vacuum loops (staged dirs must survive vacuum
    # until their explicit discard)
    wap_stats = {"published": 0, "blocked": 0, "discarded": 0, "conflicts": 0}
    WAP_ROWS = 5

    def wap_writer() -> None:
        i = 0
        rules = {"id_not_null": F.col("id").isNotNull()}
        while not stop.is_set():
            lo = 100_000 + WAP_ROWS * i
            try:
                if i % 3 == 2:
                    bad = _keyed(spark, lo, lo + WAP_ROWS, "wapbad").withColumn(
                        "id",
                        F.when(F.col("id") == lo, F.lit(None)).otherwise(
                            F.col("id")
                        ),
                    )
                    sid = snap.stage_snapshot_commit(bad, path)
                    try:
                        snap.publish_staged_commit(
                            spark, path, sid, expectations=rules
                        )
                        errors.append(("wap", i, "bad stage published"))
                    except snap.SnapshotConstraintError:
                        wap_stats["blocked"] += 1
                    snap.discard_staged_commit(spark, path, sid)
                    wap_stats["discarded"] += 1
                else:
                    sid = snap.stage_snapshot_commit(
                        _keyed(spark, lo, lo + WAP_ROWS, "wap"), path
                    )
                    snap.publish_staged_commit(
                        spark, path, sid, expectations=rules, max_retries=60
                    )
                    wap_stats["published"] += 1
            except (snap.SnapshotConflictError, snap.SnapshotVersionError):
                wap_stats["conflicts"] += 1
            except Exception as e:
                errors.append(("wap", i, repr(e)))
            i += 1
            time.sleep(0.03)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(N_WRITERS)]
    aux = [
        threading.Thread(target=vacuumer),
        threading.Thread(target=reader),
        threading.Thread(target=wap_writer),
    ]
    if dml:
        aux += [threading.Thread(target=compactor), threading.Thread(target=merger)]
    for t in aux + threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    for t in aux:
        t.join()

    n_commits = 1 + N_WRITERS * appends
    versions = snap._list_versions(spark, path)
    out = snap.read_snapshot(spark, path)  # resolves stats refs too
    n_rows = out.count()
    n_distinct = out.select("id").distinct().count()
    expected_rows = (
        10
        + N_WRITERS * appends * ROWS_PER_APPEND
        + wap_stats["published"] * WAP_ROWS  # unique ids per publish
    )
    ok = (
        not errors
        # WAP publishes (and DML commits when enabled) add versions on
        # top of the appends; the row invariants below are the
        # lost-update check
        and versions[-1] >= n_commits - 1
        and n_rows == expected_rows
        and n_distinct == expected_rows
    )
    mirror_state = None
    if mirror:
        # catch-up export (the hook is best-effort), then the replayed
        # live file set must equal the table's current scan exactly
        from azure_etl_spark.sources.delta_export import (
            export_delta_log,
            replay_delta_log,
        )

        try:
            caught_up = export_delta_log(spark, path)
            live = set(replay_delta_log(spark, path)["live"])
            want = set(snap.resolve_scan(spark, path)[0])
            mirror_state = {
                "caught_up_versions": len(caught_up),
                "live_matches_scan": live == want,
            }
            ok = ok and live == want
        except Exception as e:
            ok = False
            mirror_state = {"error": repr(e)}
    res = {
        "run": run,
        "ok": ok,
        "commits": n_commits,
        "final_version": versions[-1],
        "rows": n_rows,
        "expected_rows": expected_rows,
        "vacuum_passes": vacuums[0],
        "wap": wap_stats,
        **({"dml": dml_stats} if dml else {}),
        **({"mirror": mirror_state} if mirror else {}),
        "errors": errors[:5],
    }
    shutil.rmtree(tmp, ignore_errors=True)
    return res


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_session(app_name="snapshot-race-probe")
    spark.sparkContext.setLogLevel("ERROR")
    runs = [one_run(spark, r) for r in range(n_runs)]
    print(
        json.dumps(
            {
                "metric": "snapshot_race_with_vacuum",
                "n_runs": n_runs,
                "all_ok": all(r["ok"] for r in runs),
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
