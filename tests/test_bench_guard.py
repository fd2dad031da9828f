"""Guard-logic tests for tools/bench_guard.py (VERDICT r7 #2): a
uniformly loaded box must read as "uniform drift, 0 real flags", while
a planted single-query regression (the injected-sleep scenario — one
query slowed, calibration kernel untouched) must still flag, with or
without load on top."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from bench_guard import (  # noqa: E402
    KERNEL_REF_ROWS,
    KERNEL_REF_SEC,
    REFERENCE,
    evaluate,
    load_bench_payload,
)


def _line(scale: float = 1.0, load: float | None = None, bump: dict | None = None):
    """Synthesize a bench JSON dict: every reference query at
    ``scale``x its reference time, optional calibration block at
    ``load``x the quiet kernel, plus per-query overrides."""
    q = {name: round(ref * scale, 4) for name, ref in REFERENCE.items()}
    for name, sec in (bump or {}).items():
        q[name] = sec
    data = {"metric": "bench_headline_total", "queries": q, "sf": 0.1,
            "value": round(sum(q.values()), 3)}
    if load is not None:
        data["load"] = {
            "kernel_rows": KERNEL_REF_ROWS,
            "kernel_sec": [round(KERNEL_REF_SEC * load, 4)] * 30,
            "kernel_median_sec": round(KERNEL_REF_SEC * load, 4),
        }
    return data


def test_load_bench_payload_accepts_every_artifact_shape():
    """Round-9 ADVICE fix: the guard must consume the driver's
    pretty-printed BENCH_r0N.json wrapper AS-IS (it spans many lines,
    so the old last-line parse crashed on '}'), in all three shapes:
    raw bench line, wrapper with 'parsed', wrapper with only a 'tail'
    stdout capture containing the bench line."""
    import json

    bench = _line(scale=1.0, load=1.0)
    raw = json.dumps(bench)
    assert load_bench_payload(raw) == bench
    # log-file shape: noise lines, bench JSON last
    assert load_bench_payload("starting...\nWARN foo\n" + raw) == bench
    wrapper = {"n": 9, "rc": 0, "cpus": 32, "sf": 0.1,
               "tail": "[Stage 12:==>]\r\r" + raw + "\n", "parsed": bench}
    assert load_bench_payload(json.dumps(wrapper, indent=2)) == bench
    del wrapper["parsed"]
    assert load_bench_payload(json.dumps(wrapper, indent=2)) == bench
    # round-10 ADVICE: a wrapper where the driver FAILED to parse the
    # bench line ships "parsed": null — must fall through to tail
    # recovery, not return None
    wrapper["parsed"] = None
    assert load_bench_payload(json.dumps(wrapper, indent=2)) == bench


def test_clean_run_no_flags():
    r = evaluate(_line(scale=1.0, load=1.0))
    assert r["offenders"] == []
    assert r["load_index"] == 1.0
    assert abs(r["median_ratio"] - 1.0) < 0.01


def test_uniform_load_is_drift_not_regressions():
    """The BENCH_r07 failure mode: everything 2.2x slower because the
    box was busy. The kernel says so; the guard must report zero real
    flags and a ~2.2x load index."""
    r = evaluate(_line(scale=2.2, load=2.2))
    assert r["offenders"] == [], r["offenders"]
    assert 2.0 < r["load_index"] < 2.5
    assert r["median_ratio"] < 1.1  # normalized back to ~1x


def test_planted_regression_survives_load_normalization():
    """One query slowed 8x (injected sleep) on a 2.2x-loaded box: the
    kernel normalizes the uniform part away but the planted query's
    normalized ratio stays ~3.6x — exactly one flag."""
    victim = "dedup_distinct"
    r = evaluate(
        _line(scale=2.2, load=2.2, bump={victim: REFERENCE[victim] * 8})
    )
    assert [o[0] for o in r["offenders"]] == [victim]
    name, ref, cur, raw, norm = r["offenders"][0]
    assert raw > 7 and 3 < norm < 4.5


def test_planted_regression_without_load_block_still_flags():
    """Pre-r8 bench lines carry no calibration — raw-ratio behavior is
    preserved (load_index defaults to 1)."""
    victim = "tpch_q1ish"
    r = evaluate(_line(scale=1.0, bump={victim: REFERENCE[victim] * 4}))
    assert r["load_index"] == 1.0
    assert [o[0] for o in r["offenders"]] == [victim]


def test_quieter_than_reference_box_never_shrinks_times():
    """load index clamps at 1.0: a fast box must not mask a real
    regression by dividing it down."""
    victim = "minhash_near_dup"
    r = evaluate(_line(scale=1.0, load=0.5, bump={victim: REFERENCE[victim] * 3}))
    assert r["load_index"] == 1.0
    assert [o[0] for o in r["offenders"]] == [victim]


def test_mismatched_kernel_rows_ignored():
    """A bench line whose kernel was built with different CALIB_ROWS is
    not comparable to KERNEL_REF_SEC — fall back to raw ratios."""
    data = _line(scale=1.0, load=3.0)
    data["load"]["kernel_rows"] = 1

    r = evaluate(data)
    assert r["load_index"] == 1.0


def test_calibration_kernel_runs_and_is_subsecond(spark):
    import bench

    sec = bench._calib_kernel_sec(spark)
    assert 0 < sec < 5


def test_scaling_guard_passes_healthy_and_flags_serialized():
    """round 14 (VERDICT r13 #6): the 8c/32c parallelism check must
    pass ratios near the r13 observations and FAIL a deliberate
    serialization (low-core time == main time, ratio ~1.0) — proving a
    lost-parallelism regression is detectable at all."""
    from tools.bench_guard import SCALING_REFERENCE, evaluate_scaling

    # main values ON-RECORD (within 1.3x of REFERENCE) so enforcement
    # applies; an off-record main run downgrades to informational
    main = {"queries": {"corpus_funnel": 12.0, "pipeline_medallion": 2.8}}
    healthy = {
        "queries": {
            q: main["queries"][q] * obs
            for q, (obs, _floor) in SCALING_REFERENCE.items()
        }
    }
    r = evaluate_scaling(main, healthy)
    assert len(r["checked"]) == 2 and not r["offenders"]

    serialized = {"queries": {q: v * 1.0 for q, v in main["queries"].items()}}
    r = evaluate_scaling(main, serialized)
    # only rows with an ENFORCED floor flag (medallion is informational
    # — its 1.20x signal sits inside cross-session noise)
    assert [o[0] for o in r["offenders"]] == ["corpus_funnel"]

    # a row missing from either line is skipped, not crashed
    r = evaluate_scaling(main, {"queries": {"corpus_funnel": 19.0}})
    assert len(r["checked"]) == 1 and not r["offenders"]

    # an off-record (bimodal slow-mode) main run must NOT false-flag:
    # enforcement downgrades to a "skipped" note
    slow_main = {"queries": {"corpus_funnel": 19.0, "pipeline_medallion": 2.8}}
    r = evaluate_scaling(slow_main, {"queries": {"corpus_funnel": 19.0,
                                                 "pipeline_medallion": 2.8}})
    assert not r["offenders"]
    assert any("skipped" in str(c[3]) for c in r["checked"])
