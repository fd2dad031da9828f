"""Property-based tests (hypothesis): operator semantics on randomized
inputs, checked against independent reference implementations (pandas /
plain Python). Each example builds small DataFrames — max_examples kept
low because a Spark job runs per example."""

from __future__ import annotations

import pytest
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.integers(0, 1000),  # left ts
        ),
        min_size=1,
        max_size=25,
    ),
    quotes=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(-50, 50)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
@SET
def test_asof_join_matches_pandas_merge_asof(spark, events, quotes):
    from azure_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(k, t) for k, t in events], "k long, lts long"
    ).withColumn("lts", F.timestamp_seconds("lts"))
    right = spark.createDataFrame(
        [(k, t, v) for k, t, v in quotes], "k long, rts long, v long"
    ).withColumn("rts", F.timestamp_seconds("rts"))

    got = {
        (r["k"], r["lts"]): r["v"]
        for r in asof_join(left, right, "k", "lts", "rts", ["v"]).collect()
    }

    lp = pd.DataFrame(events, columns=["k", "lts"]).sort_values(["lts", "k"])
    rp = pd.DataFrame(quotes, columns=["k", "rts", "v"]).sort_values(["rts", "k"])
    want_df = pd.merge_asof(
        lp, rp, left_on="lts", right_on="rts", by="k", direction="backward"
    )
    import datetime as dt

    def ts(x):
        return dt.datetime.fromtimestamp(int(x), dt.timezone.utc).replace(tzinfo=None)

    want = {}
    for row in want_df.itertuples():
        key = (row.k, ts(row.lts))
        v = None if pd.isna(row.v) else int(row.v)
        # duplicate (k, lts) pairs collapse to the same as-of answer
        want[key] = v
    assert got == want


@given(
    keys=st.lists(st.integers(0, 10**9), min_size=1, max_size=200, unique=True),
    frac=st.sampled_from([0.1, 0.25, 0.5]),
)
@SET
def test_hash_sample_is_a_pure_key_predicate(spark, keys, frac):
    """Membership must be a function of the key alone: the same keys
    sampled through Spark equal a pure-Python md5 reimplementation."""
    import hashlib

    from azure_etl_spark.operators.sampling import (
        hash_bucket_threshold,
        hash_sample,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r["k"] for r in hash_sample(df, "k", frac).collect()}
    thr = hash_bucket_threshold(frac)
    want = {
        k for k in keys if hashlib.md5(str(k).encode()).hexdigest()[:2] < thr
    }
    assert got == want


@given(
    words=st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=4),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_token_count_matches_python_split(spark, words):
    from azure_etl_spark.operators.text import token_count

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(token_count("text").alias("n")).head()["n"]
    assert got == len(text.split())


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_first_per_key_is_min_under_order(spark, rows):
    from azure_etl_spark.operators.dedup import first_per_key

    df = spark.createDataFrame([(k, v, i) for i, (k, v) in enumerate(rows)],
                               "k long, v long, rid long")
    got = {
        r["k"]: (r["v"], r["rid"])
        for r in first_per_key(df, ["k"], ["v", "rid"]).collect()
    }
    want = {}
    for i, (k, v) in enumerate(rows):
        if k not in want or (v, i) < want[k]:
            want[k] = (v, i)
    assert got == want


@given(
    docs=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c"),  # small alphabet -> real repeats
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=10,
    )
)
@SET
def test_repetition_signals_match_python(spark, docs):
    """dup_bigram_ratio / top_word_ratio vs a plain-Python reference on
    the same 512-token-prefix definition; both must stay in [0, 1]."""
    from azure_etl_spark.operators.text import MAX_SIGNAL_TOKENS, repetition_signals

    def ref(text):
        toks = text.strip().lower().split()[:MAX_SIGNAL_TOKENS] if text.strip() else []
        bg = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        dup = 0.0 if not bg else 1.0 - len(set(bg)) / len(bg)
        top = 0.0 if not toks else max(toks.count(w) for w in set(toks)) / len(toks)
        return dup, top

    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i long, text string")
    got = {
        r["i"]: (r["dup_bigram_ratio"], r["top_word_ratio"])
        for r in repetition_signals(df).collect()
    }
    for i, d in enumerate(docs):
        exp = ref(d)
        assert got[i][0] == exp[0] and got[i][1] == exp[1], (d, got[i], exp)
        assert 0.0 <= got[i][0] <= 1.0 and 0.0 <= got[i][1] <= 1.0


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=3),
        min_size=1,
        max_size=40,
    )
)
@SET
@pytest.mark.slow
def test_sorted_run_entropy_matches_counter(spark, words):
    """Fold-based entropy == the Counter-based definition for arbitrary
    token multisets (including empty-string tokens)."""
    import math
    from collections import Counter

    from azure_etl_spark.operators.text import sorted_run_entropy

    df = spark.createDataFrame([(words,)], "ws array<string>")
    row = df.select(F.inline(F.array(sorted_run_entropy(F.col("ws"))))).head()
    c = Counter(words)
    n = sum(c.values())
    expected = -sum((k / n) * math.log(k / n) for k in c.values())
    assert row["n_tokens"] == n
    assert row["n_distinct_words"] == len(c)
    assert abs(row["entropy"] - round(expected, 6)) < 1e-6


@given(
    rows=st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 5)),
        min_size=1,
        max_size=30,
    )
)
@SET
@pytest.mark.slow
def test_distinct_sorted_equals_distinct_orderby(spark, rows):
    from azure_etl_spark.operators.dedup import distinct_sorted

    df = spark.createDataFrame(rows, "k string, v long")
    a = [tuple(r) for r in distinct_sorted(df, ["k", "v"]).collect()]
    b = [tuple(r) for r in df.distinct().orderBy("k", "v").collect()]
    assert a == b


@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        min_size=1,
        max_size=12,
    )
)
@SET
def test_interpolate_linear_matches_pandas(spark, vals):
    """interpolate_linear == pandas Series.interpolate(method='linear',
    limit_direction='both') on a single evenly-spaced key series."""
    import pandas as pd

    from azure_etl_spark.operators.windows import interpolate_linear

    data = [("k", float(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(data, "k string, t double, v double")
    got = {
        r["t"]: r["value_filled"]
        for r in interpolate_linear(df, ["k"], "t", "v").collect()
    }
    exp = pd.Series(vals, dtype="float64").interpolate(
        method="linear", limit_direction="both"
    )
    for i in range(len(vals)):
        e = exp.iloc[i]
        g = got[float(i)]
        if pd.isna(e):
            assert g is None  # all-null series stays null
        else:
            assert g is not None and abs(g - e) < 1e-9


@given(
    ivals=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 20)),  # (start, len)
        min_size=1,
        max_size=12,
    ),
    jvals=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 20)),
        min_size=1,
        max_size=12,
    ),
    width=st.sampled_from([1, 7, 64]),
)
@SET
def test_chunked_interval_join_matches_python(spark, ivals, jvals, width):
    """Chunk decomposition == brute-force overlap for arbitrary interval
    sets (zero-length intervals included) at several chunk widths."""
    from azure_etl_spark.operators.joins import chunked_interval_join

    a = spark.createDataFrame(
        [(1, i, s, s + ln) for i, (s, ln) in enumerate(ivals)],
        "k long, a_id long, as_ long, ae long",
    )
    b = spark.createDataFrame(
        [(1, j, s, s + ln) for j, (s, ln) in enumerate(jvals)],
        "k long, b_id long, bs long, be long",
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in chunked_interval_join(
            a, b, ["k"], "as_", "ae", "bs", "be", width
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (s1, l1) in enumerate(ivals)
        for j, (s2, l2) in enumerate(jvals)
        if s1 <= s2 + l2 and s2 <= s1 + l1
    )
    assert got == want


@given(
    target=st.dictionaries(st.integers(0, 8), st.integers(0, 99), max_size=8),
    changes=st.dictionaries(
        st.integers(0, 8),
        st.tuples(st.sampled_from("IUD"), st.integers(0, 99)),
        max_size=8,
    ),
)
@SET
def test_apply_cdc_matches_dict_semantics(spark, target, changes):
    from azure_etl_spark.operators.aggregate import apply_cdc

    t = spark.createDataFrame(
        [(k, v) for k, v in target.items()] or [(None, None)], "k long, v long"
    ).filter("k IS NOT NULL")
    c = spark.createDataFrame(
        [(k, v, op) for k, (op, v) in changes.items()] or [(None, None, None)],
        "k long, v long, op string",
    ).filter("k IS NOT NULL")
    got = {r["k"]: r["v"] for r in apply_cdc(t, c, ["k"]).collect()}
    want = dict(target)
    for k, (op, v) in changes.items():
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    assert got == want


# --- snapshot-log DML model check -------------------------------------------

_snap_op = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 50), st.integers(1, 12)),
    st.tuples(st.just("overwrite"), st.integers(0, 50), st.integers(1, 12)),
    st.tuples(st.just("cow_delete"), st.integers(0, 60), st.integers(0, 60)),
    st.tuples(st.just("mor_delete"), st.integers(0, 60), st.integers(0, 60)),
    st.tuples(st.just("delete_keys"),
              st.lists(st.integers(0, 60), min_size=1, max_size=4),
              st.just(0)),
    st.tuples(st.just("update"), st.integers(0, 60), st.integers(0, 60)),
    st.tuples(st.just("compact"), st.just(0), st.just(0)),
    st.tuples(st.just("restore"), st.just(0), st.just(0)),
)


@given(ops=st.lists(_snap_op, min_size=1, max_size=6))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_snapshot_dml_sequences_match_model(spark, ops, tmp_path_factory):
    """Random sequences of snapshot-log DML (append / overwrite / COW +
    merge-on-read deletes / equality deletes / update / compact /
    restore) must always read back exactly what a trivial Python dict
    model predicts — the invariant every Delta-parity path shares."""
    from azure_etl_spark.sources.snapshot import (
        compact_snapshot,
        delete_from_snapshot,
        delete_keys_from_snapshot,
        read_snapshot,
        restore_snapshot,
        update_snapshot,
        write_snapshot,
    )

    path = str(tmp_path_factory.mktemp("snapprop") / "tbl")

    def df_for(lo, n):
        return spark.range(lo, lo + n).select(
            F.col("id"), (F.col("id") * 10).alias("val")
        ).coalesce(1)

    # bootstrap so every op has a table to act on
    v = write_snapshot(df_for(0, 5), path)
    model = {i: i * 10 for i in range(5)}
    vhist = {v: dict(model)}  # committed version -> model state

    for op, a, b in ops:
        new_v = None
        if op in ("append", "overwrite"):
            rows = {i: i * 10 for i in range(a, a + b)}
            if op == "append":
                if set(rows) & set(model):
                    continue  # keep the model a plain dict (no dup ids)
                model.update(rows)
            else:
                model = dict(rows)
            new_v = write_snapshot(df_for(a, b), path, mode=op)
        elif op in ("cow_delete", "mor_delete"):
            lo, hi = min(a, b), max(a, b)
            res = delete_from_snapshot(
                spark, path, [("id", "between", (lo, hi))],
                mode="copy_on_write" if op == "cow_delete" else "merge_on_read",
            )
            model = {k: w for k, w in model.items() if not lo <= k <= hi}
            new_v = res["version"]
        elif op == "delete_keys":
            keys = spark.createDataFrame([(k,) for k in set(a)], "id long")
            res = delete_keys_from_snapshot(spark, path, keys, ["id"])
            model = {k: w for k, w in model.items() if k not in set(a)}
            new_v = res["version"]
        elif op == "update":
            lo, hi = min(a, b), max(a, b)
            res = update_snapshot(spark, path, [("id", "between", (lo, hi))],
                                  {"val": "val + 1"})
            model = {
                k: (w + 1 if lo <= k <= hi else w) for k, w in model.items()
            }
            new_v = res["version"]
        elif op == "compact":
            new_v = compact_snapshot(spark, path, target_file_bytes=1 << 30)["version"]
        elif op == "restore":
            target = sorted(vhist)[len(vhist) // 2]  # a real committed version
            res = restore_snapshot(spark, path, to_version=target)
            model = dict(vhist[target])
            new_v = res["version"]
        # a stats-proven no-op (e.g. MOR delete matching nothing) commits
        # no version — record model state only for real commits
        if new_v is not None and new_v not in vhist:
            vhist[new_v] = dict(model)

    got = {r["id"]: r["val"] for r in read_snapshot(spark, path).collect()}
    assert got == model

    # time travel: the earliest committed version still reads as the
    # state recorded at its commit, regardless of every later DML
    v0 = min(vhist)
    old = {
        r["id"]: r["val"]
        for r in read_snapshot(spark, path, version=v0).collect()
    }
    assert old == vhist[v0]


def _ref_bpe(words: dict[str, int], n_merges: int):
    """Pure-Python reference BPE (Sennrich et al. 2016): greedy
    leftmost merge of the (max count, lexicographically min) pair."""
    seqs = {w: tuple(w) for w in words}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple, int] = {}
        for w, seq in seqs.items():
            for i in range(len(seq) - 1):
                counts[(seq[i], seq[i + 1])] = counts.get(
                    (seq[i], seq[i + 1]), 0
                ) + words[w]
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append((best[0], best[1], counts[best]))
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(seq[i] + seq[i + 1])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges, seqs


@given(
    words=st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=6),
        st.integers(1, 9),
        min_size=1,
        max_size=8,
    ),
    n_merges=st.integers(1, 4),
)
@SET
@pytest.mark.slow
def test_bpe_train_matches_python_reference(spark, words, n_merges):
    """Two-letter alphabet forces heavy pair-count ties and overlapping
    runs (aaaa...) — exercising exactly the tie-break and greedy
    leftmost-merge semantics the SQL oracle also replays."""
    from azure_etl_spark.operators.tokenize import bpe_encode, bpe_train

    wf = spark.createDataFrame(list(words.items()), ["word", "cnt"])
    merges, rounds = bpe_train(wf, n_merges=n_merges)
    got = [(r["lhs"], r["rhs"], r["pair_count"]) for r in merges.orderBy("rank").collect()]
    want, want_seqs = _ref_bpe(words, n_merges)
    # both sides stop when no pairs remain (all words fully merged)
    assert got == want
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(sorted(words))], ["doc_id", "text"]
    )
    enc = {
        r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(docs, rounds).collect()
    }
    for i, w in enumerate(sorted(words)):
        assert tuple(enc[i]) == want_seqs[w], w


def _ref_semantic_dedup(vecs: dict[int, list[float]], k: int, iters: int, thr: float):
    """Pure-Python SemDeDup mirror: deterministic Lloyd (k-lowest-id
    init, (dist, cid) argmin, per-dim means), intra-cluster cosine
    pairs, greedy keep-lowest-id."""
    import math

    ids = sorted(vecs)
    cents = {c + 1: list(vecs[i]) for c, i in enumerate(ids[:k])}
    assign = {}
    for _ in range(iters):
        for i in ids:
            assign[i] = min(
                cents,
                key=lambda c: (
                    sum((a - b) ** 2 for a, b in zip(vecs[i], cents[c])),
                    c,
                ),
            )
        for c in set(assign.values()):
            members = [vecs[i] for i in ids if assign[i] == c]
            cents[c] = [sum(col) / len(members) for col in zip(*members)]
        cents = {c: v for c, v in cents.items() if any(assign[i] == c for i in ids)}
    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)
    dropped = set()
    for i in ids:
        for j in ids:
            if i < j and assign[i] == assign[j] and cos(vecs[i], vecs[j]) >= thr:
                dropped.add(j)
    return assign, dropped


@given(
    data=st.lists(
        st.lists(st.integers(-3, 3), min_size=4, max_size=4),
        min_size=3,
        max_size=12,
    ),
)
@SET
@pytest.mark.slow
def test_semantic_dedup_matches_python_reference(spark, data):
    """Small integer vectors force centroid/assignment ties and exact
    cosine collisions — the determinism contract the SQL oracle relies
    on. Zero vectors are excluded (cosine undefined)."""
    from azure_etl_spark.operators.similarity import semantic_dedup

    vecs = {
        i: [float(x) for x in v]
        for i, v in enumerate(data)
        if any(x != 0 for x in v)
    }
    if len(vecs) < 2:
        return
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = semantic_dedup(df, k=3, max_iter=2, threshold=0.999)
    got = {r["vec_id"]: (r["cid"], r["kept"]) for r in out.collect()}
    assign, dropped = _ref_semantic_dedup(vecs, k=3, iters=2, thr=0.999)
    assert set(got) == set(vecs)
    for i in vecs:
        assert got[i][0] == assign[i], (i, got[i], assign[i])
        assert got[i][1] == (i not in dropped), i


@given(
    values=st.lists(st.integers(0, 10_000), min_size=1, max_size=120),
    cuts=st.lists(st.integers(0, 119), min_size=0, max_size=3),
    k=st.sampled_from([4, 16, 64]),
)
@SET
def test_kmv_shard_merge_invariance(spark, values, cuts, k):
    """KMV mergeability is EXACT under ANY sharding: splitting the
    value list at arbitrary cut points, sketching each shard, and
    merging must equal the whole-corpus sketch — and a reference
    k-min over the same md5 hashes (computed in pandas) must agree."""
    import hashlib

    from azure_etl_spark.operators.sketch import kmv_merge, kmv_table

    bounds = sorted({0, len(values), *[c for c in cuts if c < len(values)]})
    shards = [
        values[a:b] for a, b in zip(bounds, bounds[1:]) if values[a:b]
    ] or [values]

    def sk(vals):
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        return kmv_table(df, "v", k=k)

    merged = kmv_merge(*[sk(s) for s in shards], k=k)
    whole = sk(values)
    got = sorted(r["hv"] for r in merged.collect())
    want = sorted(r["hv"] for r in whole.collect())
    assert got == want

    # independent reference: same salted-md5 first-8-hex-digit hash
    ref = sorted(
        {int(hashlib.md5(f"0:{v}".encode()).hexdigest()[:8], 16) for v in values}
    )[:k]
    assert want == ref


@given(
    values=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
        min_size=1,
        max_size=120,
    ),
    cuts=st.lists(st.integers(0, 119), min_size=0, max_size=3),
    k=st.sampled_from([4, 16]),
    salt=st.sampled_from([None, 3]),
)
@SET
@pytest.mark.slow
def test_kmv_grouped_shard_merge_invariance(spark, values, cuts, k, salt):
    """Grouped-KMV mergeability is EXACT per key under ANY sharding,
    the salted build agrees with the unsalted one, and a reference
    per-key k-min over the same md5 hashes (plain Python) agrees."""
    import hashlib

    from azure_etl_spark.operators.sketch import (
        kmv_grouped_merge,
        kmv_grouped_table,
    )

    bounds = sorted({0, len(values), *[c for c in cuts if c < len(values)]})
    shards = [
        values[a:b] for a, b in zip(bounds, bounds[1:]) if values[a:b]
    ] or [values]

    def sk(vals):
        df = spark.createDataFrame(vals, "g int, v long")
        return kmv_grouped_table(df, "g", "v", k=k, salt_buckets=salt)

    merged = kmv_grouped_merge(*[sk(s) for s in shards], key="g", k=k)
    whole = sk(values)
    got = sorted((r["g"], r["hv"]) for r in merged.collect())
    want = sorted((r["g"], r["hv"]) for r in whole.collect())
    assert got == want

    ref = []
    for g in {g for g, _ in values}:
        hs = sorted(
            {
                int(hashlib.md5(f"0:{v}".encode()).hexdigest()[:8], 16)
                for gg, v in values
                if gg == g
            }
        )[:k]
        ref += [(g, h) for h in hs]
    assert want == sorted(ref)


@given(
    values=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1_000_000)),
        min_size=1,
        max_size=120,
    ),
    cuts=st.lists(st.integers(0, 119), min_size=0, max_size=3),
)
@SET
@pytest.mark.slow
def test_loghist_grouped_shard_merge_and_quantile_bracket(spark, values, cuts):
    """Grouped log-histograms merge exactly per (key, bucket) under any
    sharding, and every per-key quantile estimate lands in the
    documented true <= est < 2*true + 1 bracket."""
    import math

    from azure_etl_spark.operators.sketch import (
        loghist_grouped_merge,
        loghist_grouped_quantiles,
        loghist_grouped_table,
    )

    bounds = sorted({0, len(values), *[c for c in cuts if c < len(values)]})
    shards = [
        values[a:b] for a, b in zip(bounds, bounds[1:]) if values[a:b]
    ] or [values]

    def sk(vals):
        df = spark.createDataFrame(vals, "g int, v long")
        return loghist_grouped_table(df, "g", "v")

    merged = loghist_grouped_merge(*[sk(s) for s in shards], key="g")
    whole = sk(values)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )

    qs = [(50, 100), (99, 100)]
    est = {
        (r["g"], r["q_num"]): r["est"]
        for r in loghist_grouped_quantiles(whole, "g", qs).collect()
    }
    for g in {g for g, _ in values}:
        vals = sorted(v for gg, v in values if gg == g)
        for q_num, q_den in qs:
            true = vals[math.ceil(q_num / q_den * len(vals)) - 1]
            e = est[(g, q_num)]
            assert true <= e <= max(1, 2 * true), (g, q_num, true, e)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    ),
)
@SET
def test_connected_components_matches_union_find(spark, edges):
    """Round 11: the pointer-jumping CC (min-label propagation + label
    compression per round) must produce exactly min-reachable-id labels
    on arbitrary graphs — including long chains (the compression's
    worst case), self-loops, duplicate and reversed edges. Reference:
    plain union-find."""
    from azure_etl_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["id"], r["component"])
        for r in connected_components(pairs).collect()
    }
    # round 14: the small-graph driver fast path (default) and the
    # distributed pointer-jumping rounds (forced via driver_max_edges=0)
    # must label identically
    got_dist = {
        (r["id"], r["component"])
        for r in connected_components(pairs, driver_max_edges=0).collect()
    }
    assert got == got_dist

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in parent}
    assert got == want
