"""SQL-surface registration of the engine's text metrics.

Spark 4 SQL scalar UDFs (``CREATE TEMPORARY FUNCTION ... RETURNS ...
RETURN <expr>``) with pure SQL expression bodies: they inline into the
Catalyst plan with full whole-stage codegen — nothing crosses the
Python boundary — so ``spark.sql`` users get the same deterministic
metrics the DataFrame operators compute, at identical cost.

Bodies are hand-mirrored from operators/text.py; the equivalence test
(tests/test_sql_udfs.py) compares every function against its DataFrame
twin on the fixture corpus, so drift cannot ship silently.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# token count of raw text (empty/whitespace-only -> 0), used inline in
# the quality body because a SQL UDF body is one expression
_TOK = "CASE WHEN length(trim({t})) = 0 THEN 0 ELSE size(split(trim({t}), '\\\\s+')) END"

_DDL = [
    # normalized content form (lowercase, collapsed whitespace, trimmed)
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_norm_text(t STRING)
       RETURNS STRING
       RETURN trim(regexp_replace(lower(t), '\\\\s+', ' '))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION eng_token_count(t STRING)
       RETURNS INT
       RETURN {_TOK.format(t='t')}""",
    # content fingerprint: md5 of the normalized form
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_fingerprint(t STRING)
       RETURNS STRING
       RETURN md5(trim(regexp_replace(lower(t), '\\\\s+', ' ')))""",
    # heuristic quality in [0,1] — mirrors operators/text.quality_score
    f"""CREATE OR REPLACE TEMPORARY FUNCTION eng_quality(t STRING)
       RETURNS DOUBLE
       RETURN round(
         least(CAST({_TOK.format(t='t')} AS DOUBLE) / 64.0, 1.0) * 0.5
         + CASE WHEN (CASE WHEN {_TOK.format(t='t')} = 0 THEN 0.0
                      ELSE CAST(length(t) AS DOUBLE) / {_TOK.format(t='t')} END)
                 BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END * 0.3
         + (1.0 - CASE WHEN length(t) = 0 THEN 0.0
                  ELSE least(CAST(length(regexp_replace(t, '[^\\\\.,;:!\\\\?]', ''))
                                  AS DOUBLE)
                             / CAST(length(t) AS DOUBLE) * 4.0, 1.0) END) * 0.2,
         6)""",
    # 64-bit signature hamming distance (dhash/simhash/audio fp) —
    # bit_count(xor) under codegen, the same verify the pair joins run
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_hamming(a BIGINT, b BIGINT)
       RETURNS INT
       RETURN cast(bit_count(a ^ b) AS INT)""",
    # cosine similarity of two double vectors (NULL on zero-norm), the
    # scalar behind the ANN operators — aggregate/zip_with, no UDF
    # nullif guards the zero-norm vector: under Spark 4's default ANSI
    # mode a bare /0 raises DIVIDE_BY_ZERO instead of returning NULL
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_cosine(a ARRAY<DOUBLE>,
                                                       b ARRAY<DOUBLE>)
       RETURNS DOUBLE
       RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (s, v) -> s + v)
              / nullif(sqrt(aggregate(a, 0.0D, (s, v) -> s + v * v))
                       * sqrt(aggregate(b, 0.0D, (s, v) -> s + v * v)), 0.0D)""",
    # sequential-fold dot product — the sign test behind the hyperplane
    # LSH signatures (functions/vectors.dot's exact fold order, so SQL
    # buckets are bit-identical to the DataFrame operator's)
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_dot(a ARRAY<DOUBLE>,
                                                    b ARRAY<DOUBLE>)
       RETURNS DOUBLE
       RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (s, v) -> s + v)""",
]


_SKETCH_DDL = [
    # ------- mergeable-sketch family scalars (round 8, VERDICT r7 #7):
    # the sketch TABLES are plain DataFrames/views; these scalars are
    # the hash + estimator arithmetic, bit-identical to the operators
    # (tests/test_sql_udfs.py proves each against its DataFrame twin),
    # so a pure spark.sql user can build/probe the persisted sketch
    # shapes with documented one-liners:
    #   KMV build:  SELECT DISTINCT eng_kmv_hash(word) AS hv FROM w
    #               ORDER BY hv LIMIT 256
    #   KMV est:    SELECT eng_kmv_estimate(COUNT(*), COALESCE(MAX(hv),
    #               0), 256, 32) FROM kmv_view
    #   CMS probe:  JOIN cms_view s ON s.r = r.r AND
    #               s.b = eng_cms_hash(v, r.r, 1024), MIN over depth
    #   loghist:    GROUP BY eng_loghist_bucket(v);
    #               eng_loghist_upper(b) is the bucket bound
    #
    # the salted-md5 bucket hash every sketch here uses:
    # conv(first bits/4 hex digits of md5('{salt}:'||v), 16, 10) —
    # identical to operators/sketch._row_hash
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_sketch_hash(salt STRING,
                                                            v STRING,
                                                            bits INT)
       RETURNS BIGINT
       RETURN cast(conv(substring(md5(concat(salt, ':', v)), 1,
                                  bits div 4), 16, 10) AS BIGINT)""",
    # KMV member hash (salt 0, 32-bit — kmv_table's default build)
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_kmv_hash(v STRING)
       RETURNS BIGINT
       RETURN cast(conv(substring(md5(concat('0:', v)), 1, 8), 16, 10)
                   AS BIGINT)""",
    # the pure-BIGINT KMV estimator (operators/sketch.
    # kmv_distinct_estimate): exact below k, else (k-1)*2^bits div kth
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_kmv_estimate(n_seen BIGINT,
                                                             kth BIGINT,
                                                             k INT,
                                                             bits INT)
       RETURNS BIGINT
       RETURN CASE WHEN n_seen < k THEN n_seen
              ELSE (CAST(k - 1 AS BIGINT) * shiftleft(CAST(1 AS BIGINT), bits))
                   div greatest(kth, CAST(1 AS BIGINT)) END""",
    # CMS row-r bucket of a value (operators/sketch._row_hash % width)
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_cms_hash(v STRING, r INT,
                                                         width INT)
       RETURNS BIGINT
       RETURN cast(conv(substring(md5(concat(cast(r AS STRING), ':', v)),
                                  1, 8), 16, 10) AS BIGINT) % width""",
    # log-histogram bucket = bit length; negatives fail like the operator
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_loghist_bucket(v BIGINT)
       RETURNS INT
       RETURN CASE WHEN v >= 0 THEN cast(length(bin(v)) AS INT)
              ELSE cast(raise_error(concat('eng_loghist_bucket: negative ',
                                           cast(v AS STRING))) AS INT) END""",
    # bucket upper bound with the ANSI-safe top-bucket pin (b >= 63)
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_loghist_upper(b INT)
       RETURNS BIGINT
       RETURN CASE WHEN b >= 63 THEN 9223372036854775807
              ELSE shiftleft(CAST(1 AS BIGINT), b) - 1 END""",
    # KLL level power 2^(trailing zeros) of the row key's 48-bit salted
    # hash (operators/sketch.kll_table's survivor criterion: a row is
    # in the level-L sample iff eng_kll_level_pow(key) >= 2^L) — the
    # SQL build recipe:
    #   SELECT v, eng_kll_level_pow(key) AS p FROM t
    #   ... pick the smallest L whose count(p >= 2^L) <= k, keep those
    """CREATE OR REPLACE TEMPORARY FUNCTION eng_kll_level_pow(key STRING)
       RETURNS BIGINT
       RETURN CASE WHEN cast(conv(substring(md5(concat('kll:', key)), 1, 12),
                                  16, 10) AS BIGINT) = 0
                   THEN shiftleft(CAST(1 AS BIGINT), 48)
              ELSE cast(conv(substring(md5(concat('kll:', key)), 1, 12),
                             16, 10) AS BIGINT)
                   & -cast(conv(substring(md5(concat('kll:', key)), 1, 12),
                                16, 10) AS BIGINT) END""",
]


def _minhash_ddl() -> list[str]:
    """Round 10 (VERDICT r9 #6): the MinHash pipeline's per-row stages
    as pure-SQL-expression functions, so the flagship near-dup join is
    reachable from ``spark.sql`` alone — see ``sql_minhash_near_dup``
    in the registry for the full recipe (signature -> band keys ->
    band-bucket self-join -> exact-Jaccard verify). Bodies mirror
    ``operators/dedup.py`` bit-for-bit: same xxhash64 base (masked to
    31 bits, ONE string hash per shingle), same Carter-Wegman
    ``(a_k*h + b_k) mod 2^31-1`` constants (imported, not copied), same
    band-key string. Registered as inlineable SQL functions rather
    than Python UDTFs on purpose: these bodies stay inside whole-stage
    codegen, while a UDTF would drag every row through a Python worker
    — the equivalence tests (tests/test_sql_udfs.py) prove the outputs
    identical to the DataFrame operators."""
    from azure_etl_spark.operators.dedup import _MINHASH_P, _minhash_consts

    consts = ", ".join(
        f"named_struct('a', CAST({a} AS BIGINT), 'b', CAST({b} AS BIGINT))"
        for a, b in _minhash_consts(64)
    )
    norm = "trim(regexp_replace(lower(t), '\\\\s+', ' '))"
    words = f"split({norm}, ' ')"

    def _sh(n: str) -> str:
        return (
            "CASE WHEN {n} = 1 THEN array_distinct({w}) "
            "ELSE array_distinct(transform("
            "sequence(0, greatest(size({w}) - {n}, 0)), "
            "i -> concat_ws(' ', slice({w}, i + 1, {n})))) END"
        ).format(w=words, n=n)

    return [
        # distinct word n-gram shingles of the normalized text
        f"""CREATE OR REPLACE TEMPORARY FUNCTION eng_shingles(t STRING, n INT)
           RETURNS ARRAY<STRING>
           RETURN {_sh('n')}""",
        # 64-hash MinHash signature; the outer 1-element transform binds
        # the base-hash array to a lambda var so xxhash64 runs ONCE per
        # shingle, not once per hash function (a SQL UDF body is a
        # single expression — this is its let-binding)
        f"""CREATE OR REPLACE TEMPORARY FUNCTION eng_minhash_sig(t STRING)
           RETURNS ARRAY<BIGINT>
           RETURN transform(
             array(transform({_sh('2')}, s -> xxhash64(s) & {_MINHASH_P})),
             bs -> transform(array({consts}),
                             p -> array_min(transform(bs,
                                  h -> (h * p.a + p.b) % {_MINHASH_P}))))[0]""",
        # LSH band keys: band b hashes the signature's b-th slice
        # (size/bands rows), comma-joined exactly like the DataFrame
        # band join's concat_ws
        """CREATE OR REPLACE TEMPORARY FUNCTION eng_minhash_bands(
               sig ARRAY<BIGINT>, bands INT)
           RETURNS ARRAY<STRUCT<band: INT, bkey: BIGINT>>
           RETURN transform(
             sequence(0, bands - 1),
             b -> named_struct(
               'band', CAST(b AS INT),
               'bkey', xxhash64(concat_ws(',',
                 transform(slice(sig, b * (size(sig) div bands) + 1,
                                 size(sig) div bands),
                           x -> CAST(x AS STRING))))))""",
        # estimated Jaccard of two signatures (the candidate-stage
        # score): mean of positionwise matches
        """CREATE OR REPLACE TEMPORARY FUNCTION eng_minhash_est(
               a ARRAY<BIGINT>, b ARRAY<BIGINT>)
           RETURNS DOUBLE
           RETURN CAST(aggregate(zip_with(a, b,
                        (x, y) -> CAST(x = y AS INT)), 0, (s, v) -> s + v)
                       AS DOUBLE) / CAST(size(a) AS DOUBLE)""",
    ]


def register_sql_functions(spark: SparkSession) -> None:
    """Install the ``eng_*`` SQL functions into the current session."""
    for ddl in _DDL + _SKETCH_DDL + _minhash_ddl():
        spark.sql(ddl)


# ---------------------------------------------------------------- similarity

_SIMILARITY_KINDS = ("minhash", "image_dhash", "hash64", "media")


def register_similarity_join(
    spark: SparkSession,
    out_view: str,
    source,
    kind: str = "minhash",
    **kw,
) -> "DataFrame":
    """SQL-visible near-dup/similarity surface (round 7; VERDICT r6 #7
    and SURVEY.md §4): run one of the engine's pair-mining operators
    over a registered view (or DataFrame) and publish the result as a
    temp view, so ``spark.sql`` users can reach the dedup/ANN stack —
    Spark has no Python API for user table functions over arbitrary
    DataFrames, so the supported recipe is exactly this
    operator -> ``createOrReplaceTempView`` bridge, plus the
    ``eng_hamming``/``eng_cosine`` scalars for ad-hoc verification.

    kinds: ``minhash`` (text LSH near-dups; kwargs forwarded to
    ``minhash_near_dup_pairs``), ``image_dhash`` (perceptual-hash PNM
    payloads then chunk-join), ``hash64`` (precomputed 64-bit
    signature column: kwargs ``id_col``/``hash_col``, optional
    ``scope_cols``), ``media`` (mixed-modality table, per-modality
    pairs). Returns the pair DataFrame (id_a, id_b, ...) it registered.
    """
    from pyspark.sql import DataFrame

    df = spark.table(source) if isinstance(source, str) else source
    if kind == "minhash":
        from azure_etl_spark.operators.dedup import minhash_near_dup_pairs

        pairs = minhash_near_dup_pairs(df, **kw)
    elif kind == "image_dhash":
        from azure_etl_spark.operators.imagehash import (
            hash64_near_dup_pairs,
            image_perceptual_hash,
        )

        id_col = kw.pop("id_col", "doc_id")
        media_col = kw.pop("media_col", "media")
        hashed = image_perceptual_hash(
            df.select(id_col, media_col), media_col, "__ph"
        )
        pairs = hash64_near_dup_pairs(hashed, id_col, "__ph", **kw)
    elif kind == "hash64":
        from azure_etl_spark.operators.imagehash import hash64_near_dup_pairs

        pairs = hash64_near_dup_pairs(df, **kw)
    elif kind == "media":
        from azure_etl_spark.plans.corpus_pipeline import media_near_dup_pairs

        pairs = media_near_dup_pairs(df, **kw)
    else:
        raise ValueError(f"kind must be one of {_SIMILARITY_KINDS}, got {kind!r}")
    pairs.createOrReplaceTempView(out_view)
    return pairs
