"""Property tests for the corpus-statistics and packing operators
(beyond oracle parity: invariants that hold at ANY scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.queries.catalog import load_all

SF = "/root/testdata/sf0.001"


def _q(name):
    return load_all()[name].fn


def test_repetition_scores_bounded(spark):
    rows = _q("doc_repetition_scores")(spark, SF).collect()
    for r in rows:
        assert 0.0 <= r["rep_ratio"] < 1.0
        assert 1 <= r["n_distinct"] <= r["n_bigrams"]


def test_pack_sequences_bins_contiguous_and_budgeted(spark):
    """Each (shard, bin) holds < budget + one-max-doc chars (straddle
    bound), bins are dense from 0, and totals conserve the corpus."""
    rows = _q("doc_pack_sequences")(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    max_doc = docs.agg(F.max("n_chars")).first()[0]
    total = docs.agg(F.sum("n_chars")).first()[0]
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["bin_chars"] for r in rows) == total
    by_shard: dict[str, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["bin"])
    for shard, bins in by_shard.items():
        assert sorted(bins) == list(range(len(bins))), shard  # dense
    for r in rows:
        # a bin can exceed the budget only by the straddle of its last doc
        assert r["bin_chars"] < 4096 + max_doc


def test_pack_assignment_partition_order_invariant(spark):
    a = _q("doc_pack_sequences")(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").repartition(7)
    # same computation over a differently-partitioned scan must agree:
    # the ordering key is a pure function of doc_id, not partition layout
    b = (
        docs.select(
            "doc_id",
            "n_chars",
            F.md5(F.col("doc_id").cast("string")).alias("h"),
        )
        .withColumn("shard", F.substring("h", 1, 1))
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = b.withColumn(
        "bin",
        F.floor((F.sum("n_chars").over(w) - F.col("n_chars")) / 4096).cast(
            "long"
        ),
    )
    bb = sorted(
        tuple(r)
        for r in packed.groupBy("shard", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("bin_chars"))
        .collect()
    )
    assert sorted(tuple(r) for r in a) == bb


def test_quality_weighted_sample_monotone_in_length(spark):
    """Longer docs must be kept at a (weakly) higher rate — the whole
    point of weighting — and docs over the cap kept always."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = {r["doc_id"] for r in _q("doc_quality_weighted_sample")(spark, SF).collect()}
    rows = docs.select("doc_id", "n_chars").collect()
    big = [r for r in rows if r["n_chars"] >= 400]
    small = [r for r in rows if r["n_chars"] < 200]
    assert all(r["doc_id"] in kept for r in big)  # weight capped at 1.0
    rate_small = sum(r["doc_id"] in kept for r in small) / max(len(small), 1)
    assert rate_small < 1.0


def test_pagerank_canonical_consistent_with_clusters(spark):
    """The PageRank canonical of each cluster must be a member of that
    cluster, and clusters must match doc_dup_clusters' assignment."""
    canon = {
        r["cluster_id"]: r["canonical_doc_id"]
        for r in _q("doc_dup_canonical_pagerank")(spark, SF).collect()
    }
    clusters: dict[int, set] = {}
    for r in _q("doc_dup_clusters")(spark, SF).collect():
        clusters.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    for cid, doc in canon.items():
        assert doc in clusters[cid], (cid, doc)
        assert len(clusters[cid]) > 1  # only real dup clusters are ranked


def test_incremental_near_dup_equals_full_restricted(spark):
    """The incremental path (batch signatures vs persisted band store)
    must emit EXACTLY the full-corpus candidate pairs that involve a
    batch doc — no pair lost by skipping the historical rescan, none
    invented. This is the replay-safety property that makes the store
    design sound at 100 TB."""
    full = {
        (r["doc_a"], r["doc_b"])
        for r in _q("doc_near_dup_candidates")(spark, SF).collect()
    }
    inc = {
        (r["doc_a"], r["doc_b"])
        for r in _q("doc_near_dup_incremental")(spark, SF).collect()
    }
    is_new = lambda d: d % 5 == 4  # noqa: E731 — mirrors _INCR_MOD/_INCR_REM
    expected = {p for p in full if is_new(p[0]) or is_new(p[1])}
    assert inc == expected
    assert inc, "fixture has no batch-involving near-dup pairs"


def test_clean_normalize_adversarial_inputs(spark, tmp_path):
    """The engine-parity claim on input that actually exercises every
    stage (the synthetic corpus is already clean): tags stripped,
    control chars dropped, whitespace runs collapsed, trim, 300-char
    cap — Spark output must equal the DuckDB oracle run on the same
    crafted corpus."""
    import duckdb

    from bigdata_flightanalysis_spark.queries.catalog import load_all

    rows = [
        (1, "plain text stays as is", "en", "s", 10),
        (2, "a  <b>bold</b>\t\ttag<br/>soup   here", "en", "s", 10),
        (3, "ctrl\x01\x02chars\x7fgone \x0b\x0c ws", "en", "s", 10),
        (4, "  leading and trailing   ", "en", "s", 10),
        (5, "x" * 450, "en", "s", 10),  # capped at 300
        (6, "<p>" + "word " * 120 + "</p>", "en", "s", 10),
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    q = load_all()["doc_clean_normalize"]
    got = sorted(tuple(r) for r in q.fn(spark, str(tmp_path)).collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
    con.close()
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[5][2] == 300  # hard cap applied
    assert by_id[4][2] == len("leading and trailing")  # trimmed+collapsed


def test_clean_normalize_fuzzed_engine_parity(spark, tmp_path):
    """Property fuzz of the regex-equivalence claim: random strings
    over an alphabet chosen to probe exactly where Java regex and RE2
    could diverge (shorthand-class members \\x0b/\\x0c, control chars,
    tag fragments, non-ASCII, whitespace runs) must normalize
    identically in both engines."""
    import duckdb
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_flightanalysis_spark.queries.catalog import load_all

    alphabet = st.sampled_from(
        list("abz <>/=\"'\t\n\r\x0b\x0c\x01\x08\x0e\x1f\x7f") + ["é", "中", "𝄞"]
    )
    texts = st.lists(
        st.text(alphabet=alphabet, max_size=350), min_size=1, max_size=12
    )
    q = load_all()["doc_clean_normalize"]

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts)
    def prop(batch):
        rows = [
            (i, t, "en", "s", len(t)) for i, t in enumerate(batch)
        ]
        d = f"{tmp_path}/fuzz"
        spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = sorted(tuple(r) for r in q.fn(spark, d).collect())
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet/*.parquet'"
        )
        want = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
        con.close()
        assert got == want

    prop()


def test_tokenize_semantics_no_phantom_boundary_tokens(spark):
    """SEMANTIC contract (not just engine parity — both engines shared
    the bug, so parity never caught it): boundary whitespace yields no
    phantom '' tokens, blank/whitespace-only docs yield [], NULL
    propagates (r16 review)."""
    from bigdata_flightanalysis_spark.functions.text import tokenize

    df = spark.createDataFrame(
        [
            (1, "doc text\n"),
            (2, "\t\t"),
            (3, ""),
            (4, None),
            (5, "  leading and trailing \r\n"),
            (6, "plain"),
        ],
        "id int, text string",
    )
    out = {
        r["id"]: r["toks"]
        for r in df.select("id", tokenize("text").alias("toks")).collect()
    }
    assert out[1] == ["doc", "text"]
    assert out[2] == []
    assert out[3] == []
    assert out[4] is None
    assert out[5] == ["leading", "and", "trailing"]
    assert out[6] == ["plain"]


def test_punct_ratio_unicode_letters_not_punctuation(spark):
    """punct_ratio must not score CJK/accented letters as punctuation
    (r16 review: the ASCII class flagged every non-English doc)."""
    from bigdata_flightanalysis_spark.functions.text import punct_ratio

    df = spark.createDataFrame(
        [
            (1, "中文 文本 测试"),     # pure CJK: 0 punctuation
            (2, "naïve café"),          # accented latin: 0
            (3, "!!! ???"),             # pure punctuation: 1.0
            (4, "ab, cd."),             # 2 of 6 non-space chars
        ],
        "id int, text string",
    )
    out = {
        r["id"]: r["pr"]
        for r in df.select("id", punct_ratio("text").alias("pr")).collect()
    }
    assert out[1] == 0.0
    assert out[2] == 0.0
    assert out[3] == 1.0
    assert abs(out[4] - 2 / 6) < 1e-12


def test_stopword_hits_case_folded(spark):
    """Sentence-initial capitalized stopwords must count (r16 review:
    'The' — the most frequent position — never matched the lowercase
    lists, skewing doc_langid toward the alphabetical tie-break)."""
    from bigdata_flightanalysis_spark.functions.text import (
        stopword_hits,
        tokenize,
    )

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran. And so on.")], "id int, text string"
    )
    n = df.select(
        stopword_hits(tokenize("text"), "en").alias("n")
    ).collect()[0]["n"]
    # 'The' x2 (case-folded) + 'And'? 'and' is in the en list -> 3
    assert n == 3
