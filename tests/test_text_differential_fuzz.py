"""Cross-engine differential fuzz of the text primitives: the same
adversarial strings through Spark's expressions AND their DuckDB
oracle twins, compared exactly. This is the harness that catches the
shorthand-class/locale divergences the sf fixtures (plain ASCII
space-separated words) never exercise — it would have caught both the
Java-vs-RE2 \\x0B membership gap and the Turkish-İ / Greek-final-sigma
lowercase divergences the r14 review closed."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from bigdata_flightanalysis_spark.functions.text import (
    bpe_ish_token_count,
    md5_long,
    normalize_text,
    tokenize,
    word_shingles,
)
from bigdata_flightanalysis_spark.queries.text import (
    _SQL_BPE,
    _SQL_FINGERPRINT,
    _SQL_NORM_TEXT,
    _SQL_TOKENS,
    _sql_shingles,
)

#: Deterministic adversarial corpus: control characters, every ASCII
#: whitespace, unicode case-mapping specials, ligatures, CJK, emoji,
#: combining marks, empties, and long runs.
CASES = [
    "",
    " ",
    "\t\t",
    "a",
    "a b c d e",
    "a\x0bb c",          # vertical tab: Java \s vs RE2 \s gap
    "a\fb",
    "a\r\nb",
    "a\rb",
    "A B C",
    "ÉLAN über STRASSE",
    "İstanbul I ı",       # Turkish dotted I: Java i+U+0307 vs DuckDB i
    "ΣΙΣΥΦΟΣ σίσυφος",    # Greek final sigma: contextual in Java only
    "naïve café",
    "emoji 😀 test",
    "ß SS",
    "x" * 500 + " y",
    "tab\tsep",
    "mixed \t\n\x0b\f\r all",
    "ﬁ ligature",
    "ЁЖИК ёжик",
    "中文 文本 测试",
    "a  b   c",
    " lead",
    "trail ",
    "\x1f unit sep",
    "quote ' and \" test",
    "é combining acute",
    "MIXED Σ end",        # sigma at true word end
]


def test_text_primitives_match_duckdb_on_adversarial_strings(spark):
    rows = [(i, s) for i, s in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(tokenize("text")).alias("ntok"),
            normalize_text("text").alias("norm"),
            md5_long(normalize_text("text")).alias("fp"),
            word_shingles(tokenize("text"), 3).alias("sh"),
            bpe_ish_token_count("text").alias("nbpe"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = con.execute(
        f"""
        SELECT doc_id, len({_SQL_TOKENS}) AS ntok, {_SQL_NORM_TEXT} AS norm,
               {_SQL_FINGERPRINT} AS fp, {_sql_shingles(3)} AS sh,
               {_SQL_BPE} AS nbpe
        FROM documents ORDER BY doc_id
        """
    ).fetchall()
    con.close()
    for doc_id, ntok, norm, fp, sh, nbpe in want:
        s = got[doc_id]
        label = repr(CASES[doc_id])
        assert s["ntok"] == ntok, f"{label}: ntok {s['ntok']} vs {ntok}"
        assert s["norm"] == norm, f"{label}: norm {s['norm']!r} vs {norm!r}"
        assert s["fp"] == fp, f"{label}: fingerprint"
        assert list(s["sh"]) == list(sh), f"{label}: shingles {s['sh']} vs {sh}"
        assert s["nbpe"] == nbpe, f"{label}: bpe {s['nbpe']} vs {nbpe}"


def test_vector_primitives_match_duckdb_on_adversarial_vectors(spark):
    """Same differential harness for the ANN twins: zero vectors,
    negative zeros, denormal-scale and near-float-max magnitudes,
    alternating signs — cosine (with its zero-norm NULL guard), the
    LSH bucket bits, and the minhash permutation family must agree
    exactly between Spark and DuckDB."""
    from bigdata_flightanalysis_spark.functions.text import (
        _perm_constants,
        minhash_perm,
        minhash_perm_sql,
    )
    from bigdata_flightanalysis_spark.functions.vector import (
        cosine_from_parts,
        l2_norm,
    )
    from bigdata_flightanalysis_spark.queries.similarity import (
        _spark_bucket,
        _sql_bucket,
        _sql_cosine,
    )

    vecs = [
        [0.0] * 64,
        [-0.0] * 64,
        [1e-38] * 64,
        [3e38] + [0.0] * 63,
        [1.0] * 64,
        [(-1.0) ** i * (i + 1) / 64 for i in range(64)],
        [1e-20] * 64,
    ]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    pre = df.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )
    a, b = pre.alias("a"), pre.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.e"), F.col("b.e"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sp_cos = {
        (r["qa"], r["qb"]): r["cos"]
        for r in a.crossJoin(b)
        .select(
            F.col("a.vec_id").alias("qa"),
            F.col("b.vec_id").alias("qb"),
            cosine_from_parts(dot, F.col("a.nrm"), F.col("b.nrm")).alias("cos"),
        )
        .collect()
    }
    sp_bucket = {r["vec_id"]: r["bucket"] for r in pre.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id INT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    for qa, qb, cos in con.execute(
        f"""SELECT a.vec_id, b.vec_id,
                   {_sql_cosine("a.embedding", "b.embedding")}
            FROM embeddings a CROSS JOIN embeddings b"""
    ).fetchall():
        assert sp_cos[(qa, qb)] == cos, (qa, qb, sp_cos[(qa, qb)], cos)
    for vid, bucket in con.execute(
        f"SELECT vec_id, {_sql_bucket('embedding')} FROM embeddings"
    ).fetchall():
        assert sp_bucket[vid] == bucket, (vid, sp_bucket[vid], bucket)

    # minhash permutation family over boundary base hashes (the real
    # oracles feed a BIGINT md5 cast, so the probe must too — a bare
    # small literal would type INT32 in DuckDB and overflow)
    bases = [0, 1, (1 << 60) - 1, (1 << 59) + 12345, 777]
    bdf = spark.createDataFrame([(x,) for x in bases], "h bigint")
    for const in _perm_constants(4):
        sp_perm = [
            r["p"] for r in bdf.select(minhash_perm(F.col("h"), const).alias("p")).collect()
        ]
        dk_perm = [
            con.execute(
                f"SELECT {minhash_perm_sql(f'CAST({x} AS BIGINT)', const)}"
            ).fetchone()[0]
            for x in bases
        ]
        assert sp_perm == dk_perm, const
    con.close()
