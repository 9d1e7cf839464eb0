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


def test_decimal_and_timestamp_rendering_match_duckdb(spark):
    """Differential fuzz of the profiler's engine-portable renderings
    (operators/profile.py) against their DuckDB oracle macros
    (queries/relational_ext.py: _SQL_RENDER_DOUBLE / _SQL_RENDER_TS)
    plus the date formats the oracle twins lean on everywhere
    (strftime '%Y-%m-%d' / '%Y-%m' vs date_format).

    The double lane is what PINNED the rendering semantics: Spark's
    double→decimal cast rounds the double's SHORTEST decimal repr
    HALF_UP at 6 fractional digits, while DuckDB's native
    DOUBLE→DECIMAL casts the exact binary value — measured divergences
    at 1234567.1234565 (...457 vs ...456), 12345678901234.566
    (.566000 vs .567168) and 1e31 (exact 10^31 vs
    999...538762658202121.142272). The macro therefore routes through
    VARCHAR, which this lane proves equivalent across the corpus.

    Documented exclusions (out of the pinned domain):
    - NaN / ±Infinity / |x| ≥ 1e32: Spark falls back to its plain
      string rendering (asserted not to throw below); DuckDB's
      TRY_CAST yields NULL — engine-specific by design.
    - magnitudes below ~1e-300 (subnormal neighborhood): DuckDB's
      text→decimal parse mis-rounds there ('9e-308' → 0.000001,
      '5e-324' → 0.000001; measured), Spark renders 0.000000."""
    import datetime as dt

    from pyspark.sql import types as T

    from bigdata_flightanalysis_spark.operators.profile import (
        _TS_FMT,
        _render,
    )
    from bigdata_flightanalysis_spark.queries.relational_ext import (
        _SQL_RENDER_DOUBLE,
        _SQL_RENDER_TS,
    )

    doubles = [
        0.0, -0.0, 1.0, -1.0,
        5e-7, 1.5e-6, 2.5e-6, 3.5e-6, -2.5e-6, 1e-7, 1e-6, -1e-6,
        0.1, 1.0 / 3.0, 0.9999995, -0.9999995, 2.0000005,
        123.4567895, 999999.999999, -9876543.2109875,
        1234567.1234565,            # shortest-repr vs binary edge
        9876543210.1234565,         # ULP ≈ 1e-6 boundary region
        12345678901234.566,         # ULP > 1e-6: binary cast differs
        1e16, 1e31, 9.99999e31,     # e-notation shortest reprs
        3.141592653589793,
    ]
    rows = [(i, x) for i, x in enumerate(doubles)]
    df = spark.createDataFrame(rows, "i int, x double")
    sp = {
        r["i"]: r["s"]
        for r in df.select(
            "i", _render(F.col("x"), T.DoubleType()).alias("s")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE dd(i INT, x DOUBLE)")
    con.executemany("INSERT INTO dd VALUES (?,?)", rows)
    for i, want in con.execute(
        f"SELECT i, {_SQL_RENDER_DOUBLE.format(x='x')} FROM dd"
    ).fetchall():
        assert sp[i] == want, (doubles[i], sp[i], want)

    # out-of-domain fallback: must not throw, must stay non-NULL
    bad = [float("nan"), float("inf"), float("-inf"), 1e32, -1e33]
    bdf = spark.createDataFrame(
        [(i, x) for i, x in enumerate(bad)], "i int, x double"
    )
    fb = [
        r["s"]
        for r in bdf.select(
            _render(F.col("x"), T.DoubleType()).alias("s")
        ).collect()
    ]
    assert all(s is not None for s in fb), fb

    tss = [
        dt.datetime(1970, 1, 1, 0, 0, 0),           # epoch
        dt.datetime(1969, 12, 31, 23, 59, 59),      # pre-epoch second
        dt.datetime(2000, 2, 29, 12, 34, 56),       # century leap day
        dt.datetime(2024, 2, 29, 23, 59, 59, 999999),  # fraction trunc
        dt.datetime(1900, 1, 1, 0, 0, 0),           # non-leap century
        dt.datetime(9999, 12, 31, 23, 59, 59),      # range top
        dt.datetime(1, 1, 1, 0, 0, 0),              # range bottom
        dt.datetime(123, 4, 5, 6, 7, 8),            # 3-digit year pad
        dt.datetime(1960, 6, 15, 12, 0, 0, 500000),  # pre-epoch + frac
        dt.datetime(2016, 12, 31, 23, 59, 59),      # leap-second eve
    ]
    trows = [(i, t) for i, t in enumerate(tss)]
    tdf = spark.createDataFrame(trows, "i int, ts timestamp")
    spt = {
        r["i"]: r["s"]
        for r in tdf.select("i", F.date_format("ts", _TS_FMT).alias("s")).collect()
    }
    con.execute("CREATE TABLE tt(i INT, ts TIMESTAMP)")
    con.executemany("INSERT INTO tt VALUES (?,?)", trows)
    for i, want in con.execute(
        f"SELECT i, {_SQL_RENDER_TS.format(x='ts')} FROM tt"
    ).fetchall():
        assert spt[i] == want, (tss[i], spt[i], want)

    # date lane: the strftime('%Y-%m-%d') / ('%Y-%m') twins used across
    # the events/orders oracles vs date_format
    ds = [
        dt.date(1970, 1, 1), dt.date(1969, 12, 31), dt.date(1, 1, 1),
        dt.date(123, 4, 5), dt.date(2024, 2, 29), dt.date(9999, 12, 31),
    ]
    drows = [(i, d) for i, d in enumerate(ds)]
    ddf = spark.createDataFrame(drows, "i int, d date")
    spd = {
        r["i"]: (r["s1"], r["s2"])
        for r in ddf.select(
            "i",
            F.date_format("d", "yyyy-MM-dd").alias("s1"),
            F.date_format("d", "yyyy-MM").alias("s2"),
        ).collect()
    }
    con.execute("CREATE TABLE td(i INT, d DATE)")
    con.executemany("INSERT INTO td VALUES (?,?)", drows)
    for i, a, b in con.execute(
        "SELECT i, strftime(d,'%Y-%m-%d'), strftime(d,'%Y-%m') FROM td"
    ).fetchall():
        assert spd[i] == (a, b), (ds[i], spd[i], (a, b))
    con.close()


def test_json_extraction_matches_duckdb_on_adversarial_payloads(spark):
    """Differential fuzz of the JSON-in-string pair used by
    events_json_extract: Spark get_json_object + strict try_cast vs
    the pinned DuckDB macros (_SQL_JSON_K / _sql_strict_bigint).

    The lane pinned two real gaps (r15): DuckDB's extractor ERRORS on
    malformed JSON where get_json_object yields NULL (json_valid
    guard), and DuckDB's TRY_CAST parses-and-ROUNDS decimal text
    ('5.9' → 6, '1000.0' → 1000) where Spark's try_cast is strict
    NULL (integer regex gate). Raw text extraction itself agrees on
    every case measured — including unquoted strings, duplicate keys,
    unicode escapes, whitespace padding, and int64 boundaries."""
    from bigdata_flightanalysis_spark.queries.events import (
        _SQL_JSON_K,
        _sql_strict_bigint,
    )

    cases = [
        '{"k": 5}', '{"k": -3}', '{"k": 0}', '{"k": "7"}', '{"k": null}',
        '{}', '{"K": 5}', '{"k": 5.9}', '{"k": true}', '{"k": [1,2]}',
        '{"k": {"x": 1}}', '{"k": 1152921504606846976}',
        '{"k": 9223372036854775807}', ' {"k": 5} ', '{"k":5,"k":6}',
        'not json', '', None, 'null', '{"k": 5',
        '{"k": "\\u0035"}', '{"k": 1e3}', '{"k": -0}', '{"k": " 8 "}',
        '{"k": ""}', '{"k": "+12"}', '{"k": "0012"}',
        # padding class pins: Spark's cast trims exactly [\x00-\x20\x7f]
        # off both ends — NUL/unit-sep/DEL/VT strip (value casts), the
        # high ISO controls and unicode spaces do NOT (NULL both sides)
        '{"k": "\\u00005\\u0000"}', '{"k": "\\u001f+5\\u001f"}',
        '{"k": "\\u007f5"}', '{"k": "\\u000b5\\u000b"}',
        '{"k": "\\u00855"}', '{"k": "\\u00a05"}', '{"k": "\\u20005"}',
        '{"k": "5\\u00005"}',  # interior control: NULL both sides
    ]
    rows = [(i, s) for i, s in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, props string")
    sp = {
        r["i"]: (r["raw"], r["b"])
        for r in df.select(
            "i",
            F.get_json_object("props", "$.k").alias("raw"),
            F.get_json_object("props", "$.k").try_cast("bigint").alias("b"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, props VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    for i, raw, b in con.execute(
        f"SELECT i, {_SQL_JSON_K}, {_sql_strict_bigint(_SQL_JSON_K)} FROM t"
    ).fetchall():
        assert sp[i][0] == raw, (cases[i], sp[i][0], raw)
        assert sp[i][1] == b, (cases[i], sp[i][1], b)
    con.close()


def test_pii_url_regex_family_matches_duckdb(spark):
    """Differential fuzz of the governance regex family (EMAIL/PHONE/
    ID/URL/DOMAIN — written in the Java-regex / RE2 common subset):
    counts, chained replacements, and first-group extraction must
    agree on boundary-adversarial strings (1-char TLDs, doubled @,
    trailing dots, country-code length edges, scheme case, unicode
    neighbors, repeated matches)."""
    from bigdata_flightanalysis_spark.queries.governance import (
        DOMAIN_RE,
        EMAIL_RE,
        ID_RE,
        PHONE_RE,
        URL_RE,
    )

    cases = [
        "plain text no pii",
        "a@b.co", "x a@b.co y", "UPPER@CASE.ORG", "a.b+c_d%e@sub.domain.info",
        "a@b.c", "a@@b.com", "@b.com", "a@b..com", "a@-b.com", "a@b.com.",
        "twice a@b.com c@d.org",
        "+1-555-1234", "+123-456-789012", "+1234-555-1234", "+1-55-1234",
        "SSN-123456", "SSN- 12", "xSSN-99", "SSN-",
        "https://example.com", "http://example.com/path/to_x-y.z",
        "HTTPS://UPPER.COM", "https://a.b/p?q=1",
        "see https://www.x.example.com/p/1 and http://cdn3.assets-en.net/x.js",
        "email ὕ@b.com unicode", "ΣΣ a@b.gr",
        "a@b.com" * 30,
        "nested http://a.com/https://b.com path",
    ]
    rows = [(i, s) for i, s in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, t string")
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("t", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        ID_RE,
        "<ID>",
    )
    sp = {
        r["i"]: tuple(r[1:])
        for r in df.select(
            "i",
            F.regexp_count("t", F.lit(EMAIL_RE)).alias("ne"),
            F.regexp_count("t", F.lit(PHONE_RE)).alias("np"),
            F.regexp_count("t", F.lit(ID_RE)).alias("ni"),
            red.alias("red"),
            F.regexp_count("t", F.lit(URL_RE)).alias("nu"),
            F.regexp_extract("t", DOMAIN_RE, 1).alias("dom"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    q = f"""SELECT i,
      len(regexp_extract_all(t, '{EMAIL_RE}')),
      len(regexp_extract_all(t, '{PHONE_RE}')),
      len(regexp_extract_all(t, '{ID_RE}')),
      regexp_replace(regexp_replace(regexp_replace(
          t, '{EMAIL_RE}', '<EMAIL>', 'g'), '{PHONE_RE}', '<PHONE>', 'g'),
          '{ID_RE}', '<ID>', 'g'),
      len(regexp_extract_all(t, '{URL_RE}')),
      coalesce(regexp_extract(t, '{DOMAIN_RE}', 1), '')
    FROM t"""
    for row in con.execute(q).fetchall():
        i, dk = row[0], tuple(row[1:])
        assert sp[i] == dk, (cases[i], sp[i], dk)
    con.close()
