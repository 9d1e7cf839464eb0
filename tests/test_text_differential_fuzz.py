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
