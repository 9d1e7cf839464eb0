"""JSON-lines source/sink round-trip (S1/S3 family extension)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.sources.readers import read_json, read_table
from bigdata_flightanalysis_spark.sources.writers import write_json

SF = "/root/testdata/sf0.001"


def test_json_round_trip(spark, tmp_path):
    docs = read_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = str(tmp_path / "docs_json")
    write_json(docs, path)
    back = read_json(
        spark, path, schema="doc_id bigint, lang string, n_chars bigint"
    )
    assert back.count() == docs.count()
    a = sorted(docs.collect(), key=lambda r: r["doc_id"])
    b = sorted(back.collect(), key=lambda r: r["doc_id"])
    assert [tuple(r) for r in a] == [
        tuple(r[c] for c in ["doc_id", "lang", "n_chars"]) for r in b
    ]


def test_json_explicit_schema_skips_inference(spark, tmp_path):
    docs = read_table(spark, SF, "documents").select("doc_id", "lang")
    path = str(tmp_path / "docs_json2")
    write_json(docs, path, compression=None)
    back = read_json(spark, path, schema="doc_id bigint, lang string")
    assert dict(back.dtypes) == {"doc_id": "bigint", "lang": "string"}
    # schema projection prunes at the parser: asking for one column
    # still parses, but the plan carries only the requested fields
    assert back.select(F.max("doc_id")).first()[0] is not None
