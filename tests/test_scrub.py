"""PII redaction + URL normalization unit tests (operators/scrub.py).

The registry oracle sweep covers the end-to-end queries; these pin the
edge semantics the oracle data may not exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordbfaiss_spark.operators import scrub as S


def _one(spark, text: str) -> dict:
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        S.redact(F.col("t")).alias("clean"), *S.pii_counts(F.col("t"))
    ).first()
    return row.asDict()


def test_redact_all_four_kinds(spark):
    r = _one(
        spark,
        "mail a.b+c@x.co ssn 123-45-6789 ip 192.168.0.1 tel 555-1234 end",
    )
    assert r["clean"] == "mail <EMAIL> ssn <SSN> ip <IP> tel <PHONE> end"
    assert (r["n_email"], r["n_ssn"], r["n_ip"], r["n_phone"]) == (1, 1, 1, 1)


def test_redact_ssn_not_double_counted_as_phone(spark):
    # 3-2-4 digit SSN shape must not yield a PHONE count/redaction
    r = _one(spark, "only 987-65-4321 here")
    assert r["clean"] == "only <SSN> here"
    assert r["n_phone"] == 0 and r["n_ssn"] == 1


def test_redact_clean_text_untouched(spark):
    r = _one(spark, "no pii in this sentence at all")
    assert r["clean"] == "no pii in this sentence at all"
    assert (r["n_email"], r["n_ssn"], r["n_ip"], r["n_phone"]) == (0, 0, 0, 0)


def _norm(spark, url: str) -> dict:
    df = spark.createDataFrame([(url,)], "u string")
    p = S.url_parts(F.col("u"))
    return df.select(
        p["host"].alias("host"),
        p["domain"].alias("domain"),
        S.normalize_url(F.col("u")).alias("norm"),
    ).first().asDict()


def test_url_lowercase_host_port_strip(spark):
    r = _norm(spark, "HTTPS://WWW.Example.COM:443/A/b/")
    assert r["host"] == "www.example.com"
    assert r["domain"] == "example.com"
    assert r["norm"] == "https://www.example.com/A/b"


def test_url_tracking_params_dropped_others_kept(spark):
    r = _norm(spark, "http://a.b.c/p?utm_source=x&q=1&utm_medium=y&r=2")
    assert r["norm"] == "https://a.b.c/p?q=1&r=2"


def test_url_all_params_tracking_drops_query_entirely(spark):
    r = _norm(spark, "http://a.b.c/p?utm_source=x&utm_medium=y")
    assert r["norm"] == "https://a.b.c/p"


def test_url_blocklist_is_registrable_domain_not_host(spark):
    r = _norm(spark, "https://ads.sub.tracker.net/z")
    assert r["domain"] == "tracker.net"
    assert r["domain"] in S.URL_BLOCKLIST


def test_span_scrub_keep_first_semantics(spark, tmp_path):
    # two docs share an 8-word span; doc 1 (lower id) keeps it, doc 2
    # loses exactly the covered words; doc 3 untouched
    span = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        (1, f"intro {span} outro", "en", "s", 10),
        (2, f"head {span} tail", "en", "s", 10),
        (3, "totally unrelated words only here now", "en", "s", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.write.parquet(f"{d}/documents.parquet")
    from vectordbfaiss_spark.registry import queries

    out = {
        r["doc_id"]: r
        for r in queries()["crossdoc_span_scrub"](spark, d).collect()
    }
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == f"intro {span} outro"
    assert out[2]["n_removed"] == 8
    assert out[2]["clean_text"] == "head tail"
    assert out[3]["n_removed"] == 0


def test_selfrep_scrub_removes_second_occurrence_only(spark, tmp_path):
    rows = [
        (1, "a b c d x a b c d y", "en", "s", 19),
        (2, "all words are unique in this one", "en", "s", 32),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.write.parquet(f"{d}/documents.parquet")
    from vectordbfaiss_spark.registry import queries

    out = {
        r["doc_id"]: r
        for r in queries()["selfrep_span_scrub"](spark, d).collect()
    }
    assert out[1]["n_removed"] == 4
    assert out[1]["clean_text"] == "a b c d x y"
    assert out[2]["n_removed"] == 0
    assert out[2]["clean_text"] == "all words are unique in this one"
