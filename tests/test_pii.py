"""PII detection/redaction semantics on hand-built fixtures (the oracle
gate pins byte-exact engine parity on the injected corpus; these pin
the MEANING: boundaries, multiplicity, redaction order)."""

from __future__ import annotations

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.pii import (
    with_pii_scan,
)


def _scan(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r for r in with_pii_scan(df).collect()}


def test_pii_counts_and_redaction(spark):
    got = _scan(
        spark,
        [
            "mail a.b+c@x-corp.io and d@e.org today",
            "server 192.168.0.1 and 10.0.0.7 up",
            "call 555-123-4567 or 555 123 4567",
            "card 4111111111111111 ok",
            "nothing sensitive here",
        ],
    )
    assert got[0]["n_email"] == 2 and got[0]["has_pii"]
    assert got[0]["redacted"] == "mail [EMAIL] and [EMAIL] today"
    assert got[1]["n_ipv4"] == 2
    assert got[1]["redacted"] == "server [IPV4] and [IPV4] up"
    assert got[2]["n_phone"] == 2
    assert got[3]["n_card"] == 1
    assert got[3]["redacted"] == "card [CARD] ok"
    assert not got[4]["has_pii"]
    assert got[4]["redacted"] == "nothing sensitive here"


def test_pii_boundaries_do_not_overmatch(spark):
    got = _scan(
        spark,
        [
            "version 1.2.3 released",  # 3 octets — not an IP
            "serial 123456789012345 is 15 digits",  # not a 16-digit card
            "price 100-200 range",  # not a phone
            "at sign alone @ nothing",  # not an email
        ],
    )
    for i in range(4):
        assert not got[i]["has_pii"], got[i]
        assert got[i]["redacted"].count("[") == 0


def test_pii_mixed_document_redacts_all_kinds(spark):
    got = _scan(
        spark, ["a@b.co from 1.2.3.4 dials 555-000-1111 pays 1234567890123456"]
    )[0]
    assert (got["n_email"], got["n_ipv4"], got["n_phone"], got["n_card"]) == (
        1,
        1,
        1,
        1,
    )
    assert got["redacted"] == "[EMAIL] from [IPV4] dials [PHONE] pays [CARD]"
