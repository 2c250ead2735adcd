"""PII scrub hardening (VERDICT r3 item #7 / ADVICE): the round-3 phone
pattern matched ANY >=5-digit run. The hardened ``_PHONE_RE`` requires
phone SHAPE (+ prefix, or >=3 dash-separated groups). This fixture golden
pins entity counts on a planted mixed corpus — real PII caught,
digit-heavy non-PII untouched — in BOTH engines, since the oracle embeds
the identical pattern (cross-engine value parity for the registered op is
covered by tests/test_oracle_parity.py)."""
import duckdb
import pytest

from industry_big_data_time_sequence_process_spark.operators.text import (
    _EMAIL_RE, _PHONE_RE,
)

from pyspark.sql import functions as F

#: (text, expected_emails, expected_phones)
FIXTURE = [
    # real PII: must be caught
    ("call +1-555-0199 now", 0, 1),
    ("dial 555-867-5309 or 020-7946-0958 today", 0, 2),
    ("mail a.b-c@mail.example.org please", 1, 0),
    ("both sam_99@corp.io and +44-20-7946-0958", 1, 1),
    # digit-heavy NON-PII: must NOT scrub (the round-3 over-scrub class)
    ("released in 2024 at 12345 units", 0, 0),
    ("order id 987654321 total 10590 cents", 0, 0),
    ("range 10-20 and score 7-1", 0, 0),
    ("version 1.2.3 build 20240101", 0, 0),
    # documented collision: ISO dates share the dashed 3-group shape
    ("shipped 2024-01-15 ok", 0, 1),
]


@pytest.mark.parametrize("text,n_email,n_phone", FIXTURE)
def test_entity_counts_spark(spark, text, n_email, n_phone):
    row = (spark.createDataFrame([(text,)], "t string")
           .select(F.regexp_count("t", F.lit(_EMAIL_RE)).alias("e"),
                   F.regexp_count("t", F.lit(_PHONE_RE)).alias("p"))
           .collect()[0])
    assert (row["e"], row["p"]) == (n_email, n_phone), text


@pytest.mark.parametrize("text,n_email,n_phone", FIXTURE)
def test_entity_counts_duckdb_agree(text, n_email, n_phone):
    con = duckdb.connect()
    e, p = con.execute(
        f"SELECT len(regexp_extract_all(?, '{_EMAIL_RE}')), "
        f"len(regexp_extract_all(?, '{_PHONE_RE}'))", [text, text]
    ).fetchone()
    con.close()
    assert (e, p) == (n_email, n_phone), text


def test_scrub_leaves_non_pii_intact(spark):
    clean = "released in 2024 at 12345 units range 10-20 id 987654321"
    out = (spark.createDataFrame([(clean,)], "t string")
           .select(F.regexp_replace(
               F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"),
               _PHONE_RE, "<PHONE>").alias("s"))
           .collect()[0]["s"])
    assert out == clean
