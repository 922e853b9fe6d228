"""PII detection and redaction — the scrubbing pass every published
training-data pipeline runs between extraction and packaging (Dolma's
email/phone/IP taggers, FineWeb's anonymization step).

Three detector classes over the raw page, counted on the original
text and redacted in a fixed order (emails, then phone numbers, then
IPv4 addresses) with the Dolma-style ``|||CLASS|||`` replacement
tokens.  The regexes are deliberately restricted to syntax shared by
Java's regex engine (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, ``\\b`` word boundaries — so the DuckDB oracle
runs the byte-identical patterns and the redacted-page md5 sits under
the value-hash gate.

The synthetic documents corpus carries no PII, so ``synth_pii_pages``
plants it deterministically by doc_id arithmetic (the q65/q69 corpus-
augmentation pattern): every %3==0 doc gains a contact email, %6==0 a
second escalation email (multi-match counts), %4==1 a phone number,
%5==2 an IPv4 — each rule SQL-derivable, so detector hits, misses,
overlaps and the final digest are all oracle-checkable.

Scale posture: both synthesis and scrubbing are map-only column
expressions — zero exchanges, whole-stage-codegen regex evaluation,
nothing corpus-cardinality-shaped.  At 100 TB the cost is the regex
scan itself, which rides the same pass as extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java-regex / RE2 common syntax only (no lookaround, no backrefs).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

EMAIL_TOKEN = "|||EMAIL|||"
PHONE_TOKEN = "|||PHONE|||"
IP_TOKEN = "|||IP|||"


def synth_pii_pages(docs_df: DataFrame) -> DataFrame:
    """Deterministic PII-bearing page per documents row (plants are
    appended so the base text — and any accidental pattern hits in it
    — is identical on both engines):

    - doc_id % 3 == 0: a contact email
    - doc_id % 6 == 0: a second (escalation) email
    - doc_id % 4 == 1: a +1-555-XXXX phone number
    - doc_id % 5 == 2: a 10.x.0.y IPv4 address
    """
    d = F.col("doc_id").cast("string")
    e1 = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit(" contact user"), d, F.lit("@mail"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".example.com today."),
        ),
    ).otherwise(F.lit(""))
    e2 = F.when(
        F.col("doc_id") % 6 == 0,
        F.concat(
            F.lit(" escalate to admin"), d, F.lit("@corp.example.org please."),
        ),
    ).otherwise(F.lit(""))
    ph = F.when(
        F.col("doc_id") % 4 == 1,
        F.concat(
            F.lit(" call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now."),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        F.col("doc_id") % 5 == 2,
        F.concat(
            F.lit(" server 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" logged."),
        ),
    ).otherwise(F.lit(""))
    return docs_df.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")), e1, e2, ph, ip
        ).alias("page"),
    )


def pii_scrub(pages_df: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, clean_md5): per-class
    match counts on the original page and the md5 of the page after
    ordered redaction (emails -> phones -> IPs).  Counts are taken
    before any replacement so the classes are independent; redaction
    order only matters if patterns could overlap, which these cannot
    (the replacement tokens contain no word characters or digits)."""
    page = F.col("page")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(page, EMAIL_RE, EMAIL_TOKEN),
            PHONE_RE,
            PHONE_TOKEN,
        ),
        IP_RE,
        IP_TOKEN,
    )
    return pages_df.select(
        "doc_id",
        F.regexp_count(page, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(page, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(page, F.lit(IP_RE)).cast("long").alias("n_ips"),
        F.md5(redacted).alias("clean_md5"),
    )
