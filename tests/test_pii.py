"""PII scrubbing (text/pii.py): detector counts, redaction
completeness, and the scrubbed digest pinned against an independent
pure-Python reference."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Row


def _python_scrub(page):
    from ocr_inference_spark.text.pii import (
        EMAIL_RE,
        EMAIL_TOKEN,
        IP_RE,
        IP_TOKEN,
        PHONE_RE,
        PHONE_TOKEN,
    )

    n_e = len(re.findall(EMAIL_RE, page))
    n_p = len(re.findall(PHONE_RE, page))
    n_i = len(re.findall(IP_RE, page))
    red = re.sub(EMAIL_RE, EMAIL_TOKEN.replace("\\", "\\\\"), page)
    red = re.sub(PHONE_RE, PHONE_TOKEN.replace("\\", "\\\\"), red)
    red = re.sub(IP_RE, IP_TOKEN.replace("\\", "\\\\"), red)
    return n_e, n_p, n_i, hashlib.md5(red.encode()).hexdigest()


def test_pii_scrub_matches_python_reference(spark):
    from ocr_inference_spark.text.pii import pii_scrub

    pages = [
        "reach me at jane.doe+spam@sub.example.co.uk or call +1-555-0199 now",
        "hosts 192.168.0.1 and 10.0.0.255 talked; also bob@x.io",
        "no pii here at all",
        "",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, page=p) for i, p in enumerate(pages)]
    )
    got = {
        r["doc_id"]: (
            r["n_emails"], r["n_phones"], r["n_ips"], r["clean_md5"]
        )
        for r in pii_scrub(df).collect()
    }
    want = {i: _python_scrub(p) for i, p in enumerate(pages)}
    assert got == want
    assert want[0][:3] == (1, 1, 0)
    assert want[1][:3] == (1, 0, 2)
    assert want[2][:3] == (0, 0, 0)


def test_pii_redaction_leaves_no_matches(spark):
    from ocr_inference_spark.text.pii import (
        EMAIL_RE,
        IP_RE,
        PHONE_RE,
        pii_scrub,
        synth_pii_pages,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"word{i} filler text") for i in range(60)]
    )
    pages = synth_pii_pages(docs)
    red = pages.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("page", EMAIL_RE, "|||EMAIL|||"),
                PHONE_RE,
                "|||PHONE|||",
            ),
            IP_RE,
            "|||IP|||",
        ).alias("r"),
    )
    residual = red.where(
        F.col("r").rlike(EMAIL_RE)
        | F.col("r").rlike(PHONE_RE)
        | F.col("r").rlike(IP_RE)
    ).count()
    assert residual == 0
    # and the planted counts follow the doc_id rules
    got = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ips"])
        for r in pii_scrub(pages).collect()
    }
    for i in range(60):
        want = (
            (1 if i % 3 == 0 else 0) + (1 if i % 6 == 0 else 0),
            1 if i % 4 == 1 else 0,
            1 if i % 5 == 2 else 0,
        )
        assert got[i] == want, (i, got[i], want)


def test_pii_null_text_is_scrubbed_not_crashed(spark):
    from ocr_inference_spark.text.pii import pii_scrub, synth_pii_pages

    docs = spark.createDataFrame(
        [(0, None), (7, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in pii_scrub(synth_pii_pages(docs)).collect()}
    assert rows[0]["n_emails"] == 2  # %3 and %6 plants on empty base
    assert rows[7]["n_emails"] == 0
    assert all(r["clean_md5"] for r in rows.values())
