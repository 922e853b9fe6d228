"""robots.txt (RFC 9309): group selection, longest-match precedence,
wildcard/anchor patterns, tolerant parsing, and the Spark politeness
filter end-to-end over the WARC corpus."""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_inference_spark.text.robots import (
    parse_robots,
    robots_allowed,
    robots_filter,
)
from ocr_inference_spark.text.warc import site_robots_body

SITE3 = site_robots_body(3).decode()


# ------------------------------------------------------------- parser


def test_group_selection_specific_beats_star():
    rules = parse_robots(SITE3, "synthbot")
    assert (False, "/doc/*3$") in rules and (True, "/doc/") in rules
    assert (False, "/") not in rules  # the * group is not merged in
    # unknown agents land in the * group: banned outright
    assert parse_robots(SITE3, "otherbot") == [(False, "/")]


def test_longest_agent_prefix_wins():
    txt = (
        "User-agent: synth\nDisallow: /a\n\n"
        "User-agent: synthbot\nDisallow: /b\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    assert parse_robots(txt, "synthbot") == [(False, "/b")]
    # 'synth' is a prefix of 'synthbot-mini' and beats '*'
    assert parse_robots(txt, "synthbot-mini") == [(False, "/b")]
    assert parse_robots(txt, "synther") == [(False, "/a")]


def test_stacked_user_agents_share_rules_and_groups_merge():
    txt = (
        "User-agent: a\nUser-agent: b\nDisallow: /x\n\n"
        "User-agent: a\nAllow: /x/ok\n"
    )
    assert parse_robots(txt, "a") == [(False, "/x"), (True, "/x/ok")]
    assert parse_robots(txt, "b") == [(False, "/x")]


def test_tolerant_parsing():
    txt = (
        "# comment only\n"
        "Disallow: /orphan-rule-before-any-group\n"
        "User-agent: bot\n"
        "Crawl-delay: 7\n"
        "DISALLOW: /upper\n"
        "not a field line\n"
        "Allow: /upper/deep # trailing comment\n"
    )
    assert parse_robots(txt, "bot") == [(False, "/upper"), (True, "/upper/deep")]
    assert parse_robots("", "bot") == []


# ----------------------------------------------------------- precedence


def test_longest_match_and_allow_tiebreak():
    rules = [(False, "/doc/"), (True, "/doc/pub/")]
    assert not robots_allowed(rules, "/doc/x")
    assert robots_allowed(rules, "/doc/pub/x")  # longer Allow wins
    # exact tie: Allow wins per RFC 9309 §2.2.2
    tie = [(False, "/p/aa"), (True, "/p/ab")]
    assert robots_allowed(tie, "/p/ab") and not robots_allowed(tie, "/p/aa")
    same = [(False, "/tie"), (True, "/tie")]
    assert robots_allowed(same, "/tie/x")


def test_wildcard_and_anchor_patterns():
    rules = [(False, "/doc/*3$"), (True, "/doc/")]
    assert not robots_allowed(rules, "/doc/00000013")
    assert robots_allowed(rules, "/doc/00000031")  # 3 not at end
    assert robots_allowed(rules, "/doc/00000014")
    # * spans path segments; without $ it matches a prefix
    r2 = [(False, "/a/*/c")]
    assert not robots_allowed(r2, "/a/b/c/d")
    assert robots_allowed(r2, "/a/b/d")
    # regex metacharacters in patterns are literal
    r3 = [(False, "/q?x=.")]
    assert not robots_allowed(r3, "/q?x=.")
    assert robots_allowed(r3, "/q9x=z")


def test_empty_disallow_and_no_rules_mean_allowed():
    assert robots_allowed([(False, "")], "/anything")
    assert robots_allowed([], "/anything")


# -------------------------------------------------------- spark filter


def make_pages(spark, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "url", "html"])
    return spark.createDataFrame(pdf, schema="doc_id long, url string, html string")


def test_robots_filter_operator(spark):
    pages = make_pages(
        spark,
        [
            (13, "http://site3.example/doc/00000013", "<p>x</p>"),  # blocked
            (14, "http://site3.example/doc/00000014", "<p>x</p>"),
            (15, "http://SITE3.EXAMPLE/doc/00000015", "<p>x</p>"),  # host case
            (16, "http://norobots.example/doc/00000016", "<p>x</p>"),
        ],
    )
    robots = spark.createDataFrame(
        pd.DataFrame(
            {"host": ["site3.example"], "robots_txt": [SITE3]}
        )
    )
    got = robots_filter(pages, robots, agent="synthbot").collect()
    assert sorted(r.doc_id for r in got) == [14, 15, 16]
    assert got[0].asDict().keys() == {"doc_id", "url", "html"}


def test_robots_filter_banned_agent_loses_everything(spark):
    pages = make_pages(
        spark, [(1, "http://site3.example/doc/00000001", "<p>x</p>")]
    )
    robots = spark.createDataFrame(
        pd.DataFrame({"host": ["site3.example"], "robots_txt": [SITE3]})
    )
    assert robots_filter(pages, robots, agent="evilbot").count() == 0


# ----------------------------------------------------------------- e2e


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_q54_blocks_exactly_the_digit_rule_set(spark, sf_dir):
    from ocr_inference_spark.queries import QUERIES

    got = QUERIES["q54_robots_filter_extract"](spark, sf_dir)
    kept = {int(r.doc_id) for r in got.select("doc_id").distinct().collect()}
    expected = {d for d in range(64) if d % 10 != d % 7}
    assert kept == expected  # 0..6 self-block under the digit rule
