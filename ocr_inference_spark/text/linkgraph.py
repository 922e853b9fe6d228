"""Hyperlink extraction, RFC 3986 reference resolution, and link-graph
analytics (integer-exact PageRank) — the crawl-frontier / authority
layer that sits between archive ingestion (warc.py) and URL-level dedup
(urlnorm.py).

A crawler discovers its frontier from ``<a href>`` references, so link
extraction walks the WHOLE DOM (nav/footer links matter for discovery)
— unlike main-content extraction (html_extract.py) which strips them.
Each href is resolved against the page's base URL per RFC 3986 §5
(relative paths, dot-segments, scheme-relative ``//host`` forms) and
then canonicalized by urlnorm.normalize_url, so the edge list is keyed
by the same canonical identity the dedup layer uses. ``rel=nofollow``
is carried as a flag (RFC draft / Google 2005 convention: the authority
signal a ranker may discount).

PageRank runs in SCALED-INTEGER arithmetic (micro-rank units, floor
division) so the result is bit-deterministic across engines and
summation orders — float PageRank cannot sit under a value-hash gate,
integer PageRank can. Semantics: the classic damped walk
(Brin & Page 1998) over the CLOSED capture set (edges whose target was
not captured are dropped, and out-degrees are computed after that
filter — exactly what a ranker over a crawl snapshot does), with
dangling mass dropped (the "pruned" variant; documented, deterministic)
and parallel edges kept as multi-edges (weight = duplicate count).

Scale posture (10^12 captures): extraction + resolution are per-row
string kernels inside one mapInPandas (zero shuffle). The edge list is
static across PageRank iterations — hash-partition it by ``src`` once
and only rank-sized rows (url, int64) move per iteration: one
join-by-src + one aggregate-by-dst shuffle per round, the same narrow
iteration discipline as dedup.dup_clusters. For large iteration counts
cut lineage per round exactly as dup_clusters does; the fixed-K gate
query keeps K small so the plan stays shallow.

Reference analogue: the reference's pipeline has no link stage (it
ingests image folders, reference/cli.py:16); this layer is part of the
web-corpus brief (crawl frontier -> dedup -> extraction) built on
public knowledge only (RFC 3986, the PageRank paper, HTML5 parsing
rules).
"""

from __future__ import annotations

import html as _htmlmod
import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .html_extract import _tokenize  # in-package reuse of the tolerant tokenizer
from .urlnorm import normalize_url

_WS_RE = re.compile(r"\s+")

# damping factor 0.85 as the exact rational 85/100 (Brin & Page 1998)
DAMP_NUM = 85
DAMP_DEN = 100
RANK_SCALE = 1_000_000  # micro-rank units per node at iteration 0


def parse_html_links(doc: str) -> list[tuple[str, str, bool]]:
    """HTML -> [(href, anchor_text, nofollow)] in document order.

    Whole-DOM link discovery: boilerplate subtrees are NOT skipped
    (frontier links live in navs and footers), but rawtext (script/
    style) never yields links — the tokenizer consumes it. Nested
    ``<a>`` is invalid HTML5; a new ``<a>`` implicitly closes the open
    one (the spec's adoption-agency outcome for this case). Anchor text
    is entity-decoded and whitespace-normalized. Fragment-only and
    empty hrefs are dropped (self-references, not frontier edges).
    """
    links: list[tuple[str, str, bool]] = []
    cur: tuple[str, bool] | None = None  # (href, nofollow) of the open <a>
    parts: list[str] = []

    def close() -> None:
        nonlocal cur, parts
        if cur is not None:
            anchor = _WS_RE.sub(" ", "".join(parts)).strip()
            links.append((cur[0], anchor, cur[1]))
        cur = None
        parts = []

    for ev in _tokenize(doc):
        kind = ev[0]
        if kind == "text":
            if cur is not None:
                parts.append(_htmlmod.unescape(ev[1]))
        elif kind == "start" and ev[1] == "a":
            close()  # implicit close of any open <a>
            href = ev[2].get("href", "").strip()
            if href and not href.startswith("#"):
                rel = ev[2].get("rel", "").lower().split()
                cur = (href, "nofollow" in rel)
        elif kind == "end" and ev[1] == "a":
            close()
    close()  # tolerate an unclosed trailing <a>
    return links


def resolve_href(base_url: str, href: str) -> str | None:
    """RFC 3986 §5 reference resolution + crawl canonicalization.
    Returns the canonical absolute http(s) URL, or None for non-web
    schemes (mailto:, javascript:, data:) and unparseable references."""
    from urllib.parse import urljoin

    try:
        absolute = urljoin(base_url, href)
    except ValueError:
        return None
    return normalize_url(absolute)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def extract_links(pages_df: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, html) pages -> (src, dst, anchor, nofollow) link rows.
    src/dst are canonical URLs; one zero-shuffle mapInPandas kernel."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"src": [], "dst": [], "anchor": [], "nofollow": []}
            for base, doc in zip(pdf[url_col], pdf[html_col]):
                src = normalize_url(base) if base else None
                if src is None or doc is None:
                    continue
                for href, anchor, nofollow in parse_html_links(doc):
                    dst = resolve_href(src, href)
                    if dst is None:
                        continue
                    out["src"].append(src)
                    out["dst"].append(dst)
                    out["anchor"].append(anchor)
                    out["nofollow"].append(nofollow)
            yield pd.DataFrame(out)

    return pages_df.select(url_col, html_col).mapInPandas(
        kernel, schema="src string, dst string, anchor string, nofollow boolean"
    )


def edge_list(links_df: DataFrame) -> DataFrame:
    """Collapse raw link rows to weighted edges (src, dst, anchor,
    nofollow, n). One hash aggregate — the only shuffle, keyed on
    16-byte-ish URL strings, independent of page size."""
    return links_df.groupBy("src", "dst", "anchor", "nofollow").agg(
        F.count(F.lit(1)).alias("n")
    )


def pagerank(
    edges_df: DataFrame,
    nodes_df: DataFrame,
    iterations: int = 3,
    rank_scale: int = RANK_SCALE,
) -> DataFrame:
    """Integer-exact damped PageRank over the closed capture set.

    ``edges_df``: (src, dst, n) weighted edges; ``nodes_df``: (url).
    Edges whose dst is not a captured node are dropped and out-degrees
    computed AFTER the filter (closed-world rank over the snapshot).
    Iteration k+1:  r(v) = floor(0.15 * S) + Σ_{(u,v,w)} floor(0.85 *
    r(u) * w / outdeg(u)) with everything in int64 micro-rank units and
    floor division — bit-deterministic regardless of summation order,
    so the result can sit under a value-hash gate. Dangling mass is
    dropped (pruned variant). Parallel edges contribute w times.

    Plan: the (edge ⋈ outdeg) relation is static across iterations —
    only (url, int64) rank rows shuffle per round (join-by-src +
    agg-by-dst), the dup_clusters iteration discipline. Round 6: the
    static relation (and the node set) is MATERIALIZED once before the
    loop — without the cut, every iteration's join re-executed the
    whole upstream extraction (parser + RFC 3986 resolution: the
    100-TB analogue of re-crawling per rank round; measured 3 full
    re-extractions at K=3 in the q58 plan). For large K the rank
    relation itself is lineage-cut every 8 rounds so plan depth stays
    bounded (the deferred TODO from round 5 — see test_linkgraph's
    iterations=20 case).
    """
    nodes = nodes_df.select(F.col("url")).localCheckpoint(eager=True)
    e = edges_df.join(nodes.withColumnRenamed("url", "dst"), "dst", "semi")
    outdeg = e.groupBy("src").agg(F.sum("n").alias("od"))
    edges = e.join(outdeg, "src").select(
        "src", "dst", "n", "od"
    ).localCheckpoint(eager=True)

    base = (rank_scale * DAMP_DEN - rank_scale * DAMP_NUM) // DAMP_DEN
    ranks = nodes.select(
        "url", F.lit(rank_scale).cast("long").alias("rank_micro")
    )
    for it in range(iterations):
        if it and it % 8 == 0:
            ranks = ranks.localCheckpoint(eager=False)
        contrib = (
            edges.join(ranks, edges["src"] == ranks["url"])
            .select(
                F.col("dst"),
                F.expr(
                    f"({DAMP_NUM} * rank_micro * n) div ({DAMP_DEN} * od)"
                ).alias("c"),
            )
        )
        agg = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(agg, nodes["url"] == agg["dst"], "left")
            .select(
                nodes["url"],
                (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("rank_micro"),
            )
        )
    return ranks


# ---------------------------------------------------------------------------
# Deterministic gate corpus + its construction rule
# ---------------------------------------------------------------------------
#
# Per document d (base URL = warc.url_of(d), host site{d%7}.example):
#   j0 (always):      target t0 = (3d+1) % n  — messy ABSOLUTE href
#                     (uppercase scheme+host, :80, utm param, fragment)
#   j1 (d%3 >= 1):    target t1 = (5d+2) % n  — RELATIVE ../doc/./…
#                     (resolves on the SOURCE host, so it is in-corpus
#                     only when ((5d+2)%n)%7 == d%7)
#   j2 (d%3 == 2):    target t2 = (7d+3) % n  — SCHEME-RELATIVE //host,
#                     rel=nofollow
#   d%13 == 0:        page has NO real links (dangling node) — only the
#                     decoys below
#   d%11 == 0 (and not dangling): the j0 link appears TWICE (nav+body
#                     duplication — a parallel edge of weight 2)
# Decoys on every page: fragment-only href, mailto:, empty href, and a
# link inside <script> rawtext — none may produce an edge.
# For n = 64 the three target maps are pairwise distinct for every d
# (their differences are odd-coefficient affine maps mod 64).


def synth_link_corpus(
    spark: SparkSession, docs_df: DataFrame, n_docs: int = 64
) -> DataFrame:
    """documents -> (doc_id, url, html) hub pages per the rule above."""
    import pandas as pd

    src = docs_df.select("doc_id").where(F.col("doc_id") < n_docs)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, urls, htmls = [], [], []
            for d in pdf["doc_id"]:
                d = int(d)
                url = f"http://site{d % 7}.example/doc/{d:08d}"
                body = [
                    "<!DOCTYPE html>",
                    f"<html><head><title>hub {d % 7}</title>",
                    "<script>var decoy = '<a href=\"/from-script\">no</a>';"
                    "</script>",
                    f"</head><body><h1>Document {d:08d}</h1>",
                ]
                if d % 13 != 0:
                    t0 = (3 * d + 1) % n_docs
                    href0 = (
                        f"HTTP://SITE{t0 % 7}.EXAMPLE:80/doc/{t0:08d}"
                        "?utm_source=syn#ref"
                    )
                    body.append(
                        f'<p>See <a href="{href0}">study {t0}</a> '
                        "for background.</p>"
                    )
                    if d % 3 >= 1:
                        t1 = (5 * d + 2) % n_docs
                        body.append(
                            f'<p>Also <a href="../doc/./{t1:08d}">'
                            f"note &amp; appendix {t1}</a>.</p>"
                        )
                    if d % 3 == 2:
                        t2 = (7 * d + 3) % n_docs
                        body.append(
                            f'<p>Vendor <a rel="nofollow sponsored" '
                            f'href="//site{t2 % 7}.example/doc/{t2:08d}">'
                            f"sponsor {t2}</a>.</p>"
                        )
                    if d % 11 == 0:
                        body.append(
                            f'<p>Revisit: <a href="{href0}">study {t0}</a>'
                            "</p>"
                        )
                body.append(
                    '<p><a href="#top">back to top</a> '
                    '<a href="mailto:ed@example.org">mail</a> '
                    '<a href="">empty</a></p>'
                )
                body.append("</body></html>")
                ids.append(d)
                urls.append(url)
                htmls.append("\n".join(body))
            yield pd.DataFrame({"doc_id": ids, "url": urls, "html": htmls})

    n_parts = spark.sparkContext.defaultParallelism
    return src.repartition(n_parts, "doc_id").mapInPandas(
        kernel, schema="doc_id long, url string, html string"
    )
