"""URL canonicalization + capture dedup — the first dedup stage of every
web-crawl pipeline (beyond-reference tier).

CommonCrawl-style corpora arrive as (url, capture) pairs where the same page
appears under many spellings: scheme/host case, ``www.`` prefix, default
ports, tracking parameters (``utm_*``), fragments, trailing slashes. URL
canonicalization folds those spellings to one key BEFORE any content-level
dedup runs — it is orders of magnitude cheaper than MinHash and removes the
bulk of exact re-crawls.

The synthetic ``documents`` table has no url column, so the entry first
synthesizes a deterministic messy URL per doc (the text_pii_redact
precedent: inject from doc_id, then exercise the real machinery end to end)
spanning every variant class above, then canonicalizes with a fixed chain of
regex rewrites and groups captures by the canonical key.

Cross-engine exactness: the rewrite chain uses ONLY the Java-regex / RE2
common subset (anchors, character classes, alternation, capture groups — no
lookaround, which RE2 lacks) with patterns shared as module constants;
replacement strings differ per dialect only in backreference spelling
(Spark ``$1`` vs DuckDB ``\\1``). Every step is a map-side projection; the
dedup itself is ONE groupBy on the canonical key. At 100 TB this runs at
scan speed into a single key-hash shuffle whose reducer state is one row
per distinct page — the cheapest possible first-pass dedup.

Reference analogue: none (the reference has no web tier); SURVEY §2
extension surface alongside dedup_exact / docs_curation_gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from skinnerdb_spark.queries.util import read_table
from skinnerdb_spark.registry import register

# Java-regex / RE2 common-subset patterns (shared; replacements per-dialect).
_P_FRAGMENT = r"#.*$"                       # fragment: never part of identity
_P_SCHEME_HOST = r"^[A-Za-z]+://[^/]+"      # scheme+host prefix (case-folded)
_P_PORT_HTTPS = r"^(https://[^/:]+):443(/|$)"
_P_PORT_HTTP = r"^(http://[^/:]+):80(/|$)"
_P_WWW = r"^(https?://)www\."
# utm removal is a three-step anchored chain (RE2 has no lookaround, and a
# global replace resumes scanning after the replacement, so a single
# "[?&]utm_...&" -> "$1" pass would miss CONSECUTIVE utm params):
#  1. strip every "&utm_x=v" (params not in leading position; global replace
#     handles runs because each match starts at its own '&');
#  2. a leading "?utm_x=v&" collapses to "?" (the next param takes over);
#  3. a now-solitary "?utm_x=v" tail drops entirely.
# All three anchor on the separator, so a param merely NAMED *utm_* (e.g.
# "foutm_x") is never touched.
_P_UTM_AMP = r"&utm_[a-z]+=[^&#]*"
_P_UTM_LEAD = r"\?utm_[a-z]+=[^&#]*&"
_P_UTM_TAIL = r"\?utm_[a-z]+=[^&#]*$"
_P_TRAIL_SLASH = r"([^/])/$"


def _synth_url_spark(doc_id: Column, source: Column) -> Column:
    d = doc_id
    return F.concat(
        F.lit("HTTPS://WWW.Site"),
        (d % 3).cast("string"),
        F.lit(".Example.COM:443/"),
        source,
        F.lit("/Page-"),
        (d % 7).cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("?utm_source=rss&ref=abc&utm_campaign=x"))
        .when(d % 4 == 1, F.lit("?ref=abc&utm_medium=email"))
        .when(d % 4 == 2, F.lit("?utm_term=feed&utm_medium=rss"))
        .otherwise(F.lit("?xutm_keep=1&utm_source=z")),
        F.when(d % 5 == 0, F.lit("#Section-2")).otherwise(F.lit("")),
    )


_SYNTH_URL_SQL = """
    'HTTPS://WWW.Site' || CAST(doc_id % 3 AS VARCHAR) || '.Example.COM:443/'
    || source || '/Page-' || CAST(doc_id % 7 AS VARCHAR)
    || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
    || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=rss&ref=abc&utm_campaign=x'
            WHEN doc_id % 4 = 1 THEN '?ref=abc&utm_medium=email'
            WHEN doc_id % 4 = 2 THEN '?utm_term=feed&utm_medium=rss'
            ELSE '?xutm_keep=1&utm_source=z' END
    || CASE WHEN doc_id % 5 = 0 THEN '#Section-2' ELSE '' END
"""


def canonicalize_url(u: Column) -> Column:
    """The rewrite chain, Spark dialect. Order matters and is part of the
    contract (mirrored in the oracle): fragment first (so a trailing utm
    param is truly trailing), host folding before port/www rules (their
    patterns assume lowercase scheme), utm removal before the trailing-slash
    rule (removal can expose a trailing slash)."""
    u = F.regexp_replace(u, _P_FRAGMENT, "")
    u = F.concat(
        F.lower(F.regexp_extract(u, "(" + _P_SCHEME_HOST + ")", 1)),
        F.regexp_replace(u, _P_SCHEME_HOST, ""),
    )
    u = F.regexp_replace(u, _P_PORT_HTTPS, "$1$2")
    u = F.regexp_replace(u, _P_PORT_HTTP, "$1$2")
    u = F.regexp_replace(u, _P_WWW, "$1")
    u = F.regexp_replace(u, _P_UTM_AMP, "")
    u = F.regexp_replace(u, _P_UTM_LEAD, "?")
    u = F.regexp_replace(u, _P_UTM_TAIL, "")
    u = F.regexp_replace(u, _P_TRAIL_SLASH, "$1")
    return u


_CANON_SQL = f"""
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  lower(regexp_extract(
                      regexp_replace(raw, '{_P_FRAGMENT}', '', 'g'),
                      '({_P_SCHEME_HOST})', 1))
                  || regexp_replace(
                      regexp_replace(raw, '{_P_FRAGMENT}', '', 'g'),
                      '{_P_SCHEME_HOST}', '', 'g'),
                    '{_P_PORT_HTTPS}', '\\1\\2', 'g'),
                  '{_P_PORT_HTTP}', '\\1\\2', 'g'),
                '{_P_WWW}', '\\1', 'g'),
              '{_P_UTM_AMP}', '', 'g'),
            '{_P_UTM_LEAD}', '?', 'g'),
          '{_P_UTM_TAIL}', '', 'g'),
      '{_P_TRAIL_SLASH}', '\\1', 'g')
"""

_URL_ORACLE = f"""
    WITH caps AS (
        SELECT doc_id, {_SYNTH_URL_SQL} AS raw FROM documents),
    canon AS (
        SELECT doc_id, {_CANON_SQL} AS canon_url FROM caps)
    SELECT canon_url,
           CAST(COUNT(*) AS BIGINT) AS n_caps,
           CAST(MAX(doc_id) AS BIGINT) AS kept_doc,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM canon
    GROUP BY canon_url
"""


@register("docs_url_dedup", _URL_ORACLE, tags=("dedup", "pipeline", "text"))
def docs_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL capture dedup: canonicalize each capture's URL (module
    docstring chain) and keep the LATEST capture (max doc_id) per canonical
    page, with the capture count and first-seen id — the keep/drop table the
    crawl-ingest stage writes before any content dedup runs.

    Both classes fire by construction at sf >= 0.01: the synthetic URL space
    has 3*7*3*|sources| canonical keys (host bucket x page x surviving query
    form — the ref param, the all-utm case that canonicalizes to no query,
    and the utm-LOOKALIKE param ``xutm_keep`` that must survive), so
    hundreds of docs yield both multi-capture pages (n_caps > 1) and
    singletons.

    Shape: canonicalization is zero-shuffle column algebra; the groupBy on
    canon_url is the entry's ONE shuffle, map-side combinable (count/min/max
    partials). Nothing here holds more than one row per distinct page."""
    d = read_table(spark, sf_dir, "documents")
    caps = d.select(
        "doc_id",
        _synth_url_spark(F.col("doc_id"), F.col("source")).alias("raw"),
    )
    canon = caps.select(
        "doc_id", canonicalize_url(F.col("raw")).alias("canon_url")
    )
    return canon.groupBy("canon_url").agg(
        F.count("*").cast("bigint").alias("n_caps"),
        F.max("doc_id").cast("bigint").alias("kept_doc"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


# --------------------------------------------------------------------------
# Crawl frontier scheduling (r9 cont.): the stage between URL dedup and
# fetching — a polite crawler may hit each host at most `rate` times per
# round, so the frontier must be striped into waves host-by-host. The
# relational realization: rank pages within their host, wave = rank DIV
# rate — one window per host (never global), the per-wave politeness bound
# then PROVEN in the output (max_per_host <= rate as a pinned column, not
# a comment).
# --------------------------------------------------------------------------
CRAWL_RATE = 2  # max requests per host per wave


@register(
    "docs_crawl_schedule",
    f"""
    WITH caps AS (
        SELECT doc_id, {_SYNTH_URL_SQL} AS raw FROM documents),
    pages AS (
        SELECT DISTINCT {_CANON_SQL} AS canon_url FROM caps),
    hosted AS (
        SELECT canon_url,
               regexp_extract(canon_url, '^https?://([^/]+)', 1) AS host
        FROM pages),
    waved AS (
        SELECT host, canon_url,
               (ROW_NUMBER() OVER (PARTITION BY host ORDER BY canon_url) - 1)
                   // {CRAWL_RATE} AS wave
        FROM hosted),
    per_host AS (
        SELECT wave, host, CAST(COUNT(*) AS BIGINT) AS n
        FROM waved GROUP BY wave, host)
    SELECT CAST(wave AS BIGINT) AS wave,
           CAST(SUM(n) AS BIGINT) AS n_requests,
           CAST(COUNT(*) AS BIGINT) AS n_hosts,
           CAST(MAX(n) AS BIGINT) AS max_per_host,
           (MAX(n) <= {CRAWL_RATE}) AS politeness_ok
    FROM per_host GROUP BY wave ORDER BY wave
    """,
    tags=("web", "pipeline", "surplus"),
)
def docs_crawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polite crawl-wave schedule over the deduped canonical frontier: pages
    rank within their host (deterministic canon_url order), wave =
    rank DIV {CRAWL_RATE}, and each wave row reports its request count,
    distinct hosts, and the politeness receipt max_per_host <= {CRAWL_RATE}
    as data. Consumes the same canonicalization chain as docs_url_dedup, so
    the frontier this schedules is exactly the keep-set that entry emits.

    Scale shape: canonicalization and host extraction are zero-shuffle
    column algebra; the rank window partitions per HOST (the crawl's
    natural parallelism unit — never a global row_number), and the two
    aggregates are map-side combinable. Wave count grows with the largest
    host's page count / {CRAWL_RATE}; every other dimension is bounded by
    the host count. At 100 TB hot hosts are the skew keys of the (wave,
    host) exchange — AQE territory, not a plan change.

    Reference analogue: none (web tier beside docs_url_dedup)."""
    d = read_table(spark, sf_dir, "documents")
    caps = d.select(
        "doc_id",
        _synth_url_spark(F.col("doc_id"), F.col("source")).alias("raw"),
    )
    pages = caps.select(
        canonicalize_url(F.col("raw")).alias("canon_url")
    ).distinct()
    hosted = pages.select(
        "canon_url",
        F.regexp_extract("canon_url", r"^https?://([^/]+)", 1).alias("host"),
    )
    # DIV (exact integer division) — `/` would detour through doubles and
    # Spark-truncate vs DuckDB-round at the cast (the stats_theil_sen trap)
    waved = hosted.select(
        "host",
        F.expr(
            f"(ROW_NUMBER() OVER (PARTITION BY host ORDER BY canon_url) - 1)"
            f" DIV {CRAWL_RATE}"
        ).alias("wave"),
    )
    per_host = waved.groupBy("wave", "host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return (
        per_host.groupBy("wave")
        .agg(
            F.sum("n").cast("bigint").alias("n_requests"),
            F.count(F.lit(1)).cast("bigint").alias("n_hosts"),
            F.max("n").cast("bigint").alias("max_per_host"),
            (F.max("n") <= CRAWL_RATE).alias("politeness_ok"),
        )
        .select(
            F.col("wave").cast("bigint").alias("wave"),
            "n_requests",
            "n_hosts",
            "max_per_host",
            "politeness_ok",
        )
        .orderBy("wave")
    )
