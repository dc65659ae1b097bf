"""PII detection / redaction for training-data pipelines (beyond-reference tier).

Training corpora must be scrubbed of emails, phone numbers, and IP addresses
before use. This is pure map-side column algebra — JVM regex engines
(``regexp_replace`` / ``regexp_extract_all``), no UDFs, zero shuffles — so at
100 TB it runs at scan speed, pipelined into whatever shuffle follows.

The synthetic ``documents`` corpus contains no real PII, so the entry injects
a deterministic PII suffix derived from ``doc_id`` into each document first
and then redacts it: the regex machinery (the part a real pipeline reuses) is
exercised and oracle-verified end to end on every row. The patterns are kept
to the syntax subset where Java regex (Spark) and RE2 (DuckDB) agree:
character classes, bounded repetition, non-capturing groups, ``\\b``.

Reference analogue: none (the reference has no text-pipeline tier); this is
part of the SURVEY §2 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skinnerdb_spark.queries.util import read_table
from skinnerdb_spark.registry import register

#: Java-regex / RE2 common-subset patterns.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


@register(
    "text_pii_redact",
    f"""
    WITH dirty AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com tel +1-555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip 10.0.' ||
             CAST(doc_id % 256 AS VARCHAR) || '.' ||
             CAST((doc_id * 7) % 256 AS VARCHAR) AS t
      FROM documents)
    SELECT doc_id,
           CAST(length(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(length(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(length(regexp_extract_all(t, '{IPV4_RE}')) AS BIGINT) AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g'),
             '{IPV4_RE}', '<IP>', 'g') AS redacted
    FROM dirty
    """,
    tags=("text", "pipeline", "privacy"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email / phone / IPv4 redaction with per-category hit counts.

    Redaction order matters only across overlapping pattern families; these
    three are disjoint (emails contain ``@``, phones use dashes, IPs use
    dots between digit runs), so any order yields the same text — emails
    first regardless, since their local part may contain digits and dots.
    """
    d = read_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        doc_id.cast("string"),
        F.lit("@example.com tel +1-555-"),
        F.lpad((doc_id % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."),
        (doc_id % 256).cast("string"),
        F.lit("."),
        ((doc_id * 7) % 256).cast("string"),
    )
    t = d.select("doc_id", dirty.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IPV4_RE,
        "<IP>",
    )
    return t.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(EMAIL_RE), F.lit(0))).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(PHONE_RE), F.lit(0))).cast("bigint").alias("n_phones"),
        F.size(F.regexp_extract_all("t", F.lit(IPV4_RE), F.lit(0))).cast("bigint").alias("n_ips"),
        redacted.alias("redacted"),
    )
