"""URL canonicalization — the crawl-pipeline stage ahead of exact dedup.

Web corpora carry the same page under many raw urls (tracking params, case
noise, trailing slashes, fragments); deduplicating by raw url misses them
all. Canonicalization spec (frozen; deterministic, pure string algebra —
no UDF on either engine):

1. strip the fragment (``#...``);
2. lowercase scheme+host (everything before the first ``/`` after ``://``),
   path case preserved;
3. drop a ``www.`` host prefix;
4. strip trailing ``/`` from the path;
5. drop tracking params (``utm_*``, ``fbclid``, ``gclid``), SORT the
   remaining params, rebuild the query (dropped entirely when empty).

Scale shape: one narrow projection per row, entirely inside whole-stage
codegen; the canonical column then feeds the standard hash-groupBy dedup
(``dedup_exact``) or bucketed storage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pii_spark.util import read_table as _t

# any param whose NAME starts with one of these is dropped — covers
# fbclid=..., bare fbclid, gclid_src=...; extend the tuple and both the
# Spark filter and the generated oracle predicate pick it up
_TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")

# dialect-shared messy-url construction (Spark SQL ∩ DuckDB)
_MESSY_URL_SQL = """
  'HTTPS://WWW.Site-' || CAST(doc_id % 23 AS STRING) || '.Example.COM'
  || '/Path/' || CAST(doc_id % 7 AS STRING)
  || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
  || '?'
  || CASE WHEN doc_id % 3 = 0 THEN 'utm_source=news&' ELSE '' END
  || 'id=' || CAST(doc_id % 50 AS STRING)
  || CASE WHEN doc_id % 5 = 0 THEN '&fbclid=x' || CAST(doc_id AS STRING) ELSE '' END
  || CASE WHEN doc_id % 4 = 0 THEN '&ref=abc' ELSE '' END
  || CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END
"""


def host_of(url: Column) -> Column:
    """Lowercased host of ``url`` (empty string when no scheme://host
    prefix parses). The host capture stops at '/', '?' AND '#' so pathless
    urls (https://site.com), query-only urls (...com?id=9) and fragment
    urls key under their real host, never under ''. Shared by the
    streaming per-host counters and the host-cap mixing operator — one
    definition, so keys can never drift between them."""
    return F.lower(F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1))


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the frozen spec — pyspark builtins only
    (regexp + array HOFs; stays in whole-stage codegen). The host capture
    stops at '/', '?' or '#' so a pathless url with a query
    (http://site.com?id=9) never folds the query into the lowercased host.
    """
    from functools import reduce  # noqa: PLC0415
    from operator import and_  # noqa: PLC0415

    no_frag = F.split(url, "#").getItem(0)
    scheme_host = F.regexp_extract(no_frag, r"^([^/?#]*//[^/?#]*)", 1)
    host = F.regexp_replace(F.lower(scheme_host), r"//www\.", "//")
    rest = F.substring(no_frag, F.length(scheme_host) + 1, F.lit(1 << 30))
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1),
                            r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: reduce(and_, (~p.startswith(t) for t in _TRACKING_PREFIXES),
                         p != ""),
    ))
    qpart = F.when(F.size(kept) > 0,
                   F.concat(F.lit("?"), F.array_join(kept, "&"))
                   ).otherwise(F.lit(""))
    return F.concat(host, path, qpart)


def register_queries(register) -> None:
    # the oracle's tracking filter is generated from the same constant, so
    # extending _TRACKING_PREFIXES updates both engines together
    not_tracking_sql = " AND ".join(
        f"NOT starts_with(p, '{t}')" for t in _TRACKING_PREFIXES)

    @register(
        "url_canonicalize",
        oracle=rf"""
        WITH raw AS (
          SELECT doc_id, {_MESSY_URL_SQL} AS url
          FROM documents WHERE doc_id < 500
        ),
        parts AS (
          SELECT doc_id,
                 string_split(url, '#')[1] AS nf
          FROM raw
        ),
        split1 AS (
          SELECT doc_id, nf,
                 regexp_extract(nf, '^([^/?#]*//[^/?#]*)', 1) AS sh
          FROM parts
        ),
        comps AS (
          SELECT doc_id,
                 regexp_replace(lower(sh), '//www\.', '//') AS host,
                 regexp_replace(
                   regexp_extract(substr(nf, length(sh) + 1), '^([^?]*)', 1),
                   '/+$', '') AS path,
                 regexp_extract(substr(nf, length(sh) + 1), '\?(.*)$', 1)
                   AS query
          FROM split1
        ),
        canon AS (
          SELECT doc_id, host, path,
                 list_sort(list_filter(string_split(query, '&'),
                     p -> p <> '' AND {not_tracking_sql})) AS kept
          FROM comps
        )
        SELECT doc_id,
               host || path ||
               CASE WHEN len(kept) > 0
                    THEN '?' || array_to_string(kept, '&') ELSE '' END
                 AS canon
        FROM canon ORDER BY doc_id
        """,
    )
    def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-row canonical url over deterministically messy raw urls
        (tracking params, case noise, trailing slashes, fragments). Spark
        side: the canonical_url builtin-expression chain; oracle: an
        independent DuckDB re-derivation with list functions."""
        d = (
            _t(spark, sf_dir, "documents")
            .where("doc_id < 500")
            .select("doc_id", F.expr(_MESSY_URL_SQL).alias("url"))
        )
        return d.select("doc_id", canonical_url(F.col("url")).alias("canon")) \
            .orderBy("doc_id")
