"""Domain-level web curation: the Common-Crawl-shaped policy pass.

Web corpora are curated per DOMAIN before any per-document signal runs:
blocklisted domains drop wholesale, over-represented domains are capped
to a per-domain document budget (SEO farms otherwise dominate the token
distribution), and domain statistics drive the next crawl's policy.

All operators are deterministic and engine-reproducible:
- `extract_domain` is a codegen regexp over the URL column;
- per-domain caps select by hash order (md5 bucket, the repo's sampling
  convention) — re-running, repartitioning, or porting engines keeps the
  SAME documents.

Scale: one groupBy(domain) for stats (partial-aggregated; domain keys are
Zipfian — the biggest domain at 100 TB is still one reducer's worth of
COUNTS, not documents); the cap is a window rank per domain over doc
hashes, shuffling each domain's rows once. A blocklist ships as a
broadcast anti-join when it is a table, or a codegen isin() when it is a
literal list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: scheme://host[:port]/... → host, lowercased; None for unparseable
_DOMAIN_RE = r"^[a-z][a-z0-9+.-]*://([^/:?#]+).*$"


def extract_domain(url_col) -> "F.Column":
    host = F.regexp_extract(F.lower(url_col), _DOMAIN_RE, 1)
    return F.when(host == "", None).otherwise(host)


def domain_stats(df: DataFrame, url_col: str, tokens_col: str) -> DataFrame:
    """(domain, n_docs, n_tokens, doc_share) — the crawl-policy report."""
    from pyspark.sql.window import Window

    by_dom = (
        df.select(extract_domain(F.col(url_col)).alias("domain"),
                  F.col(tokens_col))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tokens_col).alias("n_tokens"),
        )
    )
    total = Window.partitionBy()
    return by_dom.withColumn(
        "doc_share", F.round(F.col("n_docs") / F.sum("n_docs").over(total), 4)
    )


def apply_domain_policy(
    df: DataFrame,
    url_col: str,
    id_col: str,
    blocklist: list[str],
    max_docs_per_domain: int,
) -> DataFrame:
    """Drop blocklisted domains, then keep at most `max_docs_per_domain`
    documents per domain — selected by md5(id) hash order (ties by id),
    so the kept set is independent of partitioning and engine. Documents
    with no parseable domain pass through unblocked but still capped
    (under the NULL domain key): unparseable is not a free pass."""
    from pyspark.sql.window import Window

    dom = extract_domain(F.col(url_col))
    out = df.withColumn("__dom__", dom).filter(
        F.col("__dom__").isNull() | ~F.col("__dom__").isin(blocklist)
    )
    w = Window.partitionBy("__dom__").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        out.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= max_docs_per_domain)
        .drop("__dom__", "__rk__")
    )
