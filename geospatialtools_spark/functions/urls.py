"""URL canonicalization and URL-level deduplication.

Web-crawl corpora are deduplicated by URL before any content-level pass:
the same page is fetched under `http://` and `https://`, with and without
`www.`, with tracking parameters (`utm_*`, `gclid`, `fbclid`) appended by
every referrer, with default ports spelled out, and with or without a
trailing slash. CCNet (Wenzek et al. 2020) and RefinedWeb (Penedo et al.
2023) both run a URL-normalize + keep-one-per-URL stage first because it
removes refetch duplicates for the cost of a string expression — far
cheaper than MinHash on the duplicate content.

Reference scope: the reference engine (chaneyn/geospatialtools) has no
web-corpus surface; this module is part of the mandated training-data
pipeline layer, same as ``lines.py`` / ``dedup.py``.

Two operators, two execution shapes:

- ``canonicalize_url``: a PURE per-row Catalyst expression (regexp
  decompose -> normalize each component -> rebuild). Zero shuffle,
  stateless, streaming-safe; the whole pass stays inside the scan stage
  at 100 TB.
- ``url_dedup``: one shuffle keyed on the canonical URL electing a keeper
  per group via ``min(struct(-preference, id))`` — an algebraic aggregate,
  so map-side partial aggregation collapses hot URLs (link-farm targets,
  homepage refetches) BEFORE the exchange; URL skew never travels, the
  same shape as ``lines.line_dedup``.

Canonicalization rules (ordered, and the full contract — anything not
listed is left byte-for-byte intact):

1. trim surrounding whitespace;
2. rows without a ``scheme://`` prefix pass through trimmed and otherwise
   untouched (no scheme guessing);
3. scheme lowercased;
4. authority: lowercased, ``user:pass@`` userinfo dropped, default port
   stripped (``:80`` for http, ``:443`` for https — only the scheme's own
   default), leading ``www.`` dropped;
5. path: trailing slashes stripped (``/`` alone becomes empty). Path case
   and percent-encoding are preserved — paths are case-sensitive per
   RFC 3986, and %-triple case normalization is declared out of scope;
6. query: split on ``&``; empty params and tracking params matching
   ``TRACKING_PARAM_RE`` (utm_*, gclid, fbclid, msclkid, ref — case-
   insensitive) dropped; survivors sorted bytewise and re-joined (param
   ORDER is not identity-bearing for the canonical key); a query left
   empty loses its ``?``;
7. fragment dropped.

Every regex is RE2-compatible (no lookaround/backreferences) and every
class is ASCII, so the DuckDB oracle twin (``SQL_CANON_URL`` below — the
SAME rule chain as a SQL template, kept in this module so the two engines
cannot drift) evaluates the identical function.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One alternation, shared verbatim by the Spark and DuckDB rule chains.
# (?i) is supported by both Java regex and RE2; `(=.*)?$` makes valueless
# `ref` / `utm_campaign` params match too.
TRACKING_PARAM_RE = r"(?i)^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)(=.*)?$"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def _host_expr(scheme: Column, auth_raw: Column) -> Column:
    """The ONE host-derivation chain (shared by canonicalize_url and
    url_host so the rules cannot drift, per the module-header warning):
    lowercase, strip credentials, strip the scheme's default port, strip
    leading ``www.`` and any trailing dot (a trailing-dot FQDN is the
    same host to DNS — without this rule 'spam.com.' bypasses a
    'spam.com' blocklist entry)."""
    auth = F.regexp_replace(F.lower(auth_raw), r"^[^@]*@", "")
    auth = (F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
             .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
             .otherwise(auth))
    host = F.regexp_replace(auth, r"^www\.", "")
    return F.regexp_replace(host, r"\.+$", "")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` under the module-contract rules above.

    Pure Catalyst expression — regexp_extract/replace + array HOFs, no
    UDF, zero shuffle. NULL in, NULL out.
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    after = F.regexp_replace(u, _SCHEME_RE, "")
    auth_raw = F.regexp_extract(after, r"^[^/?#]*", 0)
    rest = after.substr(F.length(auth_raw) + 1, F.length(after))
    path = F.regexp_extract(rest, r"^[^?#]*", 0)
    query = F.regexp_extract(rest, r"\?([^#]*)", 1)

    host = _host_expr(scheme, auth_raw)

    path_c = F.regexp_replace(path, r"/+$", "")

    params = F.filter(
        F.split(query, "&"),
        lambda x: (F.length(x) > 0) & ~x.rlike(TRACKING_PARAM_RE))
    query_c = F.array_join(F.array_sort(params), "&")

    rebuilt = F.concat(
        scheme, F.lit("://"), host, path_c,
        F.when(F.length(query_c) > 0, F.concat(F.lit("?"), query_c))
         .otherwise(F.lit("")))
    return (F.when(url.isNull(), F.lit(None).cast("string"))
             .when(scheme == "", u)
             .otherwise(rebuilt))


def sql_canonicalize_parts(u: str) -> dict[str, str]:
    """The decompose steps of the rule chain as DuckDB SQL expression
    strings over the raw-URL SQL expression ``u``. The gate twin chains
    them through CTE columns (trimmed -> scheme/after_s -> auth_raw/rest_s
    -> host/path_c/query_c -> canon), mirroring ``canonicalize_url`` step
    for step so the two engines evaluate the same function. Aliases carry
    an ``_s`` suffix where the bare word is (or may become) a SQL keyword."""
    return {
        "trimmed": f"trim({u})",
        "scheme": r"lower(regexp_extract(trimmed, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1))",
        "after_s": r"regexp_replace(trimmed, '^[A-Za-z][A-Za-z0-9+.\-]*://', '')",
        "auth_raw": r"regexp_extract(after_s, '^[^/?#]*', 0)",
        "rest_s": "substr(after_s, length(auth_raw) + 1)",
        "path_s": r"regexp_extract(rest_s, '^[^?#]*', 0)",
        "query_s": r"regexp_extract(rest_s, '\?([^#]*)', 1)",
        "host": (
            "regexp_replace(regexp_replace(CASE"
            " WHEN scheme = 'http' THEN regexp_replace("
            "regexp_replace(lower(auth_raw), '^[^@]*@', ''), ':80$', '')"
            " WHEN scheme = 'https' THEN regexp_replace("
            "regexp_replace(lower(auth_raw), '^[^@]*@', ''), ':443$', '')"
            " ELSE regexp_replace(lower(auth_raw), '^[^@]*@', '')"
            " END, '^www\\.', ''), '\\.+$', '')"),
        "path_c": "regexp_replace(path_s, '/+$', '')",
        "query_c": (
            "array_to_string(list_sort(list_filter(string_split(query_s, '&'),"
            " x -> len(x) > 0 AND NOT regexp_matches(x,"
            f" '{TRACKING_PARAM_RE}'))), '&')"),
        "canon": (
            "CASE WHEN trimmed IS NULL THEN NULL"
            " WHEN scheme = '' THEN trimmed"
            " ELSE scheme || '://' || host || path_c ||"
            " (CASE WHEN len(query_c) > 0 THEN '?' || query_c ELSE '' END)"
            " END"),
    }


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id",
              prefer_col: str | None = None) -> DataFrame:
    """One row per canonical URL: ``canon_url``, the elected ``keeper``
    (the row id to retain) and ``n_dups`` (group size). The keeper is the
    row with the LARGEST ``prefer_col`` (a numeric quality/length signal;
    NULL preference sorts last), ties broken by the smallest ``id_col`` —
    without a ``prefer_col`` the smallest id wins outright.

    Execution shape: canonicalize is a per-row expression on the scan;
    the election is ONE ``groupBy(canon_url)`` whose ``min(struct(-pref,
    id))`` aggregate is algebraic — map-side partial aggregation absorbs
    hot-URL skew before the shuffle (the ``line_dedup`` shape). Callers
    keep survivors with a semi-join of ``keeper`` back onto ``id_col``.
    """
    w = (F.col(prefer_col).cast("double") if prefer_col is not None
         else F.lit(0.0))
    base = df.select(
        canonicalize_url(F.col(url_col)).alias("canon_url"),
        F.col(id_col).alias("_id"),
        # NULL preference must lose to any real value: -NULL is NULL and
        # NULLs sort FIRST inside struct min, which would make it win —
        # map it to +inf so it sorts last instead.
        F.coalesce(-w, F.lit(float("inf"))).alias("_negw"))
    return (base.groupBy("canon_url")
            .agg(F.count("*").cast("long").alias("n_dups"),
                 F.min(F.struct(F.col("_negw"), F.col("_id"))).alias("_win"))
            .select("canon_url", F.col("_win._id").alias("keeper"),
                    "n_dups"))


def url_host(url: Column) -> Column:
    """Registrable host of ``url`` under the module's canonical rules
    (lowercased, credentials and default ports stripped, leading ``www.``
    and trailing dot dropped — the shared ``_host_expr`` chain) — the key
    for host-level blocklists, the mixture domain column, and the
    webgraph. NULL/schemeless in, NULL out."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    after = F.regexp_replace(u, _SCHEME_RE, "")
    host = _host_expr(scheme, F.regexp_extract(after, r"^[^/?#]*", 0))
    return F.when(url.isNull() | (scheme == ""),
                  F.lit(None).cast("string")).otherwise(host)


def filter_blocklisted(df: DataFrame, blocklist: DataFrame,
                       url_col: str = "url",
                       domain_col: str = "domain") -> DataFrame:
    """Drop rows whose URL host is a blocklisted domain OR any subdomain
    of one (``ads.example.com`` falls to a block on ``example.com``) —
    the UT1/shallalist-style ban step every web-crawl curation runs
    before spending compute on the text.

    Blocklist entries are normalized through the SAME host rules as the
    URL side (lowercase, leading ``www.`` and trailing dot stripped), so
    a ``www.spam.com`` entry — common in real UT1 files — bans
    ``spam.com`` exactly like the host derivation would produce it.

    Scale shape: the blocklist (even the usual few-hundred-thousand-
    entry UT1 list, ~MBs) is collected ONCE and shipped to executors
    inside an Arrow-UDF closure; the verdict (any of the host's
    O(#labels) parent-domain suffixes in the set) is computed IN PLACE —
    no join, no explode, no shuffle anywhere, the filter pipelines
    inside the scan stage. This replaces an earlier suffix-explode +
    anti-join form whose final join re-shuffled the payload on the row
    key. NULL/schemeless URLs have no host and are KEPT (no silent
    drops; filter them separately if unwanted)."""
    entries = blocklist.select(
        F.col(domain_col).cast("string").alias("d")).collect()
    bset = frozenset(
        r["d"].strip().lower().rstrip(".").removeprefix("www.")
        for r in entries if r["d"])

    @F.pandas_udf("boolean")
    def _blocked(h: pd.Series) -> pd.Series:
        def hit(host):
            if not host:
                return False
            parts = host.split(".")
            return any(".".join(parts[i:]) in bset
                       for i in range(len(parts)))
        return h.map(hit)

    return df.filter(~F.coalesce(_blocked(url_host(F.col(url_col))),
                                 F.lit(False)))
