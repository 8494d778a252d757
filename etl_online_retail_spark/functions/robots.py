"""robots.txt (RFC 9309) URL filtering — crawl compliance as a join.

A compliant crawl pipeline must drop URLs its robots.txt rules
disallow. RFC 9309's decision procedure: within the applicable
user-agent group, the rule with the LONGEST matching path prefix wins;
on an exact length tie, Allow beats Disallow; a URL matching no rule is
allowed; an empty Disallow value matches nothing.

Shape at scale: robots files are a per-HOST dimension, but a real
crawl's host dimension is NOT small — Common Crawl sees tens of
millions of distinct hosts — so the parse runs distributed (an
Arrow-batched mapInPandas over host partitions; parse_robots is a pure
function) and the URL-side decision is a size-GUARDED broadcast join
followed by one max_by aggregation picking the winning rule per URL:
while the rule relation fits the broadcast bound it ships to executors,
past it the join degrades to an ordinary host-partitioned shuffle
instead of an OOM (r12 verdict finding 1). The only Python is the
per-host parse, which never touches the URL fact.

Scope: the '*' user-agent group plus an optionally named agent whose
group overrides '*' entirely (RFC 9309 §2.2.1: the crawler obeys the
most specific matching group ONLY, groups do not merge). The `%xx` and
`$`/`*` wildcard extensions are deliberately out: prefix rules cover
the synthetic fixture and the overwhelming majority of real files, and
a wildcard engine would push the hot path into Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULE_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("allow", T.BooleanType()),
    T.StructField("prefix", T.StringType()),
])


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """(allow, path_prefix) rules of the group governing `agent`.

    Groups are selected per RFC 9309 §2.2.1: a group named exactly
    `agent` (case-insensitive) overrides the '*' group entirely; when
    several User-agent lines head one group, the group applies to each.
    Unknown directives and comments are skipped; empty Allow/Disallow
    values match nothing and are dropped here (matching the "empty
    pattern matches nothing" rule with zero join fan-out)."""
    star: list[tuple[bool, str]] = []
    named: list[tuple[bool, str]] = []
    group_agents: list[str] = []
    in_rules = False
    found_named = False
    a = agent.lower()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_rules:       # a new group starts
                group_agents = []
                in_rules = False
            group_agents.append(value.lower())
            continue
        if key not in ("allow", "disallow"):
            continue
        in_rules = True
        # the named group EXISTS the moment it carries any allow/
        # disallow line — including the canonical empty "Disallow:"
        # allow-all idiom. Marking existence only for non-empty values
        # made such an agent fall back to (and be denied by) the '*'
        # group (r12 review, RFC 9309 group-override violation).
        if a in group_agents:
            found_named = True
        if not value:
            continue
        rule = (key == "allow", value)
        if a in group_agents:
            named.append(rule)
        if "*" in group_agents:
            star.append(rule)
    return named if found_named else star


def robots_rules(robots: DataFrame, host_col: str = "host",
                 text_col: str = "robots_txt",
                 agent: str = "*") -> DataFrame:
    """(host, allow, prefix) — one row per governing rule per host.

    The parse runs INSIDE an Arrow-batched mapInPandas over however the
    host dimension is partitioned: a map-only stage, no shuffle, no
    driver materialization — tens of millions of hosts cost exactly one
    pass over their partitions. (The r12 shape collected every
    (host, robots_txt) row to the driver, which dies at real crawl host
    counts.) parse_robots stays the single parser for both scales."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            hosts: list = []
            allows: list = []
            prefixes: list = []
            for host, text in zip(pdf[host_col], pdf[text_col]):
                for allow, prefix in parse_robots(text or "", agent=agent):
                    hosts.append(host)
                    allows.append(allow)
                    prefixes.append(prefix)
            yield pd.DataFrame({
                "host": pd.Series(hosts, dtype="object"),
                "allow": pd.Series(allows, dtype="bool"),
                "prefix": pd.Series(prefixes, dtype="object"),
            })

    return robots.select(host_col, text_col).mapInPandas(gen, RULE_SCHEMA)


def robots_decisions(urls: DataFrame, rules: DataFrame,
                     host_col: str = "host",
                     path_col: str = "path") -> DataFrame:
    """urls + an `allowed` column, RFC 9309 longest-match semantics.

    Left-join URLs to their host's rules on prefix match — broadcast
    while the rule relation's size estimate fits the bound, an ordinary
    host-keyed join past it (size_guarded_broadcast: a crawl-scale rule
    relation must degrade to a shuffle, not OOM the executors) — then
    pick the winning rule per URL with one max_by over (prefix length,
    allow): longest prefix wins, Allow beats Disallow on ties, no match
    means allowed.
    Group keys are the URL row's columns — BIT-IDENTICAL duplicate rows
    collapse to one; carry a row id column (as the registry query does)
    when multiplicity matters. Scale note: every urls column rides the
    decision aggregation's shuffle, so pass (id, host, path) and join
    payload columns back afterwards — never the fetched bodies."""
    from etl_online_retail_spark.operators.joins import (
        size_guarded_broadcast,
    )

    r = size_guarded_broadcast(rules).alias("_r")
    u = urls.alias("_u")
    joined = u.join(
        r, (F.col(f"_u.{host_col}") == F.col("_r.host"))
        & F.col(f"_u.{path_col}").startswith(F.col("_r.prefix")),
        "left")
    key = F.struct(F.length("_r.prefix").alias("_l"),
                   F.col("_r.allow").alias("_a"))
    return (joined.groupBy(*[F.col(f"_u.{c}") for c in urls.columns])
            .agg(F.max_by(F.col("_r.allow"), key).alias("_win"))
            .withColumn("allowed", F.coalesce(F.col("_win"), F.lit(True)))
            .drop("_win"))
