"""robots.txt filtering (functions/robots.py): RFC 9309 group selection
and decision semantics. The registry query (robots_url_filter) proves
the longest-match/tie/default rules against a closed-form oracle; these
pin the parser's group handling and the join's edge paths."""

from __future__ import annotations

from etl_online_retail_spark.functions.robots import (
    parse_robots,
    robots_decisions,
    robots_rules,
)

FIXTURE = """\
User-agent: A
User-agent: B
Disallow: /a
# comment line
User-agent: *
Disallow: /private/
Allow: /private/pub/
Disallow:

User-agent: special
Disallow: /
Allow: /open/
"""


def test_parse_robots_group_selection():
    # '*' group for an unnamed agent; empty Disallow dropped
    assert parse_robots(FIXTURE) == [
        (False, "/private/"), (True, "/private/pub/")]
    # a named group OVERRIDES '*' entirely (groups never merge)
    assert parse_robots(FIXTURE, agent="special") == [
        (False, "/"), (True, "/open/")]
    assert parse_robots(FIXTURE, agent="SPECIAL") == [
        (False, "/"), (True, "/open/")]
    # multiple User-agent lines head ONE group
    assert parse_robots(FIXTURE, agent="b") == [(False, "/a")]
    # no groups at all -> no rules -> everything allowed downstream
    assert parse_robots("# empty\n") == []
    # a User-agent line after rules starts a NEW group
    two = "User-agent: *\nDisallow: /x\nUser-agent: c\nDisallow: /y\n"
    assert parse_robots(two) == [(False, "/x")]
    assert parse_robots(two, agent="c") == [(False, "/y")]
    # the canonical allow-all idiom: a named group whose ONLY line is
    # an empty Disallow still EXISTS and overrides '*' — goodbot gets
    # everything, not the '*' group's blanket denial (r12 review)
    allow_all = ("User-agent: goodbot\nDisallow:\n\n"
                 "User-agent: *\nDisallow: /\n")
    assert parse_robots(allow_all, agent="goodbot") == []
    assert parse_robots(allow_all) == [(False, "/")]


def test_robots_decisions_semantics(spark):
    hosts = spark.createDataFrame(
        [("h1", FIXTURE), ("h2", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string")
    rules = robots_rules(hosts)
    urls = spark.createDataFrame(
        [(1, "h1", "/private/x"),      # denied
         (2, "h1", "/private/pub/x"),  # longer Allow wins
         (3, "h1", "/other"),          # no match -> allowed
         (4, "h2", "/anything"),       # Disallow / -> denied
         (5, "h3", "/no/robots")],     # host with no rules -> allowed
        "doc_id long, host string, path string")
    got = {r.doc_id: r.allowed for r in
           robots_decisions(urls, rules).collect()}
    assert got == {1: False, 2: True, 3: True, 4: False, 5: True}
