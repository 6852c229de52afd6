"""Web-ingestion operators: HTML extraction, URL normalization,
license/canary scan (operators/web.py).

Pins exact outputs on hand-built inputs (the oracle gate covers the
fixture-scale equivalence; these pin the individual rules) and asserts
the plans stay scan-side (no Exchange — pure projections).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scrappy_spark.operators.web import (
    CANARY_TOKEN,
    extract_html_text,
    license_scan,
    normalize_urls,
)


def _one(df, col):
    return df.select(col).collect()[0][0]


class TestExtractHtmlText:
    def test_full_page(self, spark):
        page = (
            "<html><head><title>My Title</title>"
            "<style>body{color:red} a>b{}</style>"
            "<script>if(a<b&&c>d){alert('x')}</script></head>"
            "<body><!-- secret <comment> -->"
            "<h1>Header</h1><p>one two</p><p>three</p>"
            "<ul><li>item &amp; more</li></ul>"
            "</body></html>"
        )
        df = spark.createDataFrame([(page,)], "html string")
        out = _one(extract_html_text(df), "clean_text")
        assert out == "My Title\nHeader\none two\nthree\nitem & more"

    def test_script_style_comment_payload_never_leaks(self, spark):
        page = "a<script>SECRET1</script><style>SECRET2</style><!--SECRET3-->b"
        df = spark.createDataFrame([(page,)], "html string")
        out = _one(extract_html_text(df), "clean_text")
        assert "SECRET" not in out
        assert out == "ab"  # whole blocks vanish, no separator injected

    def test_entity_decode_order(self, spark):
        # &amp;lt; must decode to literal "&lt;" (amp last), and decoded
        # angle brackets must NOT be re-stripped as tags.
        df = spark.createDataFrame(
            [("&lt;tag&gt; &amp;lt; &quot;q&#39;s&quot;&nbsp;end",)], "html string"
        )
        out = _one(extract_html_text(df), "clean_text")
        assert out == "<tag> &lt; \"q's\" end"

    def test_whitespace_collapse(self, spark):
        df = spark.createDataFrame(
            [("  <p>a   b</p>\n\n<p>c</p>  ",)], "html string"
        )
        assert _one(extract_html_text(df), "clean_text") == "a b\nc"

    def test_plan_is_scan_side(self, spark):
        df = spark.createDataFrame([("<p>x</p>",)], "html string")
        plan = extract_html_text(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestNormalizeUrls:
    def _norm(self, spark, url):
        df = spark.createDataFrame([(url,)], "url string")
        return normalize_urls(df).collect()[0].asDict()

    def test_default_port_and_www_and_fragment(self, spark):
        r = self._norm(spark, "HTTPS://WWW.Example.COM:443/Path/Sub/?x=1#frag")
        assert r["scheme"] == "https"
        assert r["host"] == "example.com"
        assert r["url_norm"] == "https://example.com/Path/Sub?x=1"

    def test_non_default_port_kept(self, spark):
        r = self._norm(spark, "http://ex.com:8080/a")
        assert r["url_norm"] == "http://ex.com:8080/a"

    def test_http_80_dropped(self, spark):
        r = self._norm(spark, "http://ex.com:80/a")
        assert r["url_norm"] == "http://ex.com/a"

    def test_tracking_params_stripped_real_kept(self, spark):
        r = self._norm(
            spark, "https://ex.com/p?utm_source=f&id=3&ref=tw&q=spark&fbclid=x"
        )
        assert r["query_clean"] == "id=3&q=spark"
        assert r["url_norm"] == "https://ex.com/p?id=3&q=spark"

    def test_all_params_tracking_gives_bare_url(self, spark):
        r = self._norm(spark, "https://ex.com/p?utm_source=f&gclid=1")
        assert r["query_clean"] == ""
        assert r["url_norm"] == "https://ex.com/p"

    def test_root_path(self, spark):
        r = self._norm(spark, "https://ex.com")
        assert r["path_norm"] == "/"
        assert r["url_norm"] == "https://ex.com/"

    def test_registered_domain_two_label_suffix(self, spark):
        r = self._norm(spark, "https://news.bbc.co.uk/x")
        assert r["registered_domain"] == "bbc.co.uk"

    def test_registered_domain_plain(self, spark):
        r = self._norm(spark, "https://a.b.example.org/x")
        assert r["registered_domain"] == "example.org"

    def test_plan_is_scan_side(self, spark):
        df = spark.createDataFrame([("https://ex.com/",)], "url string")
        plan = normalize_urls(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestBlocklistFilter:
    def test_drops_blocked_keeps_rest(self, spark):
        from scrappy_spark.operators.web import blocklist_filter

        df = spark.createDataFrame(
            [(1, "ex.com"), (2, "bad.com"), (3, "news.co.uk")],
            ["id", "registered_domain"],
        )
        bl = spark.createDataFrame([(" BAD.com ",), ("other.org",)], ["domain"])
        out = blocklist_filter(df, bl)
        assert sorted(r["id"] for r in out.collect()) == [1, 3]  # list normalized

    def test_plan_broadcasts_blocklist(self, spark):
        from scrappy_spark.operators.web import blocklist_filter

        df = spark.createDataFrame([(1, "ex.com")], ["id", "registered_domain"])
        bl = spark.createDataFrame([("bad.com",)], ["domain"])
        plan = (
            blocklist_filter(df, bl)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


class TestNormalizeIdempotence:
    def test_normalize_is_idempotent_over_adversarial_grid(self, spark):
        """normalize(normalize(u)) == normalize(u) for the cartesian
        grid of every feature the normalizer handles — the canonical-
        form property that makes url_norm a safe dedup key (re-crawled
        already-normal URLs must map to themselves)."""
        from itertools import product

        from scrappy_spark.operators.web import normalize_urls

        schemes = ["http", "HTTPS", "ftp"]
        hosts = [
            "WWW.Ex.COM", "ex.co.uk", "a.b.Ex.org",
            "EX.com:8080", "ex.com:443", "ex.com:80",
        ]
        paths = ["", "/", "/A/b/", "/x//y///"]
        queries = ["", "?utm_source=1", "?a=1&utm_x=2&b=2", "?ref=x", "?a=1&a=2"]
        frags = ["", "#f"]
        urls = [
            (f"{s}://{h}{p}{q}{f},".rstrip(","),)
            for s, h, p, q, f in product(schemes, hosts, paths, queries, frags)
        ]
        df = spark.createDataFrame(urls, "url string")
        once = normalize_urls(df).select(
            "url_norm", "scheme", "host", "registered_domain"
        )
        twice = normalize_urls(
            once.select(F.col("url_norm").alias("url")), "url"
        ).select("url_norm", "scheme", "host", "registered_domain")
        a = sorted(tuple(r) for r in once.collect())
        b = sorted(tuple(r) for r in twice.collect())
        assert a == b and len(a) == len(urls)


class TestLicenseScan:
    def _scan(self, spark, text):
        df = spark.createDataFrame([(text,)], "text string")
        return license_scan(df).collect()[0].asDict()

    def test_each_marker(self, spark):
        cases = {
            "under a Creative Commons Attribution license": "cc-by",
            "the MIT License applies": "mit",
            "Apache License, Version 2.0": "apache-2.0",
            "GNU General Public License": "gpl",
            "no license here": "unknown",
        }
        for text, want in cases.items():
            assert self._scan(spark, text)["license"] == want, text

    def test_priority_on_dual_license(self, spark):
        # cc-by outranks mit in LICENSE_MARKERS order
        r = self._scan(spark, "MIT License or Creative Commons Attribution")
        assert r["license"] == "cc-by"

    def test_canary(self, spark):
        assert self._scan(spark, f"x {CANARY_TOKEN} y")["canary_hit"] is True
        assert self._scan(spark, "clean doc")["canary_hit"] is False

    def test_case_insensitive(self, spark):
        assert self._scan(spark, "mIt LiCeNsE")["license"] == "mit"


class TestPslDomain:
    def _run(self, spark, hosts, suffixes):
        from scrappy_spark.operators.web import registered_domain_psl

        hdf = spark.createDataFrame([(h,) for h in hosts], ["host"])
        psl = spark.createDataFrame([(s,) for s in suffixes], ["suffix"])
        return {
            r["host"]: r["registered_domain"]
            for r in registered_domain_psl(hdf, psl).collect()
        }

    def test_longest_match_wins_on_overlap(self, spark):
        got = self._run(spark, ["a.b.co.uk", "plain.uk"], ["uk", "co.uk"])
        assert got == {"a.b.co.uk": "b.co.uk", "plain.uk": "plain.uk"}

    def test_unknown_tld_falls_back_to_last_two(self, spark):
        got = self._run(spark, ["x.y.unknowntld"], ["com"])
        assert got == {"x.y.unknowntld": "y.unknowntld"}

    def test_host_equal_to_suffix_falls_back(self, spark):
        # a bare public suffix has no registered domain; documented
        # fallback is last-two-labels
        got = self._run(spark, ["co.uk"], ["uk", "co.uk"])
        assert got == {"co.uk": "co.uk"}

    def test_plan_broadcasts_psl(self, spark):
        from scrappy_spark.operators.web import registered_domain_psl

        hdf = spark.createDataFrame([("a.b.com",)], ["host"])
        psl = spark.createDataFrame([("com",)], ["suffix"])
        plan = (
            registered_domain_psl(hdf, psl)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestExtractLinks:
    def test_messy_attrs_nested_markup_and_decoy(self, spark):
        from scrappy_spark.operators.web import extract_links

        html = (
            '<a class="x" href="https://a.com/1" rel="nofollow">Read <b>en</b> more</a>'
            ' <a name="decoy">no href</a> <a href="/rel/2">rel link</a>'
        )
        df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
        rows = extract_links(df).orderBy("link_pos").collect()
        assert [(r["link_pos"], r["href"], r["anchor_text"]) for r in rows] == [
            (0, "https://a.com/1", "Read en more"),
            (1, "/rel/2", "rel link"),
        ]

    def test_no_links_no_rows(self, spark):
        from scrappy_spark.operators.web import extract_links

        df = spark.createDataFrame([(1, "<p>plain</p>")], ["doc_id", "html"])
        assert extract_links(df).count() == 0
