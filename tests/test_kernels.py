"""Unit tests for the pure kernel library (functions/)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions import (
    blacklist,
    hasher,
    html,
    robots,
    textstats,
    tokenize,
    urlnorm,
)


class TestHasher:
    def test_alphabet_matches_reference_table(self):
        # Spot values from the literal table at Hasher.java:8-26.
        assert hasher.BYTE2CHARS[0] == "aa"
        assert hasher.BYTE2CHARS[15] == "pa"
        assert hasher.BYTE2CHARS[16] == "qa"
        assert hasher.BYTE2CHARS[25] == "za"
        assert hasher.BYTE2CHARS[26] == "ac"
        assert hasher.BYTE2CHARS[51] == "zc"
        assert hasher.BYTE2CHARS[52] == "ae"
        assert hasher.BYTE2CHARS[230] == "wq"
        assert hasher.BYTE2CHARS[234] == "as"
        assert hasher.BYTE2CHARS[255] == "vs"

    def test_sign_fixup_quirk(self):
        # Hasher.java:35 — byte 0 renders index 255 ("vs"), u>=128 renders u-1.
        assert hasher._U2CHARS[0] == "vs"
        assert hasher._U2CHARS[1] == hasher.BYTE2CHARS[1]
        assert hasher._U2CHARS[127] == hasher.BYTE2CHARS[127]
        assert hasher._U2CHARS[128] == hasher.BYTE2CHARS[127]
        assert hasher._U2CHARS[255] == hasher.BYTE2CHARS[254]

    def test_hash_shape_and_determinism(self):
        h = hasher.ref_hash("https://example.com/")
        assert len(h) == 40 and h.islower()
        assert h == hasher.ref_hash("https://example.com/")
        assert h != hasher.ref_hash("https://example.com/x")

    # KeyEncoder.java writes Integer.toHexString(ch) (variable length) but
    # decode consumes exactly two hex digits — so the reference itself only
    # round-trips characters in [0x10, 0xff].  Property holds on that domain.
    @given(st.text(alphabet=st.characters(min_codepoint=0x10, max_codepoint=0xFF), max_size=50))
    @settings(max_examples=50)
    def test_key_encode_roundtrip(self, s):
        assert hasher.key_decode(hasher.key_encode(s)) == s


class TestUrlNorm:
    def test_parse_url(self):
        assert urlnorm.parse_url("https://a.com:8080/x/y") == [
            "https", "a.com", "8080", "/x/y"]
        assert urlnorm.parse_url("http://a.com") == ["http", "a.com", None, "/"]
        assert urlnorm.parse_url("/rel/path") == [None, None, None, "/rel/path"]

    def test_seed_normalization(self):
        f = urlnorm.normalize_seed_url
        assert f("https://en.wikipedia.org/wiki/Main_Page#frag") == (
            "https://en.wikipedia.org/wiki/Main_Page")
        assert f("https://a.com") == "https://a.com/"
        assert f("http://a.com:8080/p") == "http://a.com:8080/p"
        assert f("https://a.com:443/p") == "https://a.com/p"
        assert f("notaurl") is None

    def test_normalize_and_filter(self):
        f = urlnorm.normalize_and_filter_url
        base = "https://a.com/x/y.html"
        assert f(base, "b.html") == "https://a.com/x/b.html"
        assert f(base, "/top.html") == "https://a.com/top.html"
        assert f(base, "//b.com/p") == "https://b.com/p"
        assert f(base, "http://c.com") == "http://c.com/"
        assert f(base, "c.html#frag") == "https://a.com/x/c.html"
        assert f(base, "mailto:x@y.z") is None
        assert f(base, "javascript:void(0)") is None
        # Reference quirk: only mailto:/javascript: are dropped up front;
        # an ftp: href falls into the relative-path branch (Crawler.java:566-578).
        assert f(base, "ftp://c.com/f") == "https://a.com/x/ftp://c.com/f"
        assert f(base, "#only-frag") is None
        assert f(base, "/a/./b/../c.html") == "https://a.com/a/c.html"

    def test_dotdot_collapse_non_idempotent_regex(self):
        # Crawler.java:592-595 — replaceAll applied while "/../" remains.
        f = urlnorm.normalize_and_filter_url
        assert f("https://a.com/", "/p/q/../../r.html") == "https://a.com/r.html"

    def test_hostname_java_uri_semantics(self):
        assert urlnorm.hostname("https://X.com/a") == "x.com"
        assert urlnorm.hostname("page.html") == "page.html"  # http:// retry
        assert urlnorm.hostname("mailto:x") == ""
        assert urlnorm.hostname("#foo") == ""
        assert urlnorm.hostname("//b.com/p") == "b.com"
        assert urlnorm.hostname("") == ""
        assert urlnorm.hostname("has space.com") == ""

    def test_host_key_and_path(self):
        assert urlnorm.extract_host_key("https://a.com/p") == "a.com:443"
        assert urlnorm.extract_host_key("http://a.com:8080/p") == "a.com:8080"
        assert urlnorm.extract_path("https://a.com") == "/"
        assert urlnorm.extract_protocol("https://a.com/") == "https"

    def test_pagerank_normalize_keeps_port(self):
        # PageRank.java:786-816 — explicit port always kept.
        f = urlnorm.pagerank_normalize_url
        assert f("/x", "https://a.com/p") == "https://a.com:443/x"
        assert f("b.html", "http://a.com/d/p") == "http://a.com:80/d/b.html"
        assert f("ftp://x/y", "http://a.com/") is None


class TestBlacklist:
    def test_host_extension_substring_language(self):
        assert not blacklist.should_crawl("https://www.facebook.com/x")
        assert not blacklist.should_crawl("https://a.com/f.PDF")
        assert not blacklist.should_crawl("https://a.com/page?utm_source=z")
        assert not blacklist.should_crawl("https://a.com/api/items")
        assert not blacklist.should_crawl("https://a.com/de/page")
        assert not blacklist.should_crawl("ftp://a.com/x")
        assert blacklist.should_crawl("https://a.com/fine.html")

    def test_skippable(self):
        assert blacklist.is_skippable_href("")
        assert blacklist.is_skippable_href("  ")
        assert blacklist.is_skippable_href("#sec")
        assert blacklist.is_skippable_href("MAILTO:a@b")
        assert not blacklist.is_skippable_href("/x.html")

    def test_urldefense(self):
        u = "https://urldefense.com/v3/__https://real.com/p__;!!x"
        assert blacklist.unwrap_urldefense(u) == "https://real.com/p"
        assert blacklist.unwrap_urldefense("https://a.com/x") == "https://a.com/x"
        assert blacklist.unwrap_urldefense("https://urldefense.com/nomarks") is None


class TestRobots:
    RB = "User-agent: cis5550-crawler\nDisallow: /priv\nCrawl-delay: 2\nUser-agent: *\nDisallow: /\n"

    def test_reference_bug_always_allows(self):
        # Crawler.java:832 vs 881/886 — separator mismatch ⇒ allow everything.
        assert robots.robots_allows(200, self.RB, "/priv/x") is True
        assert robots.robots_allows(200, "User-agent: *\nDisallow: /", "/") is True

    def test_gating(self):
        assert robots.robots_allows(404, self.RB, "/priv") is True
        assert robots.robots_allows(-1, self.RB, "/priv") is True
        assert robots.robots_allows(500, self.RB, "/priv") is True
        assert robots.robots_allows(200, "", "/priv") is True

    def test_strict_mode(self):
        assert robots.robots_allows_strict(200, self.RB, "/priv/x") is False
        assert robots.robots_allows_strict(200, self.RB, "/pub") is True
        star = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
        assert robots.robots_allows_strict(200, star, "/a/x") is False
        assert robots.robots_allows_strict(200, star, "/a/b/c") is True

    def test_crawl_delay(self):
        assert robots.extract_crawl_delay(self.RB) == "2"
        assert robots.extract_crawl_delay("User-agent: *\nCrawl-delay: nope") is None
        assert robots.extract_crawl_delay("User-agent: *\nCrawl-delay: 0.5") == "0.5"


PAGE = (
    "<html><head><title>A Title</title>"
    '<meta name="description" content="Meta Desc"></head>'
    "<body>Start <a href=\"/x.html\">x</a> mid "
    "<a href='rel.html'>r</a> <a href=bare.html>b</a> "
    '<img src="/pic.png"> tail</body></html>'
)


class TestHtml:
    def test_extract_urls_quoting_forms(self):
        assert html.extract_urls(PAGE) == ["/x.html", "rel.html", "bare.html"]

    def test_title_and_snippet(self):
        assert html.extract_title(PAGE) == "A Title"
        assert html.generate_snippet(PAGE) == "Meta Desc"

    def test_snippet_fallbacks(self):
        sem = "<html><body><main>Main content here</main>x</body></html>"
        assert html.generate_snippet(sem) == "Main content here"
        plain = "<html><body>" + ("word " * 100) + "</body></html>"
        # body text path skips first 300 chars
        assert html.generate_snippet(plain).startswith("word")

    def test_body_text_variants(self):
        h = "<html><head><style>s{}</style></head><body>A <b>B</b>\n<script>bad\njs</script> C</body></html>"
        idx = html.extract_body_text_index(h)
        # Indexer regex lacks DOTALL: multi-line script survives tag-strip
        assert "bad js" in idx
        pr = html.extract_body_text_pagerank(h)
        assert "bad" not in pr and "A B C" == pr
        tf = html.extract_body_text_tfidf(h)
        assert "bad" not in tf and tf == "A B C"

    def test_spans_order_and_fields(self):
        spans = html.build_spans(PAGE)
        kinds = [s["kind"] for s in spans]
        assert kinds == ["title", "text", "link", "link", "link", "media"]
        offsets = [s["offset"] for s in spans]
        assert offsets == sorted(offsets)
        assert spans[0]["text"] == "A Title"
        assert spans[-1]["media_ref"] == "/pic.png"
        link_texts = [s["text"] for s in spans if s["kind"] == "link"]
        assert link_texts == ["/x.html", "rel.html", "bare.html"]

    def test_pagerank_links_capped_and_absolute(self):
        body = "".join(f'<a href="/p{i}.html">x</a>' for i in range(40))
        links = html.extract_links_pagerank("https://a.com/", f"<body>{body}</body>")
        assert len(links) == html.MAX_OUT_LINKS
        assert links[0] == "https://a.com:443/p0.html"


class TestTokenize:
    def test_az_split(self):
        assert tokenize.tokenize_az("Al-pha! BETA2gamma") == ["al", "pha", "beta", "gamma"]

    def test_stopwords_and_length(self):
        assert tokenize.tokenize_az("the and of") == []
        long = "x" * 26
        assert tokenize.tokenize_az(long) == []
        assert tokenize.tokenize_az("x" * 25) == ["x" * 25]

    def test_index_words_min_freq(self):
        assert tokenize.index_words("alpha alpha beta") == ["alpha"]
        assert tokenize.index_words("alpha beta", min_freq=1) == ["alpha", "beta"]

    def test_query_tokens(self):
        assert tokenize.query_tokens("The Quick brown") == ["quick", "brown"]


class TestTextStats:
    def test_quality(self):
        q = textstats.quality_stats("the cat sat")
        assert q["n_tokens"] == 3 and q["n_chars"] == 11
        assert q["stopword_ratio"] == pytest.approx(1 / 3)

    def test_langid(self):
        assert textstats.lang_id("the cat sat on the mat and it was nice") == "en"
        assert textstats.lang_id("der hund und die katze in den garten") == "de"
        assert textstats.lang_id("") == "und"

    def test_fingerprint_stable(self):
        assert textstats.fingerprint("a  b\tc") == textstats.fingerprint("a b c")
        assert textstats.fingerprint("a b") != textstats.fingerprint("a c")

    def test_shingles_jaccard(self):
        a = textstats.shingles("a b c d", k=2)
        b = textstats.shingles("a b c e", k=2)
        assert textstats.jaccard(a, a) == 1.0
        assert 0 < textstats.jaccard(a, b) < 1

    def test_minhash_similarity_tracks_jaccard(self):
        import numpy as np

        a_p, b_p = textstats.minhash_params(128)
        s1 = textstats.shingles("the quick brown fox jumps over the lazy dog " * 3)
        s2 = textstats.shingles("the quick brown fox jumps over the lazy cat " * 3)
        s3 = textstats.shingles("completely different text about other things entirely")
        m1 = textstats.minhash_signature(s1, a_p, b_p)
        m2 = textstats.minhash_signature(s2, a_p, b_p)
        m3 = textstats.minhash_signature(s3, a_p, b_p)
        sim12 = float(np.mean(m1 == m2))
        sim13 = float(np.mean(m1 == m3))
        assert sim12 > sim13
        assert sim12 == pytest.approx(textstats.jaccard(s1, s2), abs=0.2)

    def test_simhash_hamming(self):
        h1 = textstats.simhash("the quick brown fox jumps over the lazy dog")
        h2 = textstats.simhash("the quick brown fox jumps over the lazy cat")
        h3 = textstats.simhash("unrelated words entirely different content")
        assert textstats.hamming64(h1, h2) < textstats.hamming64(h1, h3)

    def test_levenshtein(self):
        assert textstats.levenshtein("kitten", "sitting") == 3
        assert textstats.levenshtein("", "abc") == 3
        assert textstats.levenshtein("abc", "abc") == 0

    def test_tf_idf_formulas(self):
        import math

        assert textstats.tf(1) == 1.0
        assert textstats.idf(9, 4) == pytest.approx(math.log(2.0))
