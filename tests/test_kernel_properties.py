"""Property tests: kernels never throw on adversarial input, and their
structural invariants hold (hypothesis-driven)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.blacklist import (
    is_skippable_href,
    should_crawl,
    unwrap_urldefense,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.hasher import (
    key_decode,
    key_encode,
    ref_hash,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.html import (
    build_spans,
    extract_urls,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.robots import (
    extract_crawl_delay,
    robots_allows,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.urlnorm import (
    extract_host_key,
    hostname,
    normalize_and_filter_url,
    normalize_seed_url,
)

text = st.text(max_size=300)
urlish = st.one_of(
    text,
    st.from_regex(r"https?://[a-z0-9.\-]{1,20}(:[0-9]{1,5})?(/[\x20-\x7e]{0,50})?",
                  fullmatch=True),
)


@settings(max_examples=300, deadline=None)
@given(base=urlish, href=st.one_of(st.none(), text, urlish))
def test_normalize_total_and_idempotent_output(base, href):
    out = normalize_and_filter_url(base, href)
    if out is not None:
        assert out.startswith(("http://", "https://"))
        # canonical outputs re-normalize to themselves against any base
        assert normalize_and_filter_url(out, out) == normalize_and_filter_url(
            "http://x.test/", out
        )


@settings(max_examples=300, deadline=None)
@given(u=st.one_of(st.none(), text, urlish))
def test_url_projections_never_throw(u):
    hostname(u)
    if u is not None:
        extract_host_key(u)
        normalize_seed_url(u)
        should_crawl(u)
        is_skippable_href(u)
        unwrap_urldefense(u)
        ref_hash(u)


@settings(max_examples=200, deadline=None)
@given(
    s=st.text(
        alphabet=st.characters(min_codepoint=0x10, max_codepoint=0xFF),
        max_size=50,
    )
)
def test_key_encode_roundtrip(s):
    """REFERENCE BUG, reproduced: KeyEncoder.encode emits
    variable-length hex (Integer.toHexString) but decode always reads
    exactly two chars (KeyEncoder.java:9-27), so the roundtrip only
    holds for code points in [0x10, 0xFF] — the property is asserted on
    that domain."""
    assert key_decode(key_encode(s)) == s


@settings(max_examples=200, deadline=None)
@given(html=text)
def test_span_offsets_monotonic(html):
    spans = build_spans(html)
    offsets = [s["offset"] for s in spans]
    assert offsets == sorted(offsets)
    for s in spans:
        assert s["kind"] in ("title", "text", "link", "media")
    # link spans carry the raw href text exactly as extract_urls sees it
    hrefs = [s["text"] for s in spans if s["kind"] == "link"]
    assert hrefs == extract_urls(html)


@settings(max_examples=200, deadline=None)
@given(robots=st.one_of(st.none(), text), path=text,
       status=st.integers(-1, 600))
def test_robots_eval_never_throws(robots, path, status):
    robots_allows(status, robots, path)
    extract_crawl_delay(robots)


# ---------------------------------------------------------------------------
# Round-2 hot-path kernels: the optimized forms must be byte-equal to the
# straightforward reference implementations they replaced.
# ---------------------------------------------------------------------------


def _hostname_slow(url):
    """Pre-fast-path hostname(): branch-by-branch java.net.URI emulation."""
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions import (
        urlnorm as un,
    )

    if url is None or not url.strip():
        return ""
    u = url.strip()
    try:
        host = un._uri_get_host(u)
        if host is None:
            prefixed = ("http:" if u.startswith("//") else "http://") + u
            host = un._uri_get_host(prefixed)
        return host.lower() if host is not None else ""
    except ValueError:
        return ""


@settings(max_examples=400, deadline=None)
@given(urlish)
def test_hostname_fast_path_matches_slow_path(u):
    assert hostname(u) == _hostname_slow(u)


@settings(max_examples=300, deadline=None)
@given(urlish)
def test_host_key_and_path_matches_separate_helpers(u):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.urlnorm import (
        extract_path,
        host_key_and_path,
    )

    assert host_key_and_path(u) == (extract_host_key(u), extract_path(u))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=100))
def test_ref_hash_byte_pair_table_matches_str_table(s):
    import hashlib

    from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.hasher import (
        _U2CHARS,
    )

    digest = hashlib.sha1(s.encode("utf-8")).digest()
    assert ref_hash(s) == "".join(_U2CHARS[b] for b in digest)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=50))
def test_splitmix64_array_matches_scalar(xs):
    import numpy as np

    from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.synthetic_web import (
        splitmix64,
        splitmix64_array,
    )

    got = splitmix64_array(np.array(xs, dtype=np.uint64))
    assert [int(g) for g in got] == [splitmix64(x) for x in xs]


def test_text_corpus_renders_identical_to_tuple():
    import pyarrow as pa

    from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.synthetic_web import (
        SyntheticWeb,
        TextCorpus,
        WebConfig,
    )

    texts = ("alpha beta gamma " * 60, "short", "delta epsilon " * 40, "x" * 401)
    tc = TextCorpus.from_arrow(pa.array(list(texts)))
    assert isinstance(tc, TextCorpus)
    assert len(tc) == len(texts)
    web_t = SyntheticWeb(WebConfig(n_docs=4000, n_hosts=40, texts=texts,
                                   paragraphs=5, links_per_doc=6))
    web_c = SyntheticWeb(WebConfig(n_docs=4000, n_hosts=40, texts=tc,
                                   paragraphs=5, links_per_doc=6))
    checked = 0
    for i in range(0, 4000, 13):
        u = web_t.url_of(i)
        m = web_t.page_meta(u)
        if m and m["status"] == 200 and m["html"]:
            assert web_t.render_page(i) == web_c.render_page(i)
            checked += 1
    assert checked > 100


def test_text_corpus_non_ascii_falls_back_to_tuple():
    import pyarrow as pa

    from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.synthetic_web import (
        TextCorpus,
    )

    fb = TextCorpus.from_arrow(pa.array(["héllo wörld", "ok"]))
    assert isinstance(fb, tuple) and fb[0] == "héllo wörld"


@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),            # user/group key
            st.integers(0, 10**6),        # event_id / orderkey
            st.integers(0, 50),           # ts / price rank source
        ),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=60, deadline=None)
def test_latest_per_key_matches_bruteforce(rows):
    import pandas as pd
    import pyarrow as pa

    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.events import (
        _latest_per_key,
    )

    # event_id must be unique (it is in the events table; it's the tiebreaker)
    seen, uniq = set(), []
    for k, e, t in rows:
        if e not in seen:
            seen.add(e)
            uniq.append((k, e, t))
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in uniq], pa.int64()),
            "event_id": pa.array([r[1] for r in uniq], pa.int64()),
            "ts": pa.array([r[2] for r in uniq], pa.timestamp("us")),
            "event_type": pa.array(["x"] * len(uniq), pa.string()),
            "value": pa.array([0.0] * len(uniq), pa.float64()),
        }
    )
    got = _latest_per_key(t).to_pandas().sort_values("user_id").reset_index(drop=True)
    df = t.to_pandas()
    want = (
        df.sort_values(["ts", "event_id"])
        .groupby("user_id", as_index=False)
        .last()
        .sort_values("user_id")
        .reset_index(drop=True)[got.columns]
        if len(df)
        else got
    )
    pd.testing.assert_frame_equal(got, want)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),  # priority
            st.integers(0, 10**6),             # orderkey
            st.floats(0, 1000),                # totalprice
        ),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=60, deadline=None)
def test_topk_per_group_matches_bruteforce(rows):
    import pandas as pd
    import pyarrow as pa

    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.relational import (
        TOPK_PER_GROUP,
        _topk_per_group,
    )

    seen, uniq = set(), []
    for p, k, v in rows:
        if k not in seen:
            seen.add(k)
            uniq.append((p, k, v))
    t = pa.table(
        {
            "o_orderpriority": pa.array([r[0] for r in uniq], pa.string()),
            "o_orderkey": pa.array([r[1] for r in uniq], pa.int64()),
            "o_totalprice": pa.array([r[2] for r in uniq], pa.float64()),
        }
    )
    got = (
        _topk_per_group(t)
        .to_pandas()
        .sort_values(["o_orderpriority", "o_orderkey"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    if len(df):
        want = (
            df.sort_values(
                ["o_orderpriority", "o_totalprice", "o_orderkey"],
                ascending=[True, False, True],
            )
            .groupby("o_orderpriority", as_index=False)
            .head(TOPK_PER_GROUP)
            .sort_values(["o_orderpriority", "o_orderkey"])
            .reset_index(drop=True)
        )
    else:
        want = got
    pd.testing.assert_frame_equal(got, want)


@settings(max_examples=60, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="abcdefg XY1.,'", max_size=60),
        min_size=1,
        max_size=12,
    ),
    split=st.integers(min_value=1, max_value=11),
)
def test_doc_scorer_batch_split_invariant(docs, split):
    """model_score's actor kernel is pure per batch: scoring all docs in
    one call equals scoring any prefix/suffix split through one actor
    instance (the memo must not change results, only speed)."""
    import pyarrow as pa

    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.traindata import (
        DocScorerModel,
    )

    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    whole = DocScorerModel()(t).to_pandas()
    k = min(split, len(docs))
    scorer = DocScorerModel()
    a = scorer(t.slice(0, k)).to_pandas()
    b = scorer(t.slice(k)).to_pandas()
    import pandas as pd

    joined = pd.concat([a, b], ignore_index=True)
    pd.testing.assert_frame_equal(whole, joined)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=120)), max_size=12))
def test_doc_token_counts_matches_scalar_tokenizer(texts):
    """The vectorized arrow batch tokenizer is exactly word_counts()
    per document — same split, length cap, stopword drop — for
    arbitrary (incl. None / empty / non-ascii) inputs."""
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.tokenize import (
        doc_token_counts,
        word_counts,
    )

    tbl = doc_token_counts(texts).to_pandas()
    for i, t in enumerate(texts):
        ref = dict(word_counts(t or ""))
        sub = tbl[tbl.doc == i]
        got = dict(zip(sub.word, (int(c) for c in sub.c)))
        assert got == ref, (i, t, got, ref)


def _lev(a: str, b: str) -> int:
    """Reference DP levenshtein (the DuckDB oracle's semantics)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_word = st.text(alphabet="abcde", min_size=1, max_size=8)


@settings(max_examples=500, deadline=None)
@given(a=_word, b=_word)
def test_edit1_matches_reference_levenshtein(a, b):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.textpipe import (
        _edit1,
    )

    if a != b:
        assert _edit1(a, b) == (_lev(a, b) == 1)


@settings(max_examples=500, deadline=None)
@given(a=_word, b=_word)
def test_deletion_key_blocking_is_complete(a, b):
    """The fuzzy join's correctness rests on: any two distinct words at
    levenshtein distance 1 share at least one single-deletion key (the
    key set `expand` generates: the word itself plus every
    delete-one-character variant).  Verify the claim exhaustively over
    random word pairs — a missed pair here would be a silent recall
    hole in q_fuzzy_token_join."""

    def keys(w):
        return {w} | {w[:i] + w[i + 1:] for i in range(len(w))}

    if a != b and _lev(a, b) == 1:
        assert keys(a) & keys(b)


@settings(max_examples=200, deadline=None)
@given(
    texts=st.lists(st.one_of(st.none(), st.text(max_size=160)), max_size=10),
    k=st.integers(min_value=2, max_value=6),
)
def test_shingle_explode_matches_scalar_shingler(texts, k):
    """The vectorized batch shingler (dedup_ngram/minhash front-end)
    must produce exactly the scalar ``shingles(text, k)`` set per doc —
    including the short-doc whole-join lane, empty/None docs, and
    every ASCII-whitespace separator (incl. \\v, which RE2's \\s
    lacks)."""
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.textstats import (
        shingle_explode,
        shingles,
    )

    tbl = shingle_explode(texts, k)
    got: dict = {}
    for d, s in zip(tbl["doc"].to_pylist(), tbl["shingle"].to_pylist()):
        got.setdefault(d, set()).add(s)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == shingles(t or "", k), (i, t)
