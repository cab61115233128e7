"""HTML extraction (M1/M2) and rate-limiter (T1) semantics."""

import time

import pytest

from uci_searchengine_ray.functions import html as H
from uci_searchengine_ray.state.rate_limiter import RateLimiter


def test_extract_title():
    assert H.extract_title("<html><title>My Page</title></html>") == "My Page"
    assert H.extract_title("<TITLE> spaced </TITLE>") == "spaced"
    assert H.extract_title("<p>no title</p>", fallback="http://u") == "http://u"
    assert H.extract_title("<title></title>", fallback="u") == "u"


def test_extract_text_drops_script_style_comments():
    page = """
    <html><head><style>body{color:red}</style>
    <script>var x = "<b>not text</b>";</script></head>
    <body><!-- hidden --><h1>Head</h1><p>Alpha  beta</p>
    <div>gamma &amp; delta</div></body></html>
    """
    text = H.extract_text(page)
    assert "color" not in text and "var x" not in text and "hidden" not in text
    # get_text() concatenates adjacent text nodes with NO separator
    # (crawler.py:415): "Head" and "Alpha" touch, the source newline
    # separates "beta" / "gamma"
    assert text == "HeadAlpha beta gamma & delta"


def test_extract_text_malformed_html():
    # unclosed <script>: everything to EOF is script CDATA (bs4 drops the
    # decomposed subtree, i.e. all of it)
    assert H.extract_text("<p>a</p><script>var x; <p>hidden") == "a"
    # case-insensitive close tag ends the CDATA run
    assert H.extract_text("<script>x</SCRIPT><p>b</p>") == "b"
    # "</script>" inside <style> does not end the style CDATA block
    assert H.extract_text("<style>a</script>b</style><p>c</p>") == "c"
    # stray close tags and tag soup are just skipped tokens; adjacent data
    # concatenates with no separator, exactly like get_text()
    assert H.extract_text("</div>text</p><b <i>rest") == "textrest"
    # bogus declarations and CDATA sections are not text nodes
    assert H.extract_text("<![CDATA[zap]]><p>ok</p>") == "ok"
    # nested/unclosed block structure: only data events matter
    assert H.extract_text("<div><p>a<p>b</div>c") == "abc"


def test_extract_title_malformed():
    # element child inside <title> -> bs4 .string is None -> URL fallback
    assert H.extract_title("<title>a<b>c</b></title>", fallback="u") == "u"
    # only the FIRST title element counts
    assert H.extract_title("<title>one</title><title>two</title>") == "one"
    # attributes on the tag are fine
    assert H.extract_title('<title data-x="y">t</title>') == "t"


def test_parse_page_title_fallback_to_url():
    title, text = H.parse_page("http://x/y", "<p>hello</p>")
    assert title == "http://x/y"
    assert text == "hello"


def test_rate_limiter_intervals():
    rl = RateLimiter(requests_per_second=10)  # 100ms interval
    assert rl.try_acquire("a", now=100.0)
    assert not rl.try_acquire("a", now=100.05)
    assert rl.seconds_until_allowed("a", now=100.05) == pytest.approx(0.05)
    assert rl.try_acquire("a", now=100.11)
    # keys are independent
    assert rl.try_acquire("b", now=100.05)
    rl.reset("a")
    assert rl.try_acquire("a", now=100.12)
    with pytest.raises(ValueError):
        RateLimiter(0)


def test_rate_limiter_wait_blocks():
    rl = RateLimiter(requests_per_second=50)  # 20ms
    rl.wait("k")
    t0 = time.monotonic()
    slept = rl.wait("k")
    assert time.monotonic() - t0 >= 0.015
    assert slept > 0


def test_rate_limiter_actor(ray_session):
    import ray
    from uci_searchengine_ray.state.rate_limiter import RateLimiterActor

    # 500ms interval: delays are COMPUTED, not slept, so the test stays
    # fast — and scheduler jitter between actor messages (observed ±40%
    # wall variance on this host) cannot eat the spacing the way a 10ms
    # interval could, which made the old assertion flake under contention
    actor = RateLimiterActor.remote(requests_per_second=2)
    delays = ray.get([actor.acquire.remote("dom") for _ in range(5)])
    # five immediate reservations serialize at ~500ms spacing
    assert delays[0] == 0.0
    assert all(b >= a for a, b in zip(delays, delays[1:]))
    # ideal spacing gives 2.0s; allow up to 1s of cumulative message jitter
    assert delays[-1] >= 1.0
    assert ray.get(actor.acquire.remote("other")) == 0.0
