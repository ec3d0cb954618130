"""HTML tokenizer + extraction stage (functions/html.py, stages/html.py)."""

from pyrosar_ray.functions.html import decode_entities, extract_text
from pyrosar_ray.stages.html import build_page


def test_entities():
    assert decode_entities("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") == (
        "a & b <c> \"d\" 'e'"
    )
    assert decode_entities("x&#32;y&#x41;z") == "x yAz"
    # unknown named entity passes through untouched
    assert decode_entities("&copy; &bogus;") == "&copy; &bogus;"


def test_script_style_raw_text():
    """'<' inside script/style is data, not markup — a regex strip
    would emit 'not text' here."""
    html = (
        "<p>before</p>"
        '<script>if (1<2) { var s = "<p>not text</p>"; }</script>'
        "<style>p > a {color:red}</style>"
        "<p>after</p>"
    )
    out = extract_text(html)
    assert out["text"] == "before\nafter"
    assert out["n_blocks"] == 2
    assert out["n_links"] == 0  # the <a ...> inside the style selector text?
    # (style is raw text: 'p > a' never tokenizes)


def test_boilerplate_nesting_and_link_count():
    html = (
        "<nav><div><a href='/'>home</a><a href='/x'>x</a></div></nav>"
        "<p>keep <a href='/w'>word</a> here</p>"
        "<footer>drop <a href='/f'>me</a></footer>"
    )
    out = extract_text(html)
    assert out["text"] == "keep word here"  # inline anchor text kept
    assert out["n_links"] == 4  # nav 2 + inline 1 + footer 1: all seen
    assert out["n_blocks"] == 1


def test_title_comments_doctype():
    html = (
        "<!DOCTYPE html><html><head><title>A &amp; B</title></head>"
        "<body><!-- <p>ghost</p> --><p>real</p></body></html>"
    )
    out = extract_text(html)
    assert out["title"] == "A & B"
    assert out["text"] == "real"


def test_truncated_and_hostile_input_never_raises():
    for frag in ("<p>unclosed", "<script>never ends", "a<", "<>", "<!", "<p"):
        out = extract_text(frag)
        assert isinstance(out["text"], str)


def test_build_page_roundtrip_closed_form():
    """Extraction of a synthesized page equals the closed-form contract."""
    words = [f"w{i}" for i in range(25)]
    text = " ".join(words)
    out = extract_text(build_page(8, text))
    assert out["title"] == "w0 & w1 & w2"
    expect_blocks = [" ".join(words[0:10]), " ".join(words[10:20]), " ".join(words[20:25])]
    assert out["text"] == "\n".join(expect_blocks)
    assert out["n_blocks"] == 3
    # links: 3 nav + aside (8 % 4 == 0) + words 5 and 18 (gw % 13 == 5)
    assert out["n_links"] == 3 + 1 + 2


def test_truncated_raw_text_terminates():
    """Truncated '</script' (no '>') must end the scan, not loop forever."""
    out = extract_text("<p>ok</p><script>x = 1; </script")
    assert out["text"] == "ok"
    out2 = extract_text("<p>ok</p><script>never closed")
    assert out2["text"] == "ok"


def test_out_of_range_entities_pass_through():
    assert decode_entities("&#1114112; &#x110000; &#xD800;") == (
        "&#1114112; &#x110000; &#xD800;"
    )
    assert decode_entities("&#x10FFFF;") == chr(0x10FFFF)


def test_raw_text_case_insensitive_close():
    out = extract_text("<p>a</p><SCRIPT>x</ScRiPt><p>b</p>")
    assert out["text"] == "a\nb"


def test_extract_never_raises_and_terminates_property():
    """Fuzz law: arbitrary tag soup neither raises nor hangs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    soup = st.text(
        alphabet=st.sampled_from(list("<>/abc &#;xX01!\"'=\n\r pscript styleNAV")),
        max_size=300,
    )

    @settings(max_examples=200, deadline=None)
    @given(soup)
    def run(s):
        out = extract_text(s)
        assert isinstance(out["text"], str)
        assert out["n_links"] >= 0

    run()
