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


def test_link_extraction_zones_and_quoting():
    from pyrosar_ray.functions.html import extract_text

    html = (
        '<nav><a href="/nav">skip me</a></nav>'
        "<p>see <a href=bare>x</a> and <a href='sq'>y &amp; z</a> "
        'and <a href="/dq">plain</a></p>'
        '<footer><a href="/f">also skipped</a></footer>'
    )
    o = extract_text(html)
    # boilerplate links count but carry no anchor
    assert o["n_links"] == 5
    assert o["links"] == [("bare", "x"), ("sq", "y & z"), ("/dq", "plain")]


def test_anchor_agg_over_pages(ray_session):
    import pyarrow as pa
    import ray.data

    from pyrosar_ray.stages.html import anchor_agg, build_page

    words = [f"w{i}" for i in range(20)]
    pages = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([7, 9], type=pa.int64()),
                "html": pa.array(
                    [build_page(7, " ".join(words)),
                     build_page(9, " ".join(words[:10]))],
                    type=pa.string(),
                ),
            }
        )
    )
    out = anchor_agg(pages).to_pandas().set_index("href")
    # positions 5 and 18 are inline links; only doc 7 reaches 18
    assert out.loc["/w/5", "n_refs"] == 2 and out.loc["/w/5", "min_doc"] == 7
    assert out.loc["/w/18", "n_refs"] == 1 and out.loc["/w/18", "min_doc"] == 7
    # nav/aside boilerplate hrefs never appear
    assert not any(h in out.index for h in ("/", "/about", "/contact", "/r"))


def test_href_attribute_boundary_and_nested_boilerplate_close():
    from pyrosar_ray.functions.html import extract_text

    # data-href must not shadow the real href
    o = extract_text('<p><a data-href="/track" href="/real">x</a></p>')
    assert o["links"] == [("/real", "x")]
    # a boilerplate </a> nested inside an open content anchor must not
    # close it early or truncate the anchor text
    o2 = extract_text(
        '<p><a href="/x">foo <nav><a href="/n">n</a></nav> bar</a></p>'
    )
    assert o2["links"] == [("/x", "foo  bar")]
