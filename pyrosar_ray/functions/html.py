"""Minimal-but-honest HTML text extraction — the stage between "fetch
the WARC" and "score the text" in every web-crawl corpus pipeline.

A real single-pass tag tokenizer, not a regex strip:

- raw-text elements (``<script>``, ``<style>``) scan to their closing
  tag — their content never tokenizes (a ``<`` inside JS is data),
- boilerplate containers (``<nav>``, ``<header>``, ``<footer>``,
  ``<aside>``) are dropped with a nesting-aware skip depth,
- character references decode: the five named entities plus decimal
  and hex numeric forms,
- block elements (``<p>``, ``<div>``, headings, ``<li>``) emit
  newline boundaries; inline markup (``<a>``, ``<b>``, ``<span>``)
  contributes its text transparently,
- ``<title>`` is captured separately from body text,
- links are counted where they are ENCOUNTERED (nav links count even
  though their text is dropped — link density is a quality signal).

The extractor is exercised against deterministically synthesized pages
(see stages/html.py) whose expected extraction is closed-form in the
source text, so the whole tokenizer → entity decode → block layout
chain hash-checks against a SQL twin.
"""

from __future__ import annotations

import re

_NAMED = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}
_ENTITY = re.compile(r"&(#x[0-9a-fA-F]+|#[0-9]+|[a-zA-Z]+);")
_RAW_CLOSE = {
    name: re.compile(f"</{name}", re.IGNORECASE) for name in ("script", "style")
}

_RAW_TEXT = ("script", "style")
_SKIP_BLOCKS = ("nav", "header", "footer", "aside")
_BLOCK = ("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
          "table", "tr", "blockquote", "pre", "section", "article")


def decode_entities(text: str) -> str:
    def _sub(m: re.Match) -> str:
        ref = m.group(1)
        if ref.startswith("#"):
            code = int(ref[2:], 16) if ref[1] in "xX" else int(ref[1:])
            if code > 0x10FFFF or 0xD800 <= code <= 0xDFFF:
                return m.group(0)  # garbage refs pass through, never raise
            return chr(code)
        return _NAMED.get(ref.lower(), m.group(0))

    return _ENTITY.sub(_sub, text)


#: href attribute inside an <a> tag: double-quoted, single-quoted or
#: bare. The lookbehind keeps it from matching inside other attribute
#: names (data-href=, ng-href=).
_HREF = re.compile(
    r"""(?<![\w-])href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I
)


def _tag_name(tag: str) -> tuple[str, bool]:
    """``<div class=x>`` → ('div', False); ``</div>`` → ('div', True)."""
    inner = tag[1:-1].strip()
    closing = inner.startswith("/")
    if closing:
        inner = inner[1:]
    name = inner.split()[0].rstrip("/").lower() if inner else ""
    return name, closing


def extract_text(html: str) -> dict:
    """One pass → {title, text, n_links, n_blocks}.

    ``text``: entity-decoded content of kept blocks, one ``\\n`` per
    block boundary, leading/trailing whitespace per block stripped.
    ``n_blocks``: count of non-empty emitted blocks. ``n_links``:
    ``<a>`` open tags seen anywhere (including skipped boilerplate).
    """
    blocks: list[str] = []
    buf: list[str] = []
    title_parts: list[str] = []
    links: list[tuple[str, str]] = []
    anchor_buf: list[str] = []
    cur_href: str | None = None
    in_title = False
    skip_depth = 0
    n_links = 0
    i, n = 0, len(html)

    def _flush() -> None:
        text = "".join(buf).strip()
        buf.clear()
        if text:
            blocks.append(text)

    while i < n:
        lt = html.find("<", i)
        if lt == -1:
            chunk = html[i:]
            if chunk:
                if in_title:
                    title_parts.append(chunk)
                elif skip_depth == 0:
                    buf.append(decode_entities(chunk))
            break
        if lt > i:
            chunk = html[i:lt]
            if in_title:
                title_parts.append(chunk)
            elif skip_depth == 0:
                buf.append(decode_entities(chunk))
                if cur_href is not None:
                    anchor_buf.append(chunk)
        gt = html.find(">", lt)
        if gt == -1:
            break  # truncated trailing tag: ignore
        tag = html[lt : gt + 1]
        i = gt + 1
        if tag.startswith("<!--"):
            end = html.find("-->", lt)
            i = n if end == -1 else end + 3
            continue
        if tag.startswith("<!"):
            continue  # doctype
        name, closing = _tag_name(tag)
        if not closing and name in _RAW_TEXT:
            # case-insensitive search WITHOUT lowercasing the document
            # (lower() is O(n) per tag and can change string length,
            # e.g. U+0130, misaligning indices); truncated close tags
            # end the scan rather than restarting it (find '>' == -1
            # must never wrap i back to 0)
            m2 = _RAW_CLOSE[name].search(html, i)
            if m2 is None:
                break
            gt2 = html.find(">", m2.end())
            if gt2 == -1:
                break
            i = gt2 + 1
            continue
        if name == "a":
            if not closing:
                n_links += 1
                # content-zone links carry the anchor-text signal;
                # boilerplate (nav/aside/footer) links only count
                if skip_depth == 0:
                    m_href = _HREF.search(tag)
                    raw = (
                        next(g for g in m_href.groups() if g is not None)
                        if m_href
                        else ""
                    )
                    cur_href = decode_entities(raw)
                    anchor_buf.clear()
            elif cur_href is not None and skip_depth == 0:
                # skip_depth gate: a boilerplate </a> nested inside an
                # open content anchor must not close it early
                links.append(
                    (cur_href, decode_entities("".join(anchor_buf)).strip())
                )
                cur_href = None
        if name == "title":
            in_title = not closing
            continue
        if name in _SKIP_BLOCKS:
            if closing:
                skip_depth = max(0, skip_depth - 1)
            else:
                skip_depth += 1
            continue
        if name in _BLOCK and skip_depth == 0:
            _flush()
    _flush()
    return {
        "title": decode_entities("".join(title_parts)).strip(),
        "text": "\n".join(blocks),
        "n_links": n_links,
        "n_blocks": len(blocks),
        "links": links,
    }
