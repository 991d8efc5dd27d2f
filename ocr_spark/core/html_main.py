"""HTML main-content extraction: boilerplate stripping with block scoring.

Boilerpipe/readability-style heuristic over a stdlib ``html.parser`` DOM
walk (lxml is not available in this environment, and the parse is a
single forward pass anyway):

1. Segment the document into text blocks at block-level tag boundaries
   (``p``, ``div``, ``li``, ``h1-6``, ``td``, ``br`` …).
2. Score each block: word count + link density (chars of text inside
   ``<a>`` / total chars).
3. Drop blocks that live inside structural boilerplate containers
   (``nav``/``header``/``footer``/``aside``), link-farm blocks
   (link density ≥ 0.34), and trivially short blocks (< 3 words).
4. Emit kept blocks in document order with exact char spans into the RAW
   html string (entity-aware, CRLF-aware).

This generalizes the reference's "table region detection" + per-category
gating (W11 block spans + P3 confidence gate, SURVEY.md §2.4/§2.2):
region segmentation, per-region score, keep/drop — but over HTML blocks
with density scoring instead of regex-bounded invoice tables.

Offsets: ``HTMLParser.getpos()`` returns (1-based line, 0-based col)
against the fed string; we convert to absolute char offsets through a
precomputed line-start table of the raw text. Spans therefore always
index the raw payload (SURVEY.md §7 hard part (a)).
"""

from __future__ import annotations

import html as _html
import re
from html.parser import HTMLParser
from typing import NamedTuple

from ocr_spark.core.normalize import collapse_all_ws, fix_confusables, normalize_unicode

# Content inside these elements is never text content.
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "head", "title", "svg"})
# Structural boilerplate containers: blocks opened inside them are dropped.
_BOILER_TAGS = frozenset({"nav", "header", "footer", "aside"})
# Tags whose open/close ends the current text block.
_BLOCK_TAGS = frozenset({
    "html", "body", "main", "article", "section", "div", "p", "br", "hr",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "ul", "ol", "li",
    "dl", "dt", "dd", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote",
    "pre", "form", "figure", "figcaption", "address",
})

_MIN_WORDS = 3
_MIN_SOLID_CHARS = 12  # unsegmented-script fallback (no whitespace words)
_MAX_LINK_DENSITY = 0.34


class Block(NamedTuple):
    text: str        # normalized (entity-decoded, ws-collapsed) block text
    start: int       # raw char offset of first text chunk
    end: int         # raw char offset one past last text chunk
    link_chars: int
    total_chars: int
    boiler: bool

    @property
    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0

    @property
    def kept(self) -> bool:
        # word-count gate fails for unsegmented scripts (CJK/Thai have
        # no spaces) — a 12+ non-space-char block passes regardless of
        # word segmentation; short junk ("Read more") stays dropped
        substantial = (
            len(self.text.split()) >= _MIN_WORDS
            or len(self.text.replace(" ", "")) >= _MIN_SOLID_CHARS
        )
        return (
            not self.boiler
            and substantial
            and self.link_density < _MAX_LINK_DENSITY
        )


class _MainContentParser(HTMLParser):
    """Single forward pass; accumulates text chunks between block edges."""

    def __init__(self, raw: str):
        # convert_charrefs=False so entity/charref callbacks fire with
        # their own positions — needed for exact raw spans.
        super().__init__(convert_charrefs=False)
        self._raw = raw
        # absolute offset of the start of each physical line ('\n'-split,
        # matching HTMLParser's internal line counting); str.find keeps
        # the scan C-side (O(lines) python iterations, not O(chars))
        self._line_starts = [0]
        pos = raw.find("\n")
        while pos != -1:
            self._line_starts.append(pos + 1)
            pos = raw.find("\n", pos + 1)
        self._skip_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._chunks: list[tuple[int, int, str]] = []  # (start, end, decoded)
        self._block_boiler = False
        self._block_link_chars = 0
        self.blocks: list[Block] = []

    # -- offset helpers -------------------------------------------------
    def _abs_pos(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    # -- block lifecycle ------------------------------------------------
    def _flush(self) -> None:
        if not self._chunks:
            self._block_link_chars = 0
            self._block_boiler = False
            return
        decoded = "".join(c[2] for c in self._chunks)
        normalized = normalize_unicode(fix_confusables(decoded))
        text = collapse_all_ws(normalized)
        # total is the collapsed length of the RAW decoded text; when
        # normalization was an identity (the common case) that equals
        # len(text) — skip the second collapse pass
        total = len(text) if normalized == decoded else len(collapse_all_ws(decoded))
        start = self._chunks[0][0]
        end = self._chunks[-1][1]
        if text:
            self.blocks.append(
                Block(
                    text=text,
                    start=start,
                    end=end,
                    link_chars=min(self._block_link_chars, total),
                    total_chars=total,
                    boiler=self._block_boiler,
                )
            )
        self._chunks = []
        self._block_link_chars = 0
        self._block_boiler = False

    def _add_chunk(self, start: int, end: int, decoded: str) -> None:
        if self._skip_depth > 0 or not decoded:
            return
        if not self._chunks:
            self._block_boiler = self._boiler_depth > 0
        self._chunks.append((start, end, decoded))
        if self._link_depth > 0:
            self._block_link_chars += len(collapse_all_ws(decoded))

    # -- parser callbacks -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        if tag in _BOILER_TAGS:
            self._flush()
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag):
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag in _BOILER_TAGS and self._boiler_depth > 0:
            self._flush()
            self._boiler_depth -= 1
        if tag == "a" and self._link_depth > 0:
            self._link_depth -= 1

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        start = self._abs_pos()
        self._add_chunk(start, start + len(data), data)

    def handle_entityref(self, name):
        start = self._abs_pos()
        end = start + len(name) + 1  # '&' + name
        if end < len(self._raw) and self._raw[end] == ";":
            end += 1
        self._add_chunk(start, end, _html.unescape(f"&{name};"))

    def handle_charref(self, name):
        start = self._abs_pos()
        end = start + len(name) + 2  # '&#' + name
        if end < len(self._raw) and self._raw[end] == ";":
            end += 1
        try:
            cp = int(name[1:], 16) if name[0] in "xX" else int(name)
            # exclude the surrogate range: chr(0xD800-0xDFFF) would
            # produce a str that crashes utf-8 encoding downstream
            # (violating extract_turn's never-raises contract)
            if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
                decoded = chr(cp)
            else:
                decoded = ""
        except ValueError:
            decoded = ""
        self._add_chunk(start, end, decoded)

    def handle_comment(self, data):  # comments are never content
        pass

    def close(self):
        super().close()
        self._flush()


def extract_html(raw: str) -> tuple[str, list[tuple[int, int]], int, int]:
    """→ (extracted_text, spans, blocks_kept, blocks_dropped).

    Kept blocks joined with '\\n' in document order; spans are sorted,
    non-overlapping raw char offsets of the kept blocks.
    """
    parser = _MainContentParser(raw)
    parser.feed(raw)
    parser.close()
    kept = [b for b in parser.blocks if b.kept]
    dropped = len(parser.blocks) - len(kept)
    text = "\n".join(b.text for b in kept)
    spans = [(b.start, b.end) for b in kept]
    return text, spans, len(kept), dropped
