"""HTML main-content extractor (north_star: boilerplate strip).

From-scratch block-level boilerplate classifier in the spirit of
Readability / trafilatura / jusText, built on text-density and
link-density heuristics (no external HTML parser — deterministic
regex tokenization). This generalizes the reference's repeated-line
boilerplate removal (SURVEY.md §2.3 T4) to markup payloads.

Algorithm:
  1. Drop comments and <script>/<style>/<noscript>/<svg> subtrees.
  2. Segment the document into blocks at block-level tag boundaries,
     tracking for each block: visible text, link-text length, tag count
     and class/id boilerplate hints from the nearest opening container.
  3. Score each block: link density (link_chars/chars), text density
     (chars per markup tag), stopword ratio, length; class/id hints
     (nav/footer/sidebar/comment/menu vs article/content/main/post)
     shift the decision.
  4. Neighborhood smoothing (jusText-style): short undecided blocks
     adjacent to good blocks are kept; isolated ones dropped.
Output is the kept blocks joined with blank lines.
"""

from __future__ import annotations

import re

_DROP_SUBTREES = re.compile(
    r"<(script|style|noscript|svg|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENTS = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_SPLIT = re.compile(
    r"<(?:/?)(?:div|p|h[1-6]|li|ul|ol|table|tr|td|th|section|article|aside|"
    r"header|footer|nav|main|blockquote|pre|figure|figcaption|form|fieldset|"
    r"br|hr)\b[^>]*/?>",
    re.IGNORECASE,
)
_ANCHOR_TEXT = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_ANY_TAG = re.compile(r"<[^>]+>")
# A '<' never followed by '>' (truncated payload / tag cut mid-attribute):
# routine in crawl corpora where responses are length-capped mid-byte.
_UNTERMINATED_TAIL = re.compile(
    r"<(?P<name>/|!|\?|[A-Za-z][A-Za-z0-9-]*)(?P<rest>[^>]*)$"
)
# tag-shaped only: '<' must open an element (letter), closer (/),
# comment/doctype (!) or PI (?) to count as a truncated tag — a bare
# comparison like 'for x < 5, the bound holds' is PROSE and must
# survive (round-4 review: the unanchored <[^>]*$ deleted everything
# after a literal '<' in tail position). A MATCH is then judged by
# _tail_is_truncated_tag: '</' '<!' '<?' always strip, a known HTML
# element name strips ('hello <span', 'text<br'), an attribute
# assignment anywhere in the rest strips ('<x-widget data-id="3'),
# but an UNKNOWN word reading as prose survives ('if a<threshold then
# the bound holds' — the r4 ADVICE case: the letter-lookahead alone
# deleted everything after a tight comparison). Accepted loss, pinned
# in tests: 'a<b then ...' still strips — 'b' IS the bold element and
# a crawl cut at '<b' is indistinguishable from that prose.
_KNOWN_TAGS = frozenset(
    "a abbr address area article aside audio b base bdi bdo blockquote "
    "body br button canvas caption cite code col colgroup data datalist "
    "dd del details dfn dialog div dl dt em embed fieldset figcaption "
    "figure footer form h1 h2 h3 h4 h5 h6 head header hr html i iframe "
    "img input ins kbd label legend li link main map mark meta meter nav "
    "noscript object ol optgroup option output p param picture pre "
    "progress q rp rt ruby s samp script section select slot small "
    "source span strong style sub summary sup table tbody td template "
    "textarea tfoot th thead time title tr track u ul var video "
    "wbr".split()
)


def _tail_is_truncated_tag(m: "re.Match[str]") -> bool:
    name = m.group("name")
    rest = m.group("rest")
    if name in ("/", "!", "?"):
        return True
    # a known element name counts only when the name actually ENDS
    # there (end-of-tail, whitespace, or '/') — 'a<a_threshold' parses
    # name='a' but the '_' continuation proves it's an identifier, not
    # the <a> element (round-5 review finding)
    if name.lower() in _KNOWN_TAGS and (
        rest == "" or rest[0] in " \t\n\r/"
    ):
        return True
    return "=" in rest
_CLASS_ID = re.compile(r"(?:class|id)\s*=\s*[\"']([^\"']*)[\"']", re.IGNORECASE)

_BAD_HINTS = ("nav", "footer", "sidebar", "comment", "menu", "banner",
              "advert", "promo", "share", "social", "related", "cookie",
              "breadcrumb", "pagination", "widget")
_GOOD_HINTS = ("article", "content", "main", "post", "body", "entry", "text",
               "story")

_STOPWORDS = frozenset(
    "the a an and or but of to in on for with at by from as is are was were "
    "be been it this that these those i you he she we they not no yes have "
    "has had do does did will would can could should about into over under "
    "your our their his her its if then than so because while during after "
    "before between out up down off all any both each few more most other "
    "some such only own same very just also there here when where why how".split()
)

_ENTITIES = (
    ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&mdash;", "-"),
    ("&ndash;", "-"), ("&hellip;", "..."), ("&rsquo;", "'"), ("&lsquo;", "'"),
    ("&ldquo;", '"'), ("&rdquo;", '"'),
)


def _decode_entities(text: str) -> str:
    if "&" not in text:  # no entity can exist — skip the 14 scans
        return text
    for ent, ch in _ENTITIES:
        if ent in text:
            text = text.replace(ent, ch)
    return text


def _strip_tags(fragment: str) -> tuple[str, int]:
    """(tagless text, tag count). Complete tags first (subn counts them
    in the same pass), then any tag-shaped unterminated trailing
    fragment — otherwise markup truncated mid-tag survives into
    "cleaned" text; the stripped tail counts as markup too."""
    stripped, n_tags = _ANY_TAG.subn(" ", fragment)
    # walk every unterminated '<' candidate in the tail: a prose-judged
    # '<' must not shadow a LATER genuine truncated tag ('cost<price
    # wins <br' keeps the comparison but still strips '<br' —
    # round-5 review finding)
    pos = 0
    while True:
        m = _UNTERMINATED_TAIL.search(stripped, pos)
        if m is None:
            break
        if _tail_is_truncated_tag(m):
            stripped = stripped[: m.start()] + " "
            n_tags += 1
            break
        pos = m.start() + 1
    return stripped, n_tags


def _visible_text(fragment: str) -> str:
    return _decode_entities(_strip_tags(fragment)[0])


def _stopword_ratio(text: str) -> float:
    words = text.lower().split()
    if not words:
        return 0.0
    return sum(1 for w in words if w in _STOPWORDS) / len(words)


class _Block:
    __slots__ = ("text", "link_chars", "tag_count", "hint")

    def __init__(self, text: str, link_chars: int, tag_count: int, hint: int):
        self.text = text
        self.link_chars = link_chars
        self.tag_count = tag_count
        self.hint = hint  # -1 bad container, +1 good container, 0 neutral


def _segment(html: str) -> list[_Block]:
    html = _COMMENTS.sub(" ", html)
    html = _DROP_SUBTREES.sub(" ", html)

    blocks: list[_Block] = []
    hint_state = 0
    pos = 0
    pieces: list[tuple[str, str]] = []  # (boundary_tag, following_fragment)
    last_tag = ""
    for m in _BLOCK_SPLIT.finditer(html):
        pieces.append((last_tag, html[pos : m.start()]))
        last_tag = m.group(0)
        pos = m.end()
    pieces.append((last_tag, html[pos:]))

    for boundary, fragment in pieces:
        lb = boundary.lower()
        if lb.startswith(("</", "<br", "<hr")):
            hint = hint_state  # closers/void tags inherit container hint
        else:
            # hint scan only for openers (closers discard it anyway)
            hint = 0
            cm = _CLASS_ID.search(boundary)
            token = (cm.group(1).lower() if cm else "") + " " + lb
            if any(b in token for b in _BAD_HINTS):
                hint = -1
            elif any(g in token for g in _GOOD_HINTS):
                hint = 1
            hint_state = hint

        # empty / whitespace-only inter-tag gaps (common between
        # adjacent block tags) yield no block; skip their regex work
        if not fragment or fragment.isspace():
            continue
        stripped, tag_count = _strip_tags(fragment)
        text = " ".join(_decode_entities(stripped).split())
        if text:
            if "<a" in fragment or "<A" in fragment:  # anchors need '<a'
                link_chars = sum(
                    len(_visible_text(a).strip())
                    for a in _ANCHOR_TEXT.findall(fragment)
                )
            else:
                link_chars = 0
            blocks.append(_Block(text, link_chars, tag_count, hint))
    return blocks


def _classify(b: _Block) -> int:
    """1 keep, 0 undecided, -1 drop."""
    n = len(b.text)
    link_density = b.link_chars / max(n, 1)
    text_density = n / (1 + b.tag_count)
    sw = _stopword_ratio(b.text)

    if b.hint < 0 and link_density > 0.2:
        return -1
    if link_density > 0.66:
        return -1
    if n >= 80 and link_density < 0.33 and (sw >= 0.15 or text_density >= 40):
        return 1
    if b.hint > 0 and n >= 25 and link_density < 0.33:
        return 1
    if n < 10:
        return -1
    return 0


def extract_main_text(html: str) -> str:
    """Strip boilerplate from an HTML payload; return main content text."""
    if "<" not in html:
        return html
    blocks = _segment(html)
    if not blocks:
        return ""
    labels = [_classify(b) for b in blocks]

    # jusText-style smoothing: undecided blocks adopt a keep label when a
    # neighbor within distance 1 is kept and they are not link-heavy.
    final: list[int] = list(labels)
    for i, lab in enumerate(labels):
        if lab != 0:
            continue
        prev_keep = any(labels[j] == 1 for j in range(max(0, i - 1), i))
        next_keep = any(
            labels[j] == 1 for j in range(i + 1, min(len(labels), i + 2))
        )
        b = blocks[i]
        if (prev_keep or next_keep) and b.link_chars / max(len(b.text), 1) < 0.5:
            final[i] = 1
        else:
            final[i] = -1

    kept = [b.text for b, lab in zip(blocks, final) if lab == 1]
    if not kept:
        # fall back to the longest low-link block so short docs survive
        best = max(
            blocks,
            key=lambda b: len(b.text) * (1 - min(b.link_chars / max(len(b.text), 1), 1.0)),
        )
        kept = [best.text]
    return "\n\n".join(kept)
