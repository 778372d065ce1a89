"""From-scratch HTML boilerplate strip + main-content extraction.

The reference has no HTML path; the north rule mandates one ("HTML
boilerplate strip ... DOM heuristics", BASELINE.json). Semantics are
therefore *defined here* (SURVEY.md §2.3 D9), deterministic, and pinned
by golden fixtures:

1. Parse with a tolerant DOM builder over stdlib ``html.parser``
   (entities resolved, unclosed tags recovered, void elements handled).
2. Drop entire subtrees of structural boilerplate tags:
   ``script style noscript template nav header footer aside form iframe
   svg button select option``.
3. Candidate text blocks, in document order:
   * paragraph-ish leaves: ``p h1-h6 li pre blockquote td th caption
     figcaption summary dt dd``
   * container elements (``div section article main body``) contribute
     only text *directly* under them that is not inside any block child
     ("leaf text runs"), so a link-farm ``div`` full of anchors is a
     single scoreable block.
   Inline elements (``a b i em strong span code small sub sup u mark
   abbr time``) merge into the enclosing block's text.
4. Score each block: ``text`` (whitespace-normalized), ``n_words``,
   ``link_density`` = chars of text under ``<a>`` / total chars.
5. Keep a block iff text is non-empty, ``link_density < 0.33``, and
   ``n_words >= 3`` (headings ``h1-h6``: ``n_words >= 1``).
6. Emit kept blocks as ordered text spans.

These thresholds are the engine's published contract — the synthetic
corpus and the oracle both target them, and tests golden-pin the output.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

from chug_ray.kernels.text import normalize_ws

DROP_TAGS = frozenset(
    "script style noscript template nav header footer aside form iframe "
    "svg button select option".split()
)
BLOCK_LEAF_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li pre blockquote td th caption figcaption "
    "summary dt dd".split()
)
HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())
CONTAINER_TAGS = frozenset(
    "div section article main body html table ul ol dl tr thead tbody "
    "figure details".split()
)
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track "
    "wbr".split()
)
# tags that implicitly close an open element of the same tag (HTML5
# optional end tags: <p>text<p>more ⇒ two sibling paragraphs)
AUTOCLOSE_TAGS = frozenset("p li dt dd tr td th option".split())

LINK_DENSITY_MAX = 0.33
MIN_WORDS = 3
MIN_WORDS_HEADING = 1


@dataclass
class _Node:
    tag: str  # "" for text nodes
    text: str = ""
    children: list = field(default_factory=list)


class _DomBuilder(HTMLParser):
    """Tolerant DOM builder: recovers from unclosed/mismatched tags."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        if tag in AUTOCLOSE_TAGS and self.stack[-1].tag == tag:
            self.stack.pop()
        node = _Node(tag)
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag))

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(_Node("", text=data))


def parse_dom(html_source: str) -> _Node:
    builder = _DomBuilder()
    builder.feed(html_source)
    builder.close()
    return builder.root


@dataclass
class Block:
    tag: str
    text: str  # whitespace-normalized
    n_words: int
    link_density: float

    @property
    def keep(self) -> bool:
        if not self.text:
            return False
        if self.link_density >= LINK_DENSITY_MAX:
            return False
        min_words = MIN_WORDS_HEADING if self.tag in HEADING_TAGS else MIN_WORDS
        return self.n_words >= min_words


def _gather_text(node: _Node, in_link: bool, acc: list, link_acc: list) -> None:
    """Accumulate text of a subtree, tracking chars under <a>."""
    if node.tag == "":
        acc.append(node.text)
        if in_link:
            link_acc.append(node.text)
        return
    if node.tag in DROP_TAGS:
        return
    child_link = in_link or node.tag == "a"
    for child in node.children:
        _gather_text(child, child_link, acc, link_acc)


def _make_block(tag: str, nodes: list[_Node]) -> Block | None:
    acc: list[str] = []
    link_acc: list[str] = []
    for n in nodes:
        _gather_text(n, False, acc, link_acc)
    text = normalize_ws("".join(acc))
    if not text:
        return None
    link_len = len(normalize_ws("".join(link_acc)))
    return Block(
        tag=tag,
        text=text,
        n_words=len(text.split()),
        link_density=link_len / len(text),
    )


def _walk(node: _Node, blocks: list[Block]) -> None:
    if node.tag in DROP_TAGS:
        return
    if node.tag in BLOCK_LEAF_TAGS:
        block = _make_block(node.tag, node.children)
        if block is not None:
            blocks.append(block)
        return
    # container (or unknown tag): group runs of inline/text children into
    # anonymous blocks; recurse into block-level children in order.
    run: list[_Node] = []

    def flush():
        if run:
            block = _make_block(node.tag, run)
            if block is not None:
                blocks.append(block)
            run.clear()

    for child in node.children:
        is_blockish = child.tag in (
            BLOCK_LEAF_TAGS | CONTAINER_TAGS | DROP_TAGS
        )
        if is_blockish:
            flush()
            _walk(child, blocks)
        else:
            run.append(child)
    flush()


def extract_blocks(html_source: str) -> list[Block]:
    """All candidate blocks (kept or not) in document order."""
    blocks: list[Block] = []
    _walk(parse_dom(html_source), blocks)
    return blocks


def extract_main_text(html_source: str) -> list[str]:
    """Main-content text blocks in document order (the kernel's output)."""
    return [b.text for b in extract_blocks(html_source) if b.keep]
