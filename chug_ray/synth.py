"""Deterministic synthetic interleaved-document corpus (FIXTURES.md F1/F2).

Every document is a pure function of ``(seed, index)`` via the stable
hash in :mod:`chug_ray.util`, so generation is order-independent and can
run distributed (``ray.data.range(n) → map_batches``) or inline, and the
media table can be produced in a second independent pass.

Archetypes (doc_id prefix = archetype, for debuggability):
  txt        1–8 plain text spans
  html       1 html span (boilerplate + known main content)
  pdf        1 pdf span → SPDF payload, 1–16 pages
  pdfbig     1 pdf span, ``big_pages`` pages (skew monster, pinned cadence)
  tiff       1 image span → SIMG payload, 2–5 frames
  mixed      2–6 interleaved text/html/pdf/image spans
  emptypage  pdf payload with empty pages (valid-page wraparound scan)
  missing    empty span list / empty media_ref (filter + error paths)
  corrupt    truncated / bad-magic payload (error policy)
"""

from __future__ import annotations

import pyarrow as pa

from chug_ray.config import CorpusConfig
from chug_ray.kernels import simg, spdf
from chug_ray.schema import DOC_SCHEMA, MEDIA_SCHEMA
from chug_ray.util import rng_for

VOCAB = (
    "the a of to and in data query table row column scan join merge sort "
    "filter group window stream batch vector hash key value order part "
    "customer line item page text span document extract content main "
    "model train corpus token shard block actor task node cluster fast "
    "slow big small wide deep red blue green alpha beta gamma delta"
).split()

# (archetype, cumulative probability)
_ARCH_CDF = [
    ("txt", 0.28),
    ("html", 0.48),
    ("pdf", 0.66),
    ("tiff", 0.74),
    ("mixed", 0.84),
    ("emptypage", 0.90),
    ("missing", 0.94),
    ("corrupt", 1.0),
]


def _words(rng, n: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def _pdf_pages(rng, n_pages: int, empty_prob: float = 0.0) -> list[list[str]]:
    pages = []
    for _ in range(n_pages):
        if empty_prob and rng.random() < empty_prob:
            pages.append([])
        else:
            pages.append(
                [_words(rng, rng.randint(3, 10)) for _ in range(rng.randint(1, 6))]
            )
    return pages


def _html_source(rng) -> str:
    """Synthetic page: known main content + boilerplate the kernel strips."""
    title = _words(rng, rng.randint(2, 5))
    nav_links = "".join(
        f'<li><a href="/{w}">{w}</a></li>'
        for w in (rng.choice(VOCAB) for _ in range(rng.randint(3, 6)))
    )
    paras = "".join(
        f"<p>{_words(rng, rng.randint(8, 40))}</p>"
        for _ in range(rng.randint(3, 8))
    )
    farm = "".join(
        f'<a href="/{i}">{_words(rng, 2)}</a> ' for i in range(rng.randint(5, 12))
    )
    footer = _words(rng, rng.randint(4, 8))
    return (
        "<html><head><title>t</title>"
        "<style>body{color:red}</style>"
        "<script>var x=1;</script></head>"
        f"<body><header><div>{_words(rng, 3)}</div></header>"
        f"<nav><ul>{nav_links}</ul></nav>"
        f"<main><h1>{title}</h1>{paras}</main>"
        f'<div class="links">{farm}</div>'
        f"<aside>{_words(rng, 10)}</aside>"
        f"<footer>{footer}</footer></body></html>"
    )


# "stock" frames for planted image duplicates (CorpusConfig.dup_frame_rate):
# a tiny pool of canonical (w, h, pix_seed) bases, each with an exact
# variant (no line) and near variants (a ``wm@x,y`` watermark line that
# inverts a 4×4 pixel block — the re-encode/overlay analog, giving a
# genuinely different raster at pHash distance 2–4 from the base).
# Exact repeats exercise phash_dups' multiplicity-collapse star path;
# near variants exercise banding + strip verify with real >0 distances.
_STOCK_BASES = (
    (48, 32, 0xC0FFEE01),
    (32, 48, 0xC0FFEE02),
    (40, 40, 0xC0FFEE03),
)
_STOCK_LINES = ("", "wm@4,4", "wm@12,8")


def _stock_frame(stock_rng) -> simg.Frame:
    w, h, seed = _STOCK_BASES[stock_rng.randrange(len(_STOCK_BASES))]
    # half exact repeats (hot identical-hash case), half near variants
    v = 0 if stock_rng.random() < 0.5 else stock_rng.randrange(1, 3)
    lines = () if v == 0 else (_STOCK_LINES[v],)
    return simg.Frame(width=w, height=h, pix_seed=seed, lines=lines)


def _simg_frames(
    rng, n_frames: int, stock_rng=None, stock_rate: float = 0.0
) -> list[simg.Frame]:
    frames = [
        simg.Frame(
            width=rng.randint(16, 64),
            height=rng.randint(16, 64),
            pix_seed=rng.getrandbits(32),
            lines=tuple(
                _words(rng, rng.randint(2, 6)) for _ in range(rng.randint(0, 3))
            ),
        )
        for _ in range(n_frames)
    ]
    # replacement AFTER the full draw, from the separate stock rng: the
    # main rng stream is consumed identically whether or not planting is
    # on, so rate=0.0 corpora are bit-identical to the pre-knob fixtures
    if stock_rng is not None and stock_rate > 0.0:
        for i in range(n_frames):
            if stock_rng.random() < stock_rate:
                frames[i] = _stock_frame(stock_rng)
    return frames


def archetype_for(cfg: CorpusConfig, index: int) -> str:
    if index % cfg.big_every == cfg.big_every - 1:
        return "pdfbig"
    r = rng_for(cfg.seed, "arch", index).random()
    for name, cum in _ARCH_CDF:
        if r < cum:
            return name
    return "txt"


def doc_id_for(cfg: CorpusConfig, index: int) -> str:
    return f"{archetype_for(cfg, index)}-{index:08d}"


def _corrupt(rng, data: bytes) -> bytes:
    mode = rng.randint(0, 2)
    if mode == 0:
        return data[: max(4, len(data) // 2)]  # truncated
    if mode == 1:
        return b"XPDF" + data[4:]  # bad magic
    return bytes(rng.getrandbits(8) for _ in range(32))  # garbage


def make_doc(cfg: CorpusConfig, index: int):
    """Build one document → (doc_row: dict, media_rows: list[dict])."""
    arch = archetype_for(cfg, index)
    doc_id = doc_id_for(cfg, index)  # ONE id format definition
    rng = rng_for(cfg.seed, doc_id)
    # planted-duplicate frames draw from their own keyed stream so the
    # main stream (and every rate=0.0 corpus) is unchanged
    stock_rng = (
        rng_for(cfg.seed, "stock", doc_id) if cfg.dup_frame_rate > 0 else None
    )
    spans: list[dict] = []
    span_pages: list[int] = []
    media: list[dict] = []
    offset = 0

    def add(
        kind: str, text: str = "", media_ref: str = "", n_pages: int = 1
    ) -> None:
        nonlocal offset
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}
        )
        span_pages.append(n_pages)
        offset += rng.randint(1, 4)  # strictly increasing, gappy

    def add_media(kind: str, payload: bytes, n_pages: int) -> str:
        ref = f"{doc_id}/m{len(media)}"
        media.append(
            {"media_ref": ref, "payload": payload, "kind": kind, "n_pages": n_pages}
        )
        return ref

    if arch == "txt":
        for _ in range(rng.randint(1, 8) * cfg.span_scale):
            add("text", _words(rng, rng.randint(4, 30)))
    elif arch == "html":
        for _ in range(cfg.span_scale):
            add("html", _html_source(rng))
    elif arch in ("pdf", "pdfbig", "emptypage"):
        if arch == "pdfbig":
            pages = _pdf_pages(rng, cfg.big_pages)
        elif arch == "emptypage":
            pages = _pdf_pages(rng, rng.randint(2, 20), empty_prob=0.45)
        else:
            pages = _pdf_pages(rng, rng.randint(1, 16))
        ref = add_media("pdf", spdf.encode(pages), len(pages))
        add("pdf", "", ref, n_pages=len(pages))
    elif arch == "tiff":
        frames = _simg_frames(
            rng, rng.randint(2, 5), stock_rng, cfg.dup_frame_rate
        )
        ref = add_media("image", simg.encode(frames), len(frames))
        add("image", "", ref, n_pages=len(frames))
    elif arch == "mixed":
        for _ in range(rng.randint(2, 6) * cfg.span_scale):
            k = rng.choice(("text", "text", "html", "pdf", "image"))
            if k == "text":
                add("text", _words(rng, rng.randint(4, 20)))
            elif k == "html":
                add("html", _html_source(rng))
            elif k == "pdf":
                pages = _pdf_pages(rng, rng.randint(1, 4))
                add("pdf", "",
                    add_media("pdf", spdf.encode(pages), len(pages)),
                    n_pages=len(pages))
            else:
                frames = _simg_frames(
                    rng, rng.randint(1, 3), stock_rng, cfg.dup_frame_rate
                )
                add("image", "",
                    add_media("image", simg.encode(frames), len(frames)),
                    n_pages=len(frames))
    elif arch == "missing":
        variant = rng.randint(0, 2)
        if variant == 0:
            pass  # empty span list
        elif variant == 1:
            add("pdf", "", "")  # media span with no media_ref
        else:
            add("", "")  # unknown-kind span
    elif arch == "corrupt":
        pages = _pdf_pages(rng, rng.randint(1, 8))
        payload = _corrupt(rng, spdf.encode(pages))
        # the media table records the intended page count even for the
        # corrupt payload; span_pages matches it so the classifier split
        # is identical to the legacy broadcast path
        add("pdf", "", add_media("pdf", payload, len(pages)),
            n_pages=len(pages))
    else:  # pragma: no cover
        raise AssertionError(arch)

    return {"doc_id": doc_id, "spans": spans, "span_pages": span_pages}, media


def docs_table(cfg: CorpusConfig, indices) -> pa.Table:
    rows = [make_doc(cfg, i)[0] for i in indices]
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


def media_table(cfg: CorpusConfig, indices) -> pa.Table:
    rows: list[dict] = []
    for i in indices:
        rows.extend(make_doc(cfg, i)[1])
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def generate_corpus(cfg: CorpusConfig) -> tuple[pa.Table, pa.Table]:
    doc_rows, media_rows = [], []
    for i in range(cfg.n_docs):
        d, m = make_doc(cfg, i)
        doc_rows.append(d)
        media_rows.extend(m)
    return (
        pa.Table.from_pylist(doc_rows, schema=DOC_SCHEMA),
        pa.Table.from_pylist(media_rows, schema=MEDIA_SCHEMA),
    )


def write_corpus_inline(cfg: CorpusConfig, out_dir: str) -> tuple[str, str]:
    """Driver-side corpus write for test scales (≤ ~10k docs)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    docs_path = os.path.join(out_dir, "documents.parquet")
    media_path = os.path.join(out_dir, "media.parquet")
    docs, media = generate_corpus(cfg)
    pq.write_table(docs, docs_path)
    pq.write_table(media, media_path)
    return docs_path, media_path


def corpus_for_sf_dir(sf_dir: str, cache_root: str = "/tmp/chug_ray_corpus"):
    """Deterministic synthetic corpus sized by the testdata scale factor.

    The interleaved-document table (BASELINE.json input_hint shape) does
    not exist under /root/testdata; extraction queries synthesize it as a
    pure function of the sf tag, cached under /tmp.
    Returns (docs_path, media_path, CorpusConfig).
    """
    import os

    tag = os.path.basename(os.path.normpath(sf_dir))  # e.g. "sf0.01"
    # "scaling" is the two-parallelism-probe corpus: large enough that
    # per-run fixed costs (executor + actor-pool spin-up) are noise
    # against compute, which is what the N-vs-4N criterion measures.
    n_docs = {
        "sf0.001": 200, "sf0.01": 2000, "sf0.1": 20000, "scaling": 250_000
    }.get(tag, 500)
    skew = "bench" if tag in ("sf0.1", "scaling") else "test"
    # the scaling corpus uses a heavy-document profile (~ms-scale per-doc
    # extraction, like real 150-DPI page parses) so the two-parallelism
    # probe measures compute scaling rather than per-row overhead
    span_scale = 16 if tag == "scaling" else 1
    # planted duplicate/near-duplicate image frames (real web corpora
    # repeat logos/banners constantly) so phash near-dup queries have
    # deterministic signal at every sf
    cfg = CorpusConfig(
        seed=42, n_docs=n_docs, skew=skew, span_scale=span_scale,
        dup_frame_rate=0.25,
    )
    scale_sfx = f"_x{cfg.span_scale}" if cfg.span_scale != 1 else ""
    if cfg.dup_frame_rate > 0:
        # "w" = watermarked near variants (stock-pool generation v2);
        # distinct cache dir so pre-watermark corpora never get reused
        scale_sfx += f"_d{int(cfg.dup_frame_rate * 100)}w"
    out_dir = os.path.join(cache_root, f"{tag}_s{cfg.seed}_n{n_docs}_{skew}{scale_sfx}")
    marker = os.path.join(out_dir, "_complete")
    # big corpora generate distributed (generation is a pure function of
    # (seed, index)); small ones inline. Both land in the same cache.
    use_ray = n_docs >= 50_000
    if use_ray:
        docs_path = os.path.join(out_dir, "documents")
        media_path = os.path.join(out_dir, "media")
    else:
        docs_path = os.path.join(out_dir, "documents.parquet")
        media_path = os.path.join(out_dir, "media.parquet")
    if not os.path.exists(marker):
        if os.path.isdir(out_dir):
            # no _complete marker but files exist: a crashed prior
            # generation. The distributed writer appends uniquely-named
            # parquet files, so regenerating over the residue would mix
            # two runs' files into one oversized corpus — clean first.
            import shutil

            shutil.rmtree(out_dir)
        if use_ray:
            import ray

            if not ray.is_initialized():  # standalone builds own the session
                ray.init(address="local", include_dashboard=False)
            write_corpus_ray(cfg, out_dir)
        else:
            write_corpus_inline(cfg, out_dir)
        with open(marker, "w") as f:
            f.write("ok")
    return docs_path, media_path, cfg


def write_corpus_ray(cfg: CorpusConfig, out_dir: str) -> tuple[str, str]:
    """Distributed corpus write (two deterministic passes: docs, media).

    Generation is a pure function of (seed, index) so the passes agree.
    """
    import os

    import ray.data

    docs_dir = os.path.join(out_dir, "documents")
    media_dir = os.path.join(out_dir, "media")

    def gen_docs(batch: pa.Table) -> pa.Table:
        return docs_table(cfg, batch["id"].to_pylist())

    def gen_media(batch: pa.Table) -> pa.Table:
        return media_table(cfg, batch["id"].to_pylist())

    base = ray.data.range(cfg.n_docs)
    base.map_batches(gen_docs, batch_format="pyarrow", batch_size=2000).write_parquet(
        docs_dir
    )
    base.map_batches(gen_media, batch_format="pyarrow", batch_size=2000).write_parquet(
        media_dir
    )
    return docs_dir, media_dir
