"""chug_ray — a Ray-Data-native interleaved-document extraction engine.

Brand-new implementation of the capabilities of huggingface/chug
(reference at /root/reference, studied for semantics only — see SURVEY.md),
re-expressed Ray-Data-first: ``ray.data.Dataset`` pipelines, zero-copy
Arrow batches via ``map_batches(batch_format="pyarrow")``, actor pools for
stateful parser stages, explicit skew handling (explode heavy docs →
``groupby(doc_id)`` reassembly), per-partition lineage manifests and
checkpoint resume.

Input data model (authoritative, from BASELINE.json input_hint):

    doc_id: string
    spans:  list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>
"""

from chug_ray.config import CorpusConfig, ExtractConfig
from chug_ray.schema import DOC_SCHEMA, MEDIA_SCHEMA, OUT_SCHEMA

__version__ = "0.1.0"


def build_extract_pipeline(docs, cfg, media_meta_ref=None):
    """Lazy import of the pipeline builder (keeps package import light)."""
    from chug_ray.pipeline import build_extract_pipeline as _build

    return _build(docs, cfg, media_meta_ref=media_meta_ref)


def run_job(docs_path, out_root, cfg, num_partitions=None, resume=True):
    """Lazy import of the partitioned resumable job driver."""
    from chug_ray.run import run_job as _run

    return _run(docs_path, out_root, cfg, num_partitions=num_partitions, resume=resume)


def ingest_ocr_dataset(ds, line_break="\n"):
    """Lazy import of the OCR-annotation ingest adapter."""
    from chug_ray.ingest import ingest_ocr_dataset as _ing

    return _ing(ds, line_break=line_break)


def iter_training_batches(ds, batch_size, *, drop_last=False):
    """Lazy import of the training-batch consumer adapter (the
    reference-collate-semantics seam for torch-side consumers)."""
    from chug_ray.collate import iter_training_batches as _itb

    return _itb(ds, batch_size, drop_last=drop_last)


__all__ = [
    "CorpusConfig",
    "ExtractConfig",
    "DOC_SCHEMA",
    "MEDIA_SCHEMA",
    "OUT_SCHEMA",
    "build_extract_pipeline",
    "run_job",
    "ingest_ocr_dataset",
    "iter_training_batches",
    "__version__",
]
