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

from chug_ray.config import ExtractConfig
from chug_ray.schema import DOC_SCHEMA, MEDIA_SCHEMA, OUT_SCHEMA

__version__ = "0.1.0"

__all__ = [
    "ExtractConfig",
    "DOC_SCHEMA",
    "MEDIA_SCHEMA",
    "OUT_SCHEMA",
    "__version__",
]
