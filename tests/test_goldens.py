"""Pinned-golden regression tests (FIXTURES.md F3).

The goldens in tests/goldens/*.json were produced by the sequential
oracle and checked in; if a refactor of the shared kernels shifts
semantics, the comparison against the *pinned* files catches it even
though pipeline-vs-oracle comparisons would still agree.
"""

import os

import pytest

from chug_ray.config import CorpusConfig, ExtractConfig
from chug_ray.oracle import canonical, diff, golden_load, oracle_extract_corpus

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
CORPUS = CorpusConfig(seed=42, n_docs=60, skew="test")


@pytest.mark.parametrize("policy", ["all_valid", "first", "random"])
def test_oracle_matches_pinned_golden(policy):
    pinned = golden_load(os.path.join(GOLDEN_DIR, f"t1_{policy}.json"))
    rows = oracle_extract_corpus(CORPUS, ExtractConfig(page_sampling=policy, seed=0))
    problems = diff(canonical(pinned), canonical(rows))
    assert not problems, "\n".join(problems)


def test_golden_has_all_archetypes():
    pinned = golden_load(os.path.join(GOLDEN_DIR, "t1_all_valid.json"))
    prefixes = {r["doc_id"].split("-")[0] for r in pinned}
    assert {"txt", "html", "pdf", "mixed"} <= prefixes
