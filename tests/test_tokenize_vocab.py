"""Tokenizer vocab-file seam (T1): a pre-built vocab artifact loaded in
actor __init__ must reproduce the corpus-built broadcast vocab exactly."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _rows(ds):
    return sorted(tuple(r.values()) for r in ds.take_all())


def test_vocab_file_matches_corpus_vocab(ray_session, tmp_path):
    from chug_ray.ops.tokenize import save_vocab, text_targets, tokenize_ids

    vocab_path = save_vocab(SF, str(tmp_path / "vocab.json"))

    assert _rows(tokenize_ids(SF)) == _rows(
        tokenize_ids(SF, vocab_path=vocab_path)
    )
    assert _rows(text_targets(SF)) == _rows(
        text_targets(SF, vocab_path=vocab_path)
    )


def test_vocab_file_is_plain_json(ray_session, tmp_path):
    import json

    from chug_ray.ops.tokenize import save_vocab

    p = save_vocab(SF, str(tmp_path / "v.json"))
    vocab = json.load(open(p))
    assert vocab and all(isinstance(v, int) for v in vocab.values())
    # ids are the 1-based alphabetical ranks
    toks = sorted(vocab)
    assert [vocab[t] for t in toks] == list(range(1, len(toks) + 1))


def test_vocab_file_custom_ids_are_honored(ray_session, tmp_path):
    """A pre-built vocab JSON may carry ANY id assignment (the reference
    ships real tokenizer vocabs, not alphabetical ranks); the actor must
    emit the mapping's actual ids, not recomputed ranks."""
    import json

    import pyarrow as pa

    from chug_ray.ops.tokenize import TokenizeIds

    vocab = {"alpha": 7, "beta": 100, "gamma": 3}
    p = tmp_path / "custom.json"
    p.write_text(json.dumps(vocab))

    stage = TokenizeIds(str(p), max_len=16)
    out = stage(
        pa.table({"doc_id": [1], "text": ["gamma alpha beta alpha"]})
    )
    assert out["token_id"].to_pylist() == [3, 7, 100, 7]
