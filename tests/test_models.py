"""Unit tests for the NER/relation model cores (no Spark)."""

import numpy as np

from mitie_spark.models.ner_model import (
    B, I, L, O, U,
    NerModel,
    chunks_to_labels,
    labels_to_chunks,
    viterbi,
)


def test_viterbi_respects_bilou_constraints():
    # emissions that would prefer an illegal path (I without B)
    em = np.array([[0.0, 0.0, 10.0, 0.0, 0.0]] * 3)
    path = viterbi(em, np.zeros((5, 5)))
    # never starts with I; every I is preceded by B or I
    assert path[0] in (O, B, U)
    for t in range(1, len(path)):
        if path[t] == I:
            assert path[t - 1] in (B, I)
    # must end in O, L, or U
    assert path[-1] in (O, L, U)


def test_chunk_label_roundtrip():
    chunks = [(0, 2), (3, 4), (5, 8)]
    labels = chunks_to_labels(9, chunks)
    assert labels_to_chunks(labels) == chunks
    assert list(labels) == [B, L, O, U, O, B, I, L, O]


def test_model_save_load_roundtrip(tmp_path):
    m = NerModel()
    m.W_seg[:] = np.arange(m.W_seg.size).reshape(m.W_seg.shape)
    p = str(tmp_path / "m.npz")
    m.save(p)
    m2 = NerModel.load(p)
    assert np.array_equal(m.W_seg, m2.W_seg)
    assert m2.tags == m.tags


def test_trained_models_meet_parity_target():
    """Holdout P/R ≥ 0.95 — the BASELINE.json triple-parity criterion,
    evaluated against planted truth (reference models are not vendored)."""
    import os

    from mitie_spark.models.ner_model import NerModel
    from mitie_spark.models.relation_model import RelationModel
    from mitie_spark.models.train import ARTIFACT_DIR, evaluate

    ner = NerModel.load(os.path.join(ARTIFACT_DIR, "ner_model.npz"))
    rel = RelationModel.load(os.path.join(ARTIFACT_DIR, "relation_model.npz"))
    m = evaluate(ner, rel, n_docs=120, seed=31337)
    assert m["mention_precision"] >= 0.95, m
    assert m["mention_recall"] >= 0.95, m
    assert m["triple_precision"] >= 0.95, m
    assert m["triple_recall"] >= 0.95, m


def test_batched_segmentation_matches_per_doc():
    """segment_batch / extract_documents_batch must be value-identical to
    the per-doc path on real corpus docs (incl. empty and 1-token texts)."""
    import os

    import pyarrow.parquet as pq

    from mitie_spark.models.train import ARTIFACT_DIR
    from mitie_spark.operators.extraction import (
        _load_models,
        extract_document,
        extract_documents_batch,
    )

    t = pq.read_table(
        "data/kg_sf0.01/pages.parquet", columns=["text", "lang"]
    ).to_pandas()
    texts = list(t[t.lang == "en"]["text"].head(200)) + ["", "Boston", "a b"]
    ner, rel = _load_models(
        os.path.join(ARTIFACT_DIR, "ner_model.npz"),
        os.path.join(ARTIFACT_DIR, "relation_model.npz"),
    )
    batched = extract_documents_batch(texts, ner, rel)
    for text, got in zip(texts, batched):
        assert got == extract_document(text, ner, rel)


def test_viterbi_batch_matches_per_doc_on_random_emissions():
    """Property check: batch and per-doc decode agree on random emission
    matrices of random lengths (including ties, length 1, and the longest
    doc defining the padded horizon)."""
    import numpy as np

    from mitie_spark.models.ner_model import N_STATES, viterbi, viterbi_batch

    rng = np.random.default_rng(123)
    trans = rng.normal(size=(N_STATES, N_STATES))
    lens = [1, 2, 3, 7, 40, 40, 13, 1, 5]
    ems = [rng.normal(size=(n, N_STATES)) for n in lens]
    # inject exact ties to exercise argmax tie-breaking
    ems.append(np.zeros((6, N_STATES)))
    batched = viterbi_batch(ems, trans)
    for e, got in zip(ems, batched):
        np.testing.assert_array_equal(got, viterbi(e, trans))


def test_segment_batch_padding_cap_preserves_output():
    """The padded-cells cap groups docs by length; a tiny cap (every doc in
    its own group) must produce identical chunks to one big group."""
    import os

    import pyarrow.parquet as pq


    from mitie_spark.models.train import ARTIFACT_DIR
    from mitie_spark.operators.extraction import _load_models

    t = pq.read_table(
        "data/kg_sf0.01/pages.parquet", columns=["text", "lang"]
    ).to_pandas()
    texts = list(t[t.lang == "en"]["text"].head(60)) + ["", "Boston"]
    ner, _ = _load_models(
        os.path.join(ARTIFACT_DIR, "ner_model.npz"),
        os.path.join(ARTIFACT_DIR, "relation_model.npz"),
    )
    from mitie_spark.functions.tokenizer import tokenize

    Xs = [ner.X(tokenize(x)) for x in texts]
    assert ner.segment_batch(Xs, max_padded_cells=1) == ner.segment_batch(Xs)


def test_chunk_classification_memo_is_pure():
    """The chunk-classification memo key must capture every input: the same
    (chunk, context) window in different docs/positions classifies
    identically, and boundary chunks (missing context) don't collide with
    mid-sentence ones."""
    import os

    from mitie_spark.functions.tokenizer import tokenize
    from mitie_spark.models.ner_model import NerModel
    from mitie_spark.models.train import ARTIFACT_DIR

    ner = NerModel.load(os.path.join(ARTIFACT_DIR, "ner_model.npz"))
    fresh = NerModel.load(os.path.join(ARTIFACT_DIR, "ner_model.npz"))

    docs = [
        "Davis Wilson was born in Boston .",
        "the visit of Davis Wilson was born in Boston today",
        "Davis Wilson",  # chunk at both doc edges: no context tokens
        "in Boston",
    ]
    for text in docs:
        toks = tokenize(text)
        X = ner.X(toks)
        chunks, _ = ner.segment(toks)
        cached = ner.classify_chunks(toks, X, chunks)
        direct = [
            (s, e, fresh.tags[k], m)
            for s, e in chunks
            for k, m in [fresh.classify_chunk(toks, X, s, e)]
            if k < len(fresh.tags)
        ]
        assert cached == direct
    # run everything twice so the second pass is all cache hits
    for text in docs:
        toks = tokenize(text)
        X = ner.X(toks)
        chunks, _ = ner.segment(toks)
        assert ner.classify_chunks(toks, X, chunks) == [
            (s, e, fresh.tags[k], m)
            for s, e in chunks
            for k, m in [fresh.classify_chunk(toks, X, s, e)]
            if k < len(fresh.tags)
        ]


def test_chunk_features_reference_golden():
    """Regression vectors for the reference-exact chunk feature extractor
    (ner_feature_extraction.cpp:167-388 port): pinned (count, first/last
    index, value sum, crc) per chunk over a sentence exercising every
    role (start-of-sentence chunk, end-of-sentence chunk, hyphens,
    all-caps sizes, internal dots). Any change to seeds, hashing, merge
    order, or the context-bag width shows up here."""
    import zlib

    import numpy as np

    from mitie_spark.models.ner_model import chunk_features, sentence_matrix

    toks = "On Tuesday John-Paul DEL Smith of U.S. STEEL Corp visited Xy .".split()
    X = sentence_matrix(toks)
    expected = {
        (2, 5): (65, 8704, 489896, 0.0, 4164058613),
        (0, 1): (41, 8651, 493766, 16.5, 320453484),
        (8, 10): (56, 4605, 488079, 7.5, 3116295870),
        (11, 12): (32, 125, 482540, 15.0, 975670638),
    }
    for (s, e), (n, i0, i1, vsum, crc) in expected.items():
        idx, val, dense = chunk_features(toks, X, s, e)
        assert len(idx) == n
        assert (np.diff(idx) > 0).all()  # sorted unique (merged duplicates)
        assert int(idx[0]) == i0 and int(idx[-1]) == i1
        assert abs(float(val.sum()) - vsum) < 1e-9
        assert (zlib.crc32(idx.tobytes()) ^ zlib.crc32(val.tobytes())) == crc
        # every merged value is a multiple of the reference's 1.5 weight
        assert np.allclose(np.abs(val) % 1.5, 0.0)
        assert dense.shape == (5 * X.shape[1],)


def test_prefix_suffix_sign_extension():
    """C++ char is signed: UTF-8 bytes >= 0x80 sign-extend into the uint32
    lanes of the prefix/suffix murmur variant (ner_feature_extraction.cpp:
    27-61). Pinned against hand-evaluated sign-extended lane values."""
    from mitie_spark.functions.hashing import (
        murmur_hash3_128_u32x4,
        prefix,
        suffix,
    )

    # 'über' = b'\xc3\xbc...' — lanes must be 0xFFFFFFC3, 0xFFFFFFBC
    assert prefix("über", 50) == murmur_hash3_128_u32x4(
        0xFFFFFFC3, 0xFFFFFFBC, ord("b"), 50
    )
    assert prefix("über", 50) == (
        5125904855703891363,
        10899319191235150596,
    )
    assert suffix("née", 51) == (
        381910330686498207,
        16450096332482455117,
    )
    # pure ASCII unchanged
    assert prefix("abc", 7) == murmur_hash3_128_u32x4(97, 98, 99, 7)


def test_train_segmenter_plateau_stop_on_nonseparable():
    """max_iterations maps the reference's 2000 OCA rounds onto perceptron
    epochs; on NON-separable labels the eps mistake-rate stop never fires,
    so the plateau stop must bound the run (it used to spin all 2000
    Viterbi epochs)."""
    import time

    from mitie_spark.models.ner_model import train_segmenter

    sents = []
    for i in range(30):
        toks = ["alpha", "beta", "gamma", "delta"]
        sents.append((toks, [(1, 3)] if i % 2 == 0 else []))
    t = time.time()
    W, T = train_segmenter(sents, max_iterations=2000, eps=0.01)
    # ~0.02s with the stop; the full 2000-epoch run measures ~3.1s on
    # this host, so 1.0s actually discriminates (5.0 would not)
    assert time.time() - t < 1.0
    assert W.shape[0] in (3, 5) and T.shape[0] == W.shape[0]
    # eps=None = explicit epoch count: the plateau stop must NOT engage
    # (equal-best epochs would truncate the averaging run)
    import numpy as np

    from mitie_spark.models.ner_model import train_segmenter as _ts

    sep = [(["acme", "corp", "ltd"], [(0, 2)])] * 4
    w20, t20 = _ts(sep, epochs=20)
    w20b, t20b = _ts(sep, epochs=20)
    assert np.array_equal(w20, w20b) and np.array_equal(t20, t20b)
    w13, _ = _ts(sep, epochs=13)
    assert not np.array_equal(w20, w13)  # epochs 14-20 really ran
