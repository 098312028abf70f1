"""Wordrep end-to-end artifact: the full A1→A6 chain (count → top-k →
contexts → CCA → morph) over the corpus writes a REAL
``total_word_feature_extractor.dat`` through the dlib codec, which reloads
as a NER token-feature source with bit-identical vectors and a preserved
fingerprint chain (reference: tools/wordrep/src/main.cpp:142-149 composes
exactly this artifact; the cross-engine suite separately proves the
compiled C++ consumes files in this format)."""

import numpy as np
import pytest

PAGES = "/root/repo/data/kg_sf0.001/pages.parquet"


@pytest.fixture(scope="module")
def wv(spark):
    from mitie_spark.models.word_vectors import train_word_vectors

    docs = spark.read.parquet(PAGES).select("url", "text")
    return train_word_vectors(
        docs,
        id_col="url",
        text_col="text",
        vocab_size=150,
        cca_dim=4,
        morph_dim=4,
        n_substrings=200,
    )


def test_wordrep_chain_writes_real_twfe(wv, tmp_path):
    from mitie_spark.sources.dlib_models import (
        DlibTotalWordFeatureExtractor,
        read_total_word_feature_extractor,
        write_total_word_feature_extractor,
    )

    assert len(wv.words) > 50  # the chain actually built a vocabulary
    p = str(tmp_path / "total_word_feature_extractor.dat")
    write_total_word_feature_extractor(p, wv.to_twfe_dict())

    fe = DlibTotalWordFeatureExtractor(read_total_word_feature_extractor(p))
    # fingerprint chain survives the binary round trip
    assert fe.fingerprint == wv.fingerprint
    assert fe.dims == wv.dims

    probes = list(wv.words[:20]) + [
        "zzz-never-seen",
        "Uncommon",
        "1984",  # digit fold must hit the same path both sides
        "a12b",
        "",
    ]
    for w in probes:
        a = wv.token_features(w)
        b = fe.token_features(w)
        assert np.array_equal(a, b), w


def test_twfe_artifact_drives_ner_identically(wv, tmp_path):
    """Plugged in as the NER word-feature source, the reloaded artifact
    reproduces the in-memory chain's extraction exactly (same X matrix →
    same Viterbi path → same chunk scores)."""
    from mitie_spark.models.ner_model import NerModel, sentence_matrix
    from mitie_spark.sources.dlib_models import (
        DlibTotalWordFeatureExtractor,
        read_total_word_feature_extractor,
        write_total_word_feature_extractor,
    )

    p = str(tmp_path / "twfe.dat")
    write_total_word_feature_extractor(p, wv.to_twfe_dict())
    fe = DlibTotalWordFeatureExtractor(read_total_word_feature_extractor(p))

    toks = "Alice visited the market in 1984 and met Bob-Smith .".split()
    Xa = sentence_matrix(toks, fs=wv)
    Xb = sentence_matrix(toks, fs=fe)
    assert np.array_equal(Xa, Xb)

    # deterministic weights over the shared feature space: both sources
    # must give identical entities AND identical scores
    rng = np.random.default_rng(0)
    d = wv.dims
    from mitie_spark.models.ner_model import MAX_FEAT, N_STATES, WINDOW

    W_seg = rng.standard_normal((N_STATES, WINDOW * d + 1)) * 0.1
    T_seg = rng.standard_normal((N_STATES, N_STATES)) * 0.01
    k = 3
    W_sp = np.zeros((k, MAX_FEAT))
    W_dn = rng.standard_normal((k, 5 * d)) * 0.1
    b = rng.standard_normal(k) * 0.01
    m_a = NerModel(W_seg, T_seg, W_sp, W_dn, b, ["person", "org"], fs=wv)
    m_b = NerModel(W_seg, T_seg, W_sp, W_dn, b, ["person", "org"], fs=fe)
    assert m_a.extract_entities(toks) == m_b.extract_entities(toks)


def test_api_facade_exposes_wordrep_artifact(wv, tmp_path):
    from mitie_spark import api
    from mitie_spark.sources.dlib_models import write_total_word_feature_extractor

    p = str(tmp_path / "twfe.dat")
    write_total_word_feature_extractor(p, wv.to_twfe_dict())
    twfe = api.total_word_feature_extractor(p)
    assert twfe.fingerprint == wv.fingerprint
    assert twfe.num_dimensions == wv.dims
    assert twfe.num_words_in_dictionary == len(wv.words)
    w = wv.words[0]
    assert np.array_equal(twfe.get_feature_vector(w), wv.token_features(w))


def test_cpp_trainer_consumes_wordrep_artifact(wv, tmp_path):
    """The REAL trained A1→A6 artifact (not a synthetic fixture) must
    deserialize inside the reference C++ — constructing its ner_trainer
    loads the total_word_feature_extractor (mitie_create_ner_trainer).
    Skipped when the cross-engine build is unavailable."""
    import shutil
    from pathlib import Path

    so = Path(__file__).resolve().parent.parent / ".refbuild" / "mitielib" / "libmitie.so"
    if not so.exists() or shutil.which("g++") is None:
        pytest.skip("compiled reference unavailable")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_mitie_wr", str(so.parent / "mitie.py")
    )
    cpp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cpp)

    from mitie_spark.sources.dlib_models import write_total_word_feature_extractor

    p = str(tmp_path / "twfe.dat")
    write_total_word_feature_extractor(p, wv.to_twfe_dict())
    trainer = cpp.ner_trainer(p)  # C++ deserializes our trained artifact
    inst = cpp.ner_training_instance(["Alice", "visited", "Acme", "."])
    inst.add_entity(range(0, 1), "person")
    trainer.add(inst)
    assert trainer.size == 1
