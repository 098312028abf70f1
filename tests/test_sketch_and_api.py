"""Count-min sketch (A1) + reference-API surface tests."""

import numpy as np
import pytest


def test_murmur32_vectors():
    from mitie_spark.functions.hashing import dlib_string_hash, murmur_hash3_32

    assert murmur_hash3_32(b"foo") == 4138058784  # canonical x86-32 vector
    assert murmur_hash3_32(b"") == 0x0
    assert dlib_string_hash("") == 0  # dlib quirk: empty string → 0
    assert dlib_string_hash("foo", 1) != dlib_string_hash("foo", 2)


def test_count_min_sketch_local():
    from mitie_spark.operators.sketch import CountMinSketch

    s = CountMinSketch(hash_table_size=1000, num_hashes=8)
    for _ in range(10):
        s.increment("apple")
    s.increment("banana", 3)
    assert s.get_count("apple") >= 10  # never undercounts
    assert s.get_count("banana") >= 3
    assert s.total == 13
    # merge is linear
    t = CountMinSketch(hash_table_size=1000, num_hashes=8)
    t.increment("apple", 5)
    s.merge(t)
    assert s.get_count("apple") >= 15


def test_distributed_sketch_matches_exact(spark):
    from mitie_spark.operators.sketch import sketch_token_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sk = sketch_token_counts(docs, hash_table_size=50_000)
    # exact counts via the exact aggregate
    from pyspark.sql import functions as F

    exact = {
        r["token"]: r["cnt"]
        for r in docs.select(F.explode(F.split("text", r"\s+")).alias("token"))
        .filter("token <> ''")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert sk.total == sum(exact.values())
    for tok, cnt in list(exact.items())[:20]:
        got = sk.get_count(tok)
        assert got >= cnt  # CMS never undercounts
        assert got <= cnt + 0.01 * sk.total  # ε-overcount bound


def test_reference_api_surface():
    from mitie_spark import api

    tokens = api.tokenize("Maria Okafor was born in Lyon.")
    assert tokens == ["Maria", "Okafor", "was", "born", "in", "Lyon", "."]
    assert api.tokenize_with_offsets("ab cd")[1] == ("cd", 3)

    ner = api.named_entity_extractor()
    assert set(ner.get_possible_ner_tags()) == {
        "PERSON", "LOCATION", "ORGANIZATION",
    }
    ents = ner.extract_entities(tokens)
    got = {(" ".join(tokens[r.start : r.stop]), tag) for r, tag, _ in ents}
    assert ("Maria Okafor", "PERSON") in got
    assert ("Lyon", "LOCATION") in got

    # relation detection through the binding-shaped API
    person = next(r for r, t, _ in ents if t == "PERSON")
    place = next(r for r, t, _ in ents if t == "LOCATION")
    det = api.binary_relation_detector(name="born_in")
    rel = ner.extract_binary_relation(tokens, person, place)
    assert det(rel) > 0  # score > 0 ⇒ relation holds
    rel_rev = ner.extract_binary_relation(tokens, place, person)
    assert det(rel_rev) <= 0  # wrong argument order

    assert str(det) == "binary_relation_detector: born_in"  # mitie.py:399-405
    assert repr(det) == "<binary_relation_detector: born_in>"

    cat = api.text_categorizer()
    label, score = cat(tokens)
    assert label == "born"
    # optional pure-model extractor arg (mitie.py:761) is accepted
    label2, _ = cat(tokens, feature_extractor=None)
    assert label2 == label


def test_api_extract_entities_extractor_guard(tmp_path):
    """mitie.py:299-306 — extract_entities accepts an optional
    total_word_feature_extractor; a mismatched one is rejected like the
    reference's fingerprint guard (named_entity_extractor.h:223-245)."""
    import numpy as np

    from mitie_spark import api

    ner = api.named_entity_extractor()
    tokens = api.tokenize("Maria Okafor was born in Lyon.")

    # matching extractor: save the model's own word vectors, reload via the
    # facade — same chained fingerprint, extraction proceeds
    p = str(tmp_path / "wv.npz")
    ner._model.fs.wv.save(p)
    fe = api.total_word_feature_extractor(p)
    assert fe.fingerprint == ner._model.fs.wv.fingerprint
    ents = ner.extract_entities(tokens, feature_extractor=fe)
    assert any(tag == "PERSON" for _, tag, _ in ents)

    # mismatched extractor: perturb the core matrix → fingerprint changes
    from mitie_spark.models.word_vectors import WordVectors

    wv2 = WordVectors.load(p)
    wv2.core = np.ascontiguousarray(wv2.core + np.float32(1.0))
    p2 = str(tmp_path / "wv2.npz")
    wv2.save(p2)
    fe_bad = api.total_word_feature_extractor(p2)
    assert fe_bad.fingerprint != fe.fingerprint
    with pytest.raises(ValueError, match="fingerprint"):
        ner.extract_entities(tokens, feature_extractor=fe_bad)


def test_fingerprint_guard(tmp_path):
    """S5 parity: models trained against a different feature space must
    refuse to load (named_entity_extractor.h:223-245)."""
    import numpy as np

    from mitie_spark.models.ner_model import NerModel
    from mitie_spark.models.train import ARTIFACT_DIR
    import os

    src = os.path.join(ARTIFACT_DIR, "ner_model.npz")
    z = dict(np.load(src, allow_pickle=False))
    z["fingerprint"] = np.array([12345], dtype=np.int64)
    bad = str(tmp_path / "bad.npz")
    np.savez_compressed(bad, **z)
    with pytest.raises(ValueError, match="fingerprint"):
        NerModel.load(bad)
    NerModel.load(src)  # the real artifact loads fine
