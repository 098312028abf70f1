"""Reference-shaped trainer surface (mitie.py:466-827 call shapes): build
training instances, train, predict, save/load round-trip."""

import random

import pytest


def _sentences(n, seed=5):
    from mitie_spark.corpus import make_sentence

    rng = random.Random(f"trainer-api:{seed}")
    return [make_sentence(rng) for _ in range(n)]


@pytest.fixture(scope="module")
def trained_ner():
    from mitie_spark.api import ner_trainer, ner_training_instance

    trainer = ner_trainer("ignored_feature_extractor_path")
    for toks, ments, _ in _sentences(250):
        inst = ner_training_instance(toks)
        for s, e, tag, _surf in ments:
            assert not inst.overlaps_any_entity(range(s, e))
            inst.add_entity(range(s, e), tag)
        trainer.add(inst)
    assert trainer.size == 250
    return trainer.train()


def test_ner_trainer_learns_planted_entities(trained_ner):
    hits = total = 0
    for toks, ments, _ in _sentences(40, seed=99):
        pred = {
            (r.start, r.stop, tag) for r, tag, _ in trained_ner.extract_entities(toks)
        }
        truth = {(s, e, tag) for s, e, tag, _ in ments}
        hits += len(pred & truth)
        total += len(truth)
    assert total > 0
    assert hits / total >= 0.9  # planted templates are learnable


def test_ner_trainer_save_load_round_trip(trained_ner, tmp_path):
    from mitie_spark.api import named_entity_extractor

    p = str(tmp_path / "custom_ner.npz")
    trained_ner.save_to_disk(p)
    again = named_entity_extractor(p)
    assert again.get_possible_ner_tags() == trained_ner.get_possible_ner_tags()
    toks = _sentences(1, seed=7)[0][0]
    assert [
        (r.start, r.stop, t) for r, t, _ in again.extract_entities(toks)
    ] == [(r.start, r.stop, t) for r, t, _ in trained_ner.extract_entities(toks)]


def test_relation_detector_trainer(trained_ner):
    from mitie_spark.api import binary_relation_detector_trainer

    trainer = binary_relation_detector_trainer("test.born_in", trained_ner)
    n_pos = 0
    for toks, ments, rels in _sentences(300, seed=11):
        by_idx = {i: (s, e) for i, (s, e, _, _) in enumerate(ments)}
        pos_pairs = {(si, oi) for si, p, oi in rels if p == "born_in"}
        for si, p, oi in rels:
            if p == "born_in":
                trainer.add_positive_binary_relation(
                    toks, range(*by_idx[si]), range(*by_idx[oi])
                )
                n_pos += 1
                # reversed order is a negative (directionality)
                trainer.add_negative_binary_relation(
                    toks, range(*by_idx[oi]), range(*by_idx[si])
                )
        for i in range(len(ments) - 1):
            if (i, i + 1) not in pos_pairs and (i + 1, i) not in pos_pairs:
                trainer.add_negative_binary_relation(
                    toks, range(*by_idx[i]), range(*by_idx[i + 1])
                )
    assert trainer.num_positive_examples == n_pos > 10
    det = trainer.train()
    assert det.name_string == "test.born_in"

    tp = fp = fn = 0
    for toks, ments, rels in _sentences(60, seed=12):
        by_idx = {i: (s, e) for i, (s, e, _, _) in enumerate(ments)}
        truth = {(si, oi) for si, p, oi in rels if p == "born_in"}
        for i in range(len(ments)):
            for j in range(len(ments)):
                if i == j or abs(i - j) > 1:
                    continue
                rel = trained_ner.extract_binary_relation(
                    toks, range(*by_idx[i]), range(*by_idx[j])
                )
                hit = det(rel) > 0
                if (i, j) in truth:
                    tp += hit
                    fn += not hit
                else:
                    fp += hit
    assert tp / max(tp + fn, 1) >= 0.85
    assert tp / max(tp + fp, 1) >= 0.85


def test_text_categorizer_trainer(tmp_path):
    from mitie_spark.api import text_categorizer, text_categorizer_trainer
    from mitie_spark.models.train import build_categorizer_data

    trainer = text_categorizer_trainer()
    for toks, label in build_categorizer_data(300, seed=21):
        trainer.add_labeled_text(toks, label)
    assert trainer.size == 300
    cat = trainer.train()
    held = build_categorizer_data(80, seed=22)
    acc = sum(1 for toks, y in held if cat(toks)[0] == y) / len(held)
    assert acc >= 0.8
    p = str(tmp_path / "cat.npz")
    cat.save_to_disk(p)
    again = text_categorizer(p)
    toks0 = held[0][0]
    assert again(toks0)[0] == cat(toks0)[0]


def test_trainer_hyperparameter_surface_affects_solver():
    """The reference solver's knobs (ner_trainer.cpp:498-572: C, eps,
    max-iter, loss-per-missed-segment; classifier C :360-405) exist on the
    facade and genuinely change the trained weights."""
    import numpy as np

    from mitie_spark.api import ner_trainer
    from mitie_spark.models.ner_model import train_segmenter

    t = ner_trainer("ignored")
    for knob, default in [
        ("C", 20.0), ("eps", 0.01), ("max_iterations", 2000),
        ("loss_per_missed_segment", 3.0), ("classifier_C", 300.0),
        ("beta", 0.5), ("num_threads", 4),
    ]:
        assert getattr(t, knob) == default

    sents = [
        ("Alice Smith visited Boston today".split(), [(0, 2), (3, 4)]),
        ("the market closed early".split(), []),
        ("Bob Jones met Alice Smith".split(), [(0, 2), (3, 5)]),
    ] * 3
    base = train_segmenter(sents, epochs=4)
    strong_reg = train_segmenter(sents, epochs=4, C=1.01)
    assert not np.allclose(base[0], strong_reg[0])  # C affects weights
    upweighted = train_segmenter(sents, epochs=4, loss_per_missed_segment=9.0)
    assert not np.allclose(base[0], upweighted[0])
    one_epoch = train_segmenter(sents, max_iterations=1)
    many = train_segmenter(sents, max_iterations=6)
    assert not np.allclose(one_epoch[0], many[0])  # max_iterations caps epochs
    # eps=1.0 stops after the first epoch (mistake rate is always <= 1)
    early = train_segmenter(sents, max_iterations=6, eps=1.0)
    assert np.allclose(early[0], one_epoch[0])


def test_relation_trainer_auto_tune_cv(trained_ner):
    """auto_tune mirrors the reference's 6-fold CV C search
    (binary_relation_detector_trainer.cpp:176-238): deterministic,
    C lands inside the reference's [1/n, 1e5/n]·(5/6) bounds, skipped
    when positives <= folds, and the tuned detector still separates the
    planted relation."""
    from mitie_spark.api import binary_relation_detector_trainer
    from mitie_spark.models.relation_model import tune_relation_C

    trainer = binary_relation_detector_trainer("test.born_in", trained_ner)
    examples = []
    for toks, ments, rels in _sentences(80, seed=21):
        by_idx = {i: (s, e) for i, (s, e, _, _) in enumerate(ments)}
        for si, p, oi in rels:
            if p == "born_in":
                trainer.add_positive_binary_relation(
                    toks, range(*by_idx[si]), range(*by_idx[oi])
                )
                trainer.add_negative_binary_relation(
                    toks, range(*by_idx[oi]), range(*by_idx[si])
                )
                examples.append((toks, by_idx[si], by_idx[oi], "test.born_in"))
                examples.append((toks, by_idx[oi], by_idx[si], None))
    assert trainer.num_positive_examples > 6

    fs = trained_ner._model.fs
    c1 = tune_relation_C(["test.born_in"], examples, fs=fs)
    c2 = tune_relation_C(["test.born_in"], examples, fs=fs)
    assert c1 == c2  # deterministic search
    n = len(examples)
    assert (1.0 / n) * (5.0 / 6.0) <= c1 <= (100000.0 / n) * (5.0 / 6.0)

    # <= folds positives: the reference skips the search; so do we
    assert tune_relation_C(["r"], examples[:10], fs=fs) is None

    trainer.auto_tune = True
    det = trainer.train()
    scores = []
    for toks, a1, a2, pos in examples[:40]:
        rel = trained_ner.extract_binary_relation(
            toks, range(*a1), range(*a2)
        )
        scores.append((det(rel) > 0, pos is not None))
    acc = sum(int(p == t) for p, t in scores) / len(scores)
    assert acc >= 0.9


def test_ner_trainer_svm_solver_chunk_classifier():
    """solver="svm" trains the chunk classifier with the OCA multiclass
    port (the reference's exact flow) and still learns the planted
    entities.  Determinism and bit-parity of the solver live in
    tests/test_oca.py (goldens) and tests/test_cross_engine.py."""
    from mitie_spark.api import ner_trainer, ner_training_instance

    trainer = ner_trainer()
    trainer.solver = "svm"
    for toks, ments, _ in _sentences(20, seed=11):
        inst = ner_training_instance(toks)
        for s, e, tag, _surf in ments:
            inst.add_entity(range(s, e), tag)
        trainer.add(inst)
    ner = trainer.train()

    hits = total = 0
    for toks, ments, _ in _sentences(25, seed=12):
        pred = {
            (r.start, r.stop, tag) for r, tag, _ in ner.extract_entities(toks)
        }
        want = {(s, e, tag) for s, e, tag, _ in ments}
        hits += len(pred & want)
        total += len(want)
    assert total and hits / total >= 0.85


def test_text_categorizer_trainer_svm_solver():
    """solver="svm" (BoW-only, no extractor) trains the reference's exact
    OCA flow and classifies held-out synthetic docs accurately."""
    from mitie_spark.api import text_categorizer_trainer
    from mitie_spark.models.train import build_categorizer_data

    trainer = text_categorizer_trainer()
    trainer.solver = "svm"
    for toks, label in build_categorizer_data(60, seed=31):
        trainer.add_labeled_text(toks, label)
    cat = trainer.train()
    held = build_categorizer_data(60, seed=32)
    acc = sum(1 for toks, y in held if cat(toks)[0] == y) / len(held)
    assert acc >= 0.8
