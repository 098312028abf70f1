"""Unit tests for the DCD-trainer port (mitie_spark/models/dcd.py) that
need no C++ toolchain — the bit-for-bit differential against the compiled
reference (RNG stream, shuffle permutation, solver, CV, and both
end-to-end trained detectors) lives in tests/test_cross_engine.py."""

import numpy as np

from mitie_spark.models.dcd import (
    DlibRand,
    cross_validate_trainer,
    randomize_samples,
    svm_c_linear_dcd_train,
)
from mitie_spark.models.dcd import test_binary_decision_function as _accuracy


def test_mt19937_known_answer():
    """The underlying generator is standard MT19937: with the default
    seed 5489 and NO priming, the first outputs are the published
    known-answer values."""
    r = DlibRand.__new__(DlibRand)
    state = np.empty(624, dtype=np.uint64)
    state[0] = 5489
    prev = 5489
    for i in range(1, 624):
        prev = (1812433253 * (prev ^ (prev >> 30)) + i) & 0xFFFFFFFF
        state[i] = prev
    r._state = state.astype(np.uint32)
    r._refill()
    got = [r.get_random_32bit_number() for _ in range(4)]
    assert got == [3499211612, 581869302, 3890346734, 3586334585]


def test_rand_skip_equals_draws():
    a, b = DlibRand(), DlibRand()
    a.skip(1300)  # crosses two refill boundaries
    for _ in range(1300):
        b.get_random_32bit_number()
    assert a.get_random_32bit_number() == b.get_random_32bit_number()


def test_rand_string_seed_changes_stream_deterministically():
    a, b, c = DlibRand("foo"), DlibRand("foo"), DlibRand()
    va = a.get_random_32bit_number()
    assert va == b.get_random_32bit_number()
    assert va != c.get_random_32bit_number()


def _toy(n=24, planted=0.9):
    """Separable-with-noise sparse problem: feature 0 fires for +1, 1
    for -1, plus shared noise features."""
    rng = np.random.default_rng(7)
    samples, labels = [], []
    for i in range(n):
        y = 1.0 if i % 2 == 0 else -1.0
        m = {0 if y > 0 else 1: 1.0, 2 + int(rng.integers(8)): 0.5}
        if rng.random() > planted:
            y = -y
        samples.append(sorted(m.items()))
        labels.append(y)
    return samples, labels


def test_dcd_learns_planted_signal():
    samples, labels = _toy(planted=1.1)  # fully separable
    w, b = svm_c_linear_dcd_train(samples, labels, 10.0, 10.0)
    acc_pos, acc_neg = _accuracy(w, b, samples, labels)
    assert acc_pos == 1.0 and acc_neg == 1.0
    assert w[0] > 0 > w[1]


def test_dcd_per_class_C_shifts_boundary():
    """A huge positive-class C with a tiny negative-class C must not
    misclassify positives on separable data, and vice versa."""
    samples, labels = _toy(planted=1.1)
    w, b = svm_c_linear_dcd_train(samples, labels, 100.0, 0.001)
    acc_pos, _ = _accuracy(w, b, samples, labels)
    assert acc_pos == 1.0


def test_randomize_samples_is_permutation():
    ids = list(range(50))
    labs = [i * 10 for i in range(50)]
    randomize_samples(ids, labs)
    assert sorted(ids) == list(range(50))
    assert ids != list(range(50))
    # pairing preserved
    assert all(l == i * 10 for i, l in zip(ids, labs))


def test_cross_validate_fold_accounting():
    """Fold composition: with 12 pos / 12 neg and 6 folds every test block
    is 2+2 and accuracies land in [0, 1]."""
    samples, labels = _toy(n=24, planted=1.1)
    r0, r1 = cross_validate_trainer(samples, labels, 6, 1.0, 1.0)
    assert 0.0 <= r0 <= 1.0 and 0.0 <= r1 <= 1.0
    assert r0 == 1.0 and r1 == 1.0  # separable => perfect CV
