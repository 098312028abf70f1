"""Unit tests for the OCA multiclass-SVM port (mitie_spark/models/oca.py).

The cross-engine differential (tests/test_cross_engine.py,
probe_multiclass.cpp) proves bit-parity against dlib's own solver; the
goldens here pin that exact output so regressions surface even without a
C++ toolchain.  Everything else checks behavior the port must keep:
SMO KKT optimality, strict first-max tie-breaking, the rotating CV fold
composition, and the reference's F-beta formula.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from mitie_spark.models.oca import (
    MulticlassSvmProblem,
    compute_fscore,
    count_of_least_common_label,
    cross_validate_multiclass_trainer,
    multiclass_predict,
    solve_qp_using_smo,
    svm_multiclass_linear_train,
)
from mitie_spark.models.oca import (
    test_multiclass_decision_function as confusion_counts,  # noqa: N813
)


def _probe_dataset():
    # identical to probe_multiclass.cpp / test_cross_engine.py
    state = 42
    mask = (1 << 64) - 1

    def nxt():
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) & mask
        return state >> 33

    samples, labels = [], []
    for i in range(24):
        lab = i % 3
        m = {lab: 2.0}
        for _ in range(5):
            idx = 3 + nxt() % 37
            val = ((nxt() % 9) + 1) * 0.25
            m[idx] = m.get(idx, 0.0) + val
        samples.append(sorted(m.items()))
        labels.append(lab)
    return samples, labels


# (C, eps, max_iterations) -> (md5 of the hex weight vector, objective hex)
# captured from probe_multiclass.cpp (dlib's own oca over the deterministic
# problem shape) — the bit-exactness contract, frozen
_GOLDEN = {
    (300.0, 0.0001, 2000): (
        "03b5a397a1a938bdc1b624af3fbf9297", "0x1.de5f9284e9135p-3"
    ),
    (1.0, 0.001, 10000): (
        "6ee8243a3641b63a706af6d6f275e227", "0x1.bbd0e624f519cp-3"
    ),
    (25.0, 0.001, 2000): (
        "5aa43abc87fd8931822a02b54d6d2ed4", "0x1.edb37db51ae37p-3"
    ),
}


@pytest.mark.parametrize("case", sorted(_GOLDEN))
def test_train_matches_reference_golden(case):
    samples, labels = _probe_dataset()
    C, eps, mi = case
    W, b, labs, obj = svm_multiclass_linear_train(
        samples, labels, C=C, eps=eps, max_iterations=mi
    )
    assert labs == [0, 1, 2]
    w_full = np.hstack([W, b[:, None]]).reshape(-1)
    h = hashlib.md5(" ".join(v.hex() for v in w_full).encode()).hexdigest()
    md5_ref, obj_ref = _GOLDEN[case]
    assert h == md5_ref
    assert obj.hex() == obj_ref


def test_smo_kkt_optimality():
    """On a tiny QP with a known closed form: minimize a1^2 + a2^2 - a1
    s.t. a1 + a2 == 1, a >= 0 has the optimum (0.75, 0.25)."""
    Q = np.array([[2.0, 0.0], [0.0, 2.0]])
    b = np.array([1.0, 0.0])
    alpha = np.array([1.0, 0.0])
    iters = solve_qp_using_smo(Q, b, alpha, 1e-12, 10000)
    assert iters < 10000
    np.testing.assert_allclose(alpha, [0.75, 0.25], rtol=1e-9)
    # the equality constraint is preserved exactly by the paired update
    assert alpha.sum() == 1.0


def test_smo_warm_start_preserves_constraint_sum():
    rng = np.random.default_rng(7)
    A = rng.standard_normal((5, 5))
    Q = A @ A.T
    b = rng.standard_normal(5)
    alpha = np.array([4.0, 0.0, 0.0, 0.0, 0.0])
    solve_qp_using_smo(Q, b, alpha, 1e-10, 50000)
    assert np.all(alpha >= 0)
    assert abs(alpha.sum() - 4.0) < 1e-12
    # KKT: gradient equal on the support, larger off it
    df = Q @ alpha - b
    on = df[alpha > 1e-12]
    assert on.max() - on.min() < 1e-6
    assert df.min() >= on.min() - 1e-6


def test_separable_problem_trains_clean():
    samples, labels = _probe_dataset()
    W, b, labs, _ = svm_multiclass_linear_train(
        samples, labels, C=300.0, eps=0.0001, max_iterations=2000
    )
    res = confusion_counts(W, b, labs, samples, labels)
    assert np.array_equal(res, np.diag([8.0, 8.0, 8.0]))


def test_predict_strict_first_max_and_prefix_dot():
    # two identical rows -> first label wins on the tie
    W = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 0.0]])
    b = np.zeros(3)
    lab, val = multiclass_predict(W, b, [5, 7, 9], [(0, 2.0)])
    assert (lab, val) == (5, 2.0)
    # indices past the weight columns are ignored (dlib sparse-prefix dot)
    lab2, val2 = multiclass_predict(W, b, [5, 7, 9], [(0, 2.0), (17, 99.0)])
    assert (lab2, val2) == (5, 2.0)


def test_cv_fold_composition_is_rotating_per_class():
    """2 classes x 4 samples, 2 folds: dlib's split walks each class's
    occurrences cyclically — fold 1 tests the first two of each class,
    fold 2 the next two; every sample is tested exactly once."""
    # 8 one-hot samples so train/test membership is readable off weights
    samples = [[(i, 1.0)] for i in range(8)]
    labels = [0, 1, 0, 1, 0, 1, 0, 1]
    seen_tests = []

    def train_fn(x, y):
        seen_tests.append([s[0][0] for s in x])
        w, b, labs, _ = svm_multiclass_linear_train(
            x, y, C=10.0, eps=0.001, max_iterations=500
        )
        return w, b, labs

    cross_validate_multiclass_trainer(train_fn, samples, labels, 2)
    # fold 1 trains on the LAST two of each class, fold 2 on the first two
    assert seen_tests == [[4, 6, 5, 7], [0, 2, 1, 3]]


def test_cv_rejects_starved_class():
    samples = [[(0, 1.0)], [(1, 1.0)], [(2, 1.0)]]
    labels = [0, 0, 1]
    with pytest.raises(ValueError):
        cross_validate_multiclass_trainer(
            lambda x, y: svm_multiclass_linear_train(x, y, C=1.0)[:3],
            samples, labels, 2,
        )


def test_compute_fscore_reference_formula():
    # confusion with a not-entity bucket (class index >= num_labels)
    res = np.array([
        [8.0, 1.0, 1.0],
        [0.0, 9.0, 1.0],
        [2.0, 0.0, 5.0],
    ])
    beta = 0.5
    # correct = 8 + 9 = 17; predictions into real classes = 20; truth = 20
    precision = 17.0 / 20.0
    recall = 17.0 / 20.0
    want = (1 + beta * beta) * precision * recall / (
        beta * beta * precision + recall
    )
    assert compute_fscore(res, 2, beta) == want


def test_count_of_least_common_label():
    assert count_of_least_common_label([0, 0, 1, 2, 2, 2]) == 1
    assert count_of_least_common_label([3, 3, 4, 4]) == 2


def test_problem_dims_include_bias_blocks():
    samples, labels = _probe_dataset()
    p = MulticlassSvmProblem(samples, labels, [0, 1, 2], 40, C=1.0)
    assert p.get_num_dimensions() == 41 * 3
    risk, sub = p.get_risk(np.zeros(41 * 3))
    # w == 0: every sample's oracle picks a wrong class at loss 1
    assert risk == 1.0
    assert sub.shape == (41 * 3,)


def test_compact_support_solve_is_bit_identical_to_dense():
    """The default support-compaction path (hashed features relabeled onto
    their support before solving) reproduces the dense solve bit-for-bit —
    INCLUDING the -0.0 weights at untouched positions that fall out of the
    dense ``w_k = -alpha_0*(+0) - ...`` chain."""
    state = 7
    mask = (1 << 64) - 1

    def nxt():
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) & mask
        return state >> 33

    samples, labels = [], []
    for i in range(20):
        lab = i % 3
        m = {lab * 1000: 2.0}
        for _ in range(4):
            idx = 10 + nxt() % 99990
            m[idx] = m.get(idx, 0.0) + ((nxt() % 9) + 1) * 0.25
        samples.append(sorted(m.items()))
        labels.append(lab)

    out = {}
    for compact in (True, False):
        W, b, labs, obj = svm_multiclass_linear_train(
            samples, labels, C=50.0, eps=0.0001, max_iterations=2000,
            compact=compact,
        )
        full = np.hstack([W, b[:, None]]).reshape(-1)
        out[compact] = (" ".join(v.hex() for v in full), obj, labs)
    assert out[True] == out[False]
    # the scatter really fills -0.0 (hex distinguishes it from +0.0)
    assert "-0x0.0p+0" in out[True][0]
