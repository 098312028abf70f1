"""Bit-exact behavioral port of dlib's OCA cutting-plane solver and the
multiclass linear SVM stack MITIE trains its NER segment (chunk)
classifier and text categorizer with (Franc & Sonnenburg, "Optimized
Cutting Plane Algorithm for Support Vector Machines", ICML 2008 — public
algorithm; dlib implementation studied at
/root/reference/dlib/dlib/optimization/optimization_oca.h).

Everything is float64 with the reference's exact operation order, so
training on the same samples yields the SAME decision function as the
deterministic (sequential) shape of the compiled reference — verified
bit-for-bit in tests/test_cross_engine.py against a probe that runs
dlib's own oca/solve_qp_using_smo/structural_svm_problem code.

Ported pieces (reference file:line):

- ``solve_qp_using_smo`` — dlib/optimization/optimization_solve_qp_using_smo.h
  :77-210: the two-variable SMO subproblem solver (duality-gap stop,
  tau-clamped quadratic coefficient, every-300-iterations gradient
  refresh).
- ``oca_solve`` — dlib/optimization/optimization_oca.h:158-345
  (``oca_impl``): the cutting-plane loop with the flat zero lower-bound
  plane, warm-started alpha, eps = min(1e-2, 0.1*gap) subproblem
  accuracy, and the 20-miss inactive-plane pruning.  MITIE's multiclass
  trainers never use the prior / nonnegative / force-weight-to-1 modes,
  so those are intentionally not implemented.
- ``MulticlassSvmProblem`` — dlib/svm/svm_multiclass_linear_trainer.h
  :25-160 (``multiclass_svm_problem``: PSI layout ``[0,..,x,-1,..,0]``
  per class block with a trailing -1 bias slot) combined with
  dlib/svm/structural_svm_problem.h:525-566 (``get_risk``: psi_true once,
  sequential separation-oracle sweep, subgradient/loss normalization)
  and :425-505 (``optimization_status``: the multiclass trainer sets
  ``max_cache_size = 0`` — svm_multiclass_linear_trainer.h:366 — so the
  oracle cache is disabled and the status logic stops on the first
  ``risk_gap < eps`` iteration).
- ``svm_multiclass_linear_train`` — svm_multiclass_linear_trainer.h
  :315-410 (``train``): sorted distinct labels
  (multiclass_tools.h:18-25, std::set ascending), dims =
  max_index_plus_one, row-major weight reshape with the bias column
  split off.
- ``multiclass_predict`` / ``test_multiclass_decision_function`` —
  dlib/svm/function.h:781-813 (strict first-max argmax, sparse-prefix
  dot) and dlib/svm/cross_validate_multiclass_trainer.h:21-61.
- ``cross_validate_multiclass_trainer`` —
  cross_validate_multiclass_trainer.h:71-200: the deterministic
  per-class rotating fold composition (no RNG).
- ``compute_fscore`` + ``tune_multiclass_C`` — the shared CV F-beta
  objective and ``find_max_single_variable`` C search both MITIE
  trainers run (ner_trainer.cpp:281-405,
  text_categorizer_trainer.cpp:144-270: C0=300 on [0.01, 5000], eps=1,
  100 iterations, fall back to C=300 on failure, skipped when the least
  common label has a single example).

Determinism note: the compiled trainer wraps the problem in
structural_svm_problem_threaded (svm_multiclass_linear_trainer.h:25),
whose subgradient accumulation switches between a buffered and an
unbuffered float-addition shape based on WALL-CLOCK timings
(structural_svm_problem_threaded.h:114-137) — the reference trainer is
therefore not bit-reproducible against itself, even single-threaded.
This port implements the sequential unbuffered shape, i.e. exactly the
base-class structural_svm_problem semantics (structural_svm_problem.h
:552-566), which is also what the threaded wrapper computes on its
first iteration and whenever buffering loses the timing race.  The
cross-engine probe therefore drives dlib's own oca + SMO + get_risk
against a problem with that deterministic shape and matches bit-for-bit;
the real threaded trainer is additionally matched end-to-end within its
own run-to-run envelope.

Scale note: like the DCD relation trainer (models/dcd.py), this trainer
is driver-side by design — MITIE's sample lists live in the trainer
object, and the solve is a small dense cutting-plane loop that must be
bit-reproducible, not distributed.  Spark-side distribution happens
upstream (feature extraction over the corpus) and downstream (scoring,
operators/extraction.py).
"""

from __future__ import annotations

import numpy as np

from .dcd import _as_arrays

__all__ = [
    "solve_qp_using_smo",
    "oca_solve",
    "MulticlassSvmProblem",
    "svm_multiclass_linear_train",
    "multiclass_predict",
    "test_multiclass_decision_function",
    "cross_validate_multiclass_trainer",
    "compute_fscore",
    "tune_multiclass_C",
]

_DBL_MAX = np.finfo(np.float64).max


# reusable product/accumulate buffers keyed by length: the cutting-plane
# Gram updates run hundreds of million-element dots, and a fresh 10+ MB
# temporary per dot pays this host's first-touch page-fault tax every
# time (glibc munmaps big frees).  Plain allocation reuse — results are
# bit-identical.  The trainer is driver-side single-threaded by design.
_DOT_SCRATCH: dict[int, np.ndarray] = {}


def _seq_dot(a: np.ndarray, b: np.ndarray) -> float:
    """dlib dot(col, col) == (trans(a)*b)(0) (matrix_utilities.h:435-462):
    the 1x1 matrix-product element is a strictly left-to-right k-loop of
    ``temp += a(k)*b(k)``.  np.add.accumulate is sequential; np.sum's
    pairwise tree is one ulp off."""
    n = a.shape[0]
    if n == 0:
        return 0.0
    buf = _DOT_SCRATCH.get(n)
    if buf is None:
        if len(_DOT_SCRATCH) > 8:
            _DOT_SCRATCH.clear()
        buf = _DOT_SCRATCH[n] = np.empty(n, dtype=np.float64)
    np.multiply(a, b, out=buf)
    np.add.accumulate(buf, out=buf)
    return float(buf[-1])


# ---------------------------------------------------------------------------
# solve_qp_using_smo — optimization_solve_qp_using_smo.h:77-210
# ---------------------------------------------------------------------------


def solve_qp_using_smo(
    Q: np.ndarray,
    b: np.ndarray,
    alpha: np.ndarray,
    eps: float,
    max_iter: int,
) -> int:
    """Minimize 0.5*a'Qa - a'b s.t. sum(a) == sum(alpha0), a >= 0.

    ``alpha`` is modified in place (warm start, like the reference).
    Every float op follows the C++ order: the duality-gap stop
    ``a'df - C*min(df) < eps``, the tau = 1000*eps_machine clamp, the
    in-place two-variable update, and the every-300-iterations full
    gradient refresh (:184-203) that resets accumulated error.
    """
    n = alpha.shape[0]
    # const T C = sum(alpha) — dlib sum is a sequential element loop
    C = float(np.add.accumulate(alpha)[-1])
    # matrix df = Q*alpha - b — each element is a sequential k-loop dot
    # (matrix_default_mul.h:49-62 routes vector products through the
    # elementwise path), then the subtraction
    df = np.add.accumulate(Q * alpha[None, :], axis=1)[:, -1] - b
    tau = 1000.0 * float(np.finfo(np.float64).eps)

    it = 0
    for it in range(int(max_iter)):
        # big = largest df among alpha > 0 (strict >, first kept);
        # little = smallest df overall (strict <, first kept) — np.argmax/
        # argmin return the first occurrence, matching the C++ loop
        masked = np.where(alpha > 0, df, -np.inf)
        big_idx = int(np.argmax(masked))
        big = float(df[big_idx]) if np.isfinite(masked[big_idx]) else -_DBL_MAX
        little_idx = int(np.argmin(df))
        little = float(df[little_idx])

        # duality gap stop: trans(alpha)*df - C*little < eps
        if _seq_dot(alpha, df) - C * little < eps:
            break

        old_alpha_big = float(alpha[big_idx])
        old_alpha_little = float(alpha[little_idx])

        quad_coef = float(
            Q[big_idx, big_idx] + Q[little_idx, little_idx]
            - 2.0 * Q[big_idx, little_idx]
        )
        if quad_coef <= tau:
            quad_coef = tau
        delta = (big - little) / quad_coef
        alpha[big_idx] -= delta
        alpha[little_idx] += delta

        if alpha[big_idx] < 0:
            alpha[big_idx] = 0.0
            alpha[little_idx] = old_alpha_big + old_alpha_little

        if (it % 300) == 299:
            df = np.add.accumulate(Q * alpha[None, :], axis=1)[:, -1] - b
        else:
            d_big = float(alpha[big_idx]) - old_alpha_big
            d_little = float(alpha[little_idx]) - old_alpha_little
            # df(k) += Q(big,k)*d_big + Q(little,k)*d_little — the two
            # products sum first, then add into df (one expression in C++)
            df += Q[big_idx, :] * d_big + Q[little_idx, :] * d_little
    else:
        return int(max_iter) + 1

    return it + 1


# ---------------------------------------------------------------------------
# oca_solve — optimization_oca.h:158-345 (oca_impl, no prior/nonnegative)
# ---------------------------------------------------------------------------


def oca_solve(
    problem,
    sub_eps: float = 1e-2,
    sub_max_iter: int = 50000,
    inactive_thresh: int = 20,
    trace: list | None = None,
) -> tuple[float, np.ndarray]:
    """Run the OCA cutting-plane loop; returns ``(objective, w)``.

    ``problem`` provides get_num_dimensions / get_c / risk_has_lower_bound
    / get_risk(w) -> (risk, subgradient) / optimization_status(...).
    ``trace``, when given, records (cur_obj, cur_obj-cp_obj, cur_risk,
    risk_gap, num_planes, counter) per iteration for trajectory tests.
    """
    num_dims = int(problem.get_num_dimensions())
    C = float(problem.get_c())

    planes: list[np.ndarray] = []
    bs: list[float] = []
    miss_count: list[float] = []

    w = np.zeros(num_dims, dtype=np.float64)
    cur_obj = _DBL_MAX
    cp_obj = 0.0
    K = np.zeros((0, 0), dtype=np.float64)

    lower = problem.risk_has_lower_bound()
    if lower is not None:
        bs.append(float(lower))
        planes.append(np.zeros(num_dims, dtype=np.float64))
        alpha = np.array([C], dtype=np.float64)
        miss_count.append(0.0)
        K = np.zeros((1, 1), dtype=np.float64)
    else:
        alpha = np.zeros(0, dtype=np.float64)

    counter = 0
    while True:
        cur_risk, new_plane = problem.get_risk(w)
        cur_risk = float(cur_risk)

        bs.append(cur_risk - _seq_dot(w, new_plane))
        planes.append(new_plane)
        miss_count.append(0.0)
        if alpha.size == 0:
            alpha = np.array([C], dtype=np.float64)
        else:
            alpha = np.append(alpha, 0.0)

        # wnorm = 0.5*trans(w)*w — the scalar scales each element BEFORE
        # the sequential product-sum (expression-template order)
        wnorm = _seq_dot(0.5 * w, w)
        cur_obj = (wnorm + C * cur_risk + 0.0) - 0.0

        risk_gap = cur_risk - (((cp_obj - wnorm) + 0.0) - 0.0) / C
        if trace is not None:
            trace.append(
                (cur_obj, cur_obj - cp_obj, cur_risk, risk_gap,
                 len(planes), counter)
            )
        if counter > 0 and problem.optimization_status(
            cur_obj, cur_obj - cp_obj, cur_risk, risk_gap, len(planes), counter
        ):
            break

        # grow the plane-Gram matrix K with the new row/column
        n = len(planes)
        K2 = np.zeros((n, n), dtype=np.float64)
        K2[: n - 1, : n - 1] = K
        last = planes[n - 1]
        for c in range(n):
            v = _seq_dot(planes[c], last)
            K2[c, n - 1] = v
            K2[n - 1, c] = v
        K = K2

        eps_sub = 0.1 * (cur_obj - cp_obj)
        if not (eps_sub < sub_eps):
            eps_sub = sub_eps
        if eps_sub < 1e-16:
            eps_sub = 1e-16
        solve_qp_using_smo(K, np.array(bs, dtype=np.float64), alpha,
                           eps_sub, sub_max_iter)

        # w = -alpha(0)*planes[0]; w -= alpha(i)*planes[i] in order.
        # out= buffers only reuse allocations — per-element order is the
        # C++ expression's exactly
        w = np.multiply(planes[0], -alpha[0])
        tmp = _DOT_SCRATCH.get(num_dims)
        if tmp is None:
            tmp = _DOT_SCRATCH[num_dims] = np.empty(num_dims, np.float64)
        for i in range(1, n):
            np.multiply(planes[i], alpha[i], out=tmp)
            np.subtract(w, tmp, out=w)

        for i in range(alpha.size):
            if alpha[i] != 0:
                miss_count[i] = 0.0
            else:
                miss_count[i] += 1.0

        cp_obj = _seq_dot(-0.5 * w, w) + _seq_dot(
            alpha, np.array(bs, dtype=np.float64)
        )

        # throw away planes that have been inactive for a while
        # (index_of_max keeps the first max, matching np.argmax)
        while max(miss_count) >= inactive_thresh:
            idx = int(np.argmax(np.array(miss_count)))
            del bs[idx]
            del miss_count[idx]
            K = np.delete(np.delete(K, idx, axis=0), idx, axis=1)
            alpha = np.delete(alpha, idx)
            del planes[idx]

        counter += 1

    return cur_obj, w


# ---------------------------------------------------------------------------
# MulticlassSvmProblem — svm_multiclass_linear_trainer.h:25-160 +
# structural_svm_problem.h:425-566 with max_cache_size = 0
# ---------------------------------------------------------------------------


class MulticlassSvmProblem:
    """The multiclass structural-SVM problem in its deterministic
    (sequential, unbuffered) shape.  Samples are sparse (idx, val) pairs;
    PSI(x, y) places ``[x, -1]`` in the ``y``-th block of a
    ``(dims+1)*K`` vector."""

    def __init__(
        self,
        samples: list,
        labels: list[int],
        distinct_labels: list[int],
        dims: int,
        C: float,
        eps: float = 0.001,
        max_iterations: int = 10000,
    ):
        self.samples = [_as_arrays(s) for s in samples]
        self.labels = list(labels)
        self.distinct = list(distinct_labels)
        self.dims = int(dims) + 1  # +1 for the bias slot
        self.K = len(self.distinct)
        self.C = float(C)
        self.eps = float(eps)
        self.max_iterations = int(max_iterations)
        # get_truth_joint_feature_vector finds the FIRST matching
        # distinct label (svm_multiclass_linear_trainer.h:84-92)
        self.label_idx = [self.distinct.index(l) for l in self.labels]
        # optimization_status state (structural_svm_problem.h:258-268):
        # skip_cache starts true, cache_based_eps = +inf, cache disabled
        self.skip_cache = True
        self.count_below_eps = 0
        self.converged = False
        self.cache_based_eps = float("inf")
        self.saved_current_risk_gap = 0.0
        self._psi_true: np.ndarray | None = None

    # -- oca_problem surface ------------------------------------------------

    def get_num_dimensions(self) -> int:
        return self.dims * self.K

    def get_c(self) -> float:
        return self.C

    def risk_has_lower_bound(self) -> float:
        return 0.0  # structural_svm_problem.h:417-423

    def optimization_status(
        self,
        current_objective_value: float,
        current_error_gap: float,
        current_risk_value: float,
        current_risk_gap: float,
        num_cutting_planes: int,
        num_iterations: int,
    ) -> bool:
        # structural_svm_problem.h:425-505 (verbose prints elided)
        if num_iterations >= self.max_iterations:
            return True
        self.saved_current_risk_gap = current_risk_gap

        def _cache_stop() -> bool:
            # std::max(a, b) == (a < b) ? b : a — with a = +inf and
            # b possibly nan (inf*0), NaN comparisons are false so the
            # result is a; Python's max(a, b) == b if b > a else a agrees
            thresh = max(self.cache_based_eps,
                         self.cache_based_eps * current_risk_value)
            return (current_risk_gap < thresh) or (current_risk_gap == 0)

        if self.converged:
            return _cache_stop()

        if current_risk_gap < self.eps:
            # the trainer sets max_cache_size = 0, so the
            # ``skip_cache || max_cache_size == 0`` guard is always taken
            # (structural_svm_problem.h:478-487)
            self.converged = True
            self.skip_cache = False
            return _cache_stop()
        self.count_below_eps = 0
        self.skip_cache = False
        return False

    # -- risk ---------------------------------------------------------------

    def _oracle(self, W2: np.ndarray, i: int) -> tuple[float, int]:
        """separation_oracle (svm_multiclass_linear_trainer.h:96-137):
        argmax over classes of LOSS + w_y·x - b_y with strict first-max."""
        idx, val = self.samples[i]
        if len(idx):
            # per-class sparse dot, sequential over the sample entries
            # (sparse_vector.h dot: temp += val * dense[idx] in order);
            # the row-wise accumulate keeps that exact order per class
            prods = W2[:, idx] * val
            dots = np.add.accumulate(prods, axis=1)[:, -1]
        else:
            dots = np.zeros(self.K, dtype=np.float64)
        scores = dots - W2[:, self.dims - 1]
        li = self.label_idx[i]
        # LOSS(idx, y): +1 for every wrong class, added before comparing;
        # the true class is never touched (x+1-1 != x bitwise)
        scores[:li] += 1.0
        scores[li + 1:] += 1.0
        best = int(np.argmax(scores))
        return (0.0 if best == li else 1.0), best

    def get_risk(self, w: np.ndarray) -> tuple[float, np.ndarray]:
        # structural_svm_problem.h:508-547
        num = len(self.samples)
        if self._psi_true is None:
            psi_true = np.zeros(self.dims * self.K, dtype=np.float64)
            for i, (idx, val) in enumerate(self.samples):
                off = self.dims * self.label_idx[i]
                # subtract_from(psi_true, psi): per entry in order, the
                # bias (-1 at block slot dims-1) appended last
                np.subtract.at(psi_true, idx + off, val)
                psi_true[off + self.dims - 1] -= -1.0
            self._psi_true = psi_true

        subgradient = self._psi_true.copy()
        total_loss = 0.0
        W2 = w.reshape(self.K, self.dims)
        for i in range(num):
            loss, best = self._oracle(W2, i)
            total_loss += loss
            idx, val = self.samples[i]
            off = self.dims * best
            np.add.at(subgradient, idx + off, val)
            subgradient[off + self.dims - 1] += -1.0

        # dlib ``matrix /= scalar`` is a reciprocal MULTIPLY
        # (matrix.h:723-731,1509-1515: *this = *this * (1/a)); the scalar
        # total_loss /= num is a true division
        subgradient *= 1.0 / num
        total_loss /= num
        risk = total_loss + _seq_dot(subgradient, w)
        return risk, subgradient


# ---------------------------------------------------------------------------
# svm_multiclass_linear_train — svm_multiclass_linear_trainer.h:315-410
# ---------------------------------------------------------------------------


def _max_index_plus_one(samples: list) -> int:
    m = 0
    for s in samples:
        idx, _ = _as_arrays(s)
        if len(idx):
            m = max(m, int(idx[-1]) + 1)
    return m


def svm_multiclass_linear_train(
    samples: list,
    labels: list[int],
    C: float = 1.0,
    eps: float = 0.001,
    max_iterations: int = 10000,
    trace: list | None = None,
    compact: bool = True,
) -> tuple[np.ndarray, np.ndarray, list[int], float]:
    """Train the multiclass linear SVM; returns
    ``(weights KxD, b K, sorted distinct labels, objective)``.

    ``compact=True`` (default) relabels the sparse feature indices onto
    their support before solving — BIT-IDENTICAL to the dense solve, 100x
    faster when features are hashed into a 500k space:

    - every sequential dot in the solver skips only positions where both
      operands are exactly zero; such products are +-0 and adding -0
      never changes a float64, while adding +0 only flips a -0 running
      sum to +0 — which can happen only while every kept product so far
      was -0, i.e. only for dots whose value is exactly zero, and a
      +-0-valued Gram entry provably never changes any comparison,
      alpha update, or weight bit downstream;
    - untouched weight positions come out of the dense solve as
      ``w_k = -alpha_0*(+0) - alpha_i*(+0)... == -0.0`` for every alpha
      (alpha is never negative), so the scatter back fills -0.0.

    The equivalence is golden-tested (tests/test_oca.py) and the default
    path is what the cross-engine differential pins against dlib."""
    if not samples or len(samples) != len(labels):
        raise ValueError("invalid multiclass training problem")
    arr = [_as_arrays(s) for s in samples]
    dims = _max_index_plus_one(arr)
    if compact:
        nonempty = [i for i, _ in arr if len(i)]
        support = (
            np.unique(np.concatenate(nonempty))
            if nonempty
            else np.empty(0, dtype=np.int64)
        )
        if len(support) < dims:
            remapped = [
                (np.searchsorted(support, i).astype(np.int64), v)
                for i, v in arr
            ]
            Wc, b, distinct, obj = svm_multiclass_linear_train(
                remapped, labels, C=C, eps=eps,
                max_iterations=max_iterations, trace=trace, compact=False,
            )
            W = np.full((len(distinct), dims), -0.0)
            W[:, support] = Wc
            return W, b, distinct, obj
    distinct = sorted(set(labels))  # std::set ascending
    problem = MulticlassSvmProblem(
        arr, labels, distinct, dims, C, eps, max_iterations
    )
    objective, w = oca_solve(problem, trace=trace)
    W = w.reshape(len(distinct), dims + 1)  # row-major, like dlib reshape
    return W[:, :dims].copy(), W[:, dims].copy(), distinct, float(objective)


def multiclass_predict(
    weights: np.ndarray,
    b: np.ndarray,
    labels: list[int],
    sample,
) -> tuple[int, float]:
    """function.h:781-813: strict first-max argmax of w_k·x - b_k; the
    sparse dot stops at the first index past the weight columns."""
    idx, val = _as_arrays(sample)
    k = int(np.searchsorted(idx, weights.shape[1]))
    if k:
        prods = weights[:, idx[:k]] * val[:k]
        dots = np.add.accumulate(prods, axis=1)[:, -1] - b
    else:
        dots = 0.0 - b
    best = int(np.argmax(dots))
    return labels[best], float(dots[best])


def test_multiclass_decision_function(
    weights: np.ndarray,
    b: np.ndarray,
    labels: list[int],
    x_test: list,
    y_test: list[int],
) -> np.ndarray:
    """cross_validate_multiclass_trainer.h:21-61: confusion-count matrix
    res[truth, pred]; test samples with unknown labels are skipped."""
    label_to_int = {l: i for i, l in enumerate(labels)}
    res = np.zeros((len(labels), len(labels)), dtype=np.float64)
    for x, y in zip(x_test, y_test):
        t = label_to_int.get(y)
        if t is None:
            continue
        pred, _ = multiclass_predict(weights, b, labels, x)
        res[t, label_to_int[pred]] += 1.0
    return res


# ---------------------------------------------------------------------------
# cross_validate_multiclass_trainer — cross_validate_multiclass_trainer.h
# :71-200 (deterministic rotating per-class folds, no RNG)
# ---------------------------------------------------------------------------


def cross_validate_multiclass_trainer(
    train_fn,
    x: list,
    y: list[int],
    folds: int,
) -> np.ndarray:
    """``train_fn(x_train, y_train) -> (weights, b, labels)``; returns the
    summed confusion matrix over the rotating fold splits."""
    if not (1 < folds <= len(x)):
        raise ValueError("invalid fold count")
    all_labels = sorted(set(y))
    label_counts: dict[int, int] = {}
    for lab in y:
        label_counts[lab] = label_counts.get(lab, 0) + 1

    num_in_test: dict[int, int] = {}
    num_in_train: dict[int, int] = {}
    for lab, cnt in label_counts.items():
        in_test = cnt // folds
        if in_test == 0:
            raise ValueError(
                "cross_validate_multiclass_trainer: more folds than "
                f"elements of class {lab}"
            )
        num_in_test[lab] = in_test
        num_in_train[lab] = cnt - in_test

    res = np.zeros((len(all_labels), len(all_labels)), dtype=np.float64)
    next_test_idx = {lab: 0 for lab in all_labels}
    n = len(x)

    for _ in range(folds):
        x_test: list = []
        y_test: list[int] = []
        x_train: list = []
        y_train: list[int] = []

        for lab in all_labels:
            nxt = next_test_idx[lab]
            cur = 0
            while cur < num_in_test[lab]:
                if y[nxt] == lab:
                    x_test.append(x[nxt])
                    y_test.append(lab)
                    cur += 1
                nxt = (nxt + 1) % n
            next_test_idx[lab] = nxt

        for lab in all_labels:
            nxt = next_test_idx[lab]
            cur = 0
            while cur < num_in_train[lab]:
                if y[nxt] == lab:
                    x_train.append(x[nxt])
                    y_train.append(lab)
                    cur += 1
                nxt = (nxt + 1) % n

        weights, b, labels = train_fn(x_train, y_train)
        res += test_multiclass_decision_function(
            weights, b, labels, x_test, y_test
        )

    return res


# ---------------------------------------------------------------------------
# F-beta objective + the find_max_single_variable C search
# (ner_trainer.cpp:281-405, text_categorizer_trainer.cpp:144-270)
# ---------------------------------------------------------------------------


def compute_fscore(res: np.ndarray, num_labels: int, beta: float) -> float:
    """ner_trainer.cpp:312-329: F-beta over the confusion matrix, treating
    classes >= num_labels as the not-entity bucket ignored for
    precision's numerator."""
    correct = float(np.sum(np.diag(res[:num_labels, :num_labels])))
    total_pred = float(np.sum(res[:, :num_labels]))
    total_truth = float(np.sum(res[:num_labels, :]))
    precision = correct / total_pred
    recall = correct / total_truth
    return (1 + beta * beta) * precision * recall / (
        beta * beta * precision + recall
    )


def count_of_least_common_label(labels: list[int]) -> int:
    """ner_trainer.cpp:343-358."""
    counts: dict[int, int] = {}
    for lab in labels:
        counts[lab] = counts.get(lab, 0) + 1
    return min(counts.values())


def tune_multiclass_C(
    samples: list,
    labels: list[int],
    beta: float,
    num_labels: int,
    max_iterations: int = 2000,
    evals: list | None = None,
) -> float:
    """The shared C search both MITIE trainers run
    (ner_trainer.cpp:375-397, text_categorizer_trainer.cpp:251-268):
    maximize the 2-fold CV F-beta with find_max_single_variable from
    C0=300 on [0.01, 5000], eps=1, 100 iterations, initial search radius
    100; fall back to C=300 if the line search fails.  The CV objective
    trainer uses the DEFAULT epsilon 0.001 (only the final train uses
    1e-4 — ner_trainer.cpp:299-304 never calls set_epsilon)."""
    from .bobyqa import OptimizeSingleVariableFailure, find_max_single_variable

    def obj(C: float) -> float:
        def train_fn(x_train, y_train):
            w, b, labs, _ = svm_multiclass_linear_train(
                x_train, y_train, C=C, eps=0.001,
                max_iterations=max_iterations,
            )
            return w, b, labs

        res = cross_validate_multiclass_trainer(train_fn, samples, labels, 2)
        score = compute_fscore(res, num_labels, beta)
        if evals is not None:
            evals.append((float(C), float(score)))
        return score

    try:
        C, _ = find_max_single_variable(
            obj, 300.0, 0.01, 5000.0, 1.0, 100, 100.0
        )
        return float(C)
    except OptimizeSingleVariableFailure:
        return 300.0
