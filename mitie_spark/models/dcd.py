"""Bit-exact behavioral port of dlib's linear dual-coordinate-descent SVM
trainer and the support utilities MITIE's relation-detector trainer drives
it with (Hsieh et al., "A Dual Coordinate Descent Method for Large-scale
Linear SVM", ICML 2008 — public algorithm; dlib implementation studied at
/root/reference/dlib/dlib/svm/svm_c_linear_dcd_trainer.h).

Everything here is float64 with the reference's exact operation order, so
training on the same samples yields the SAME decision function as the
compiled reference — verified in tests/test_cross_engine.py both for the
untuned path and for the full BOBYQA-tuned flow.

Ported pieces (reference file:line):

- ``DlibRand`` — dlib::rand (rand/rand_kernel_1.h:36-48,235-249): the
  boost-derived MT19937 (rand/mersenne_twister.h:203-204, standard
  parameters, MT2002 single-seed init, default seed 5489) primed by
  discarding 10000 draws at construction.
- ``randomize_samples`` — svm/svm.h:995-1023: end-first Fisher-Yates with
  ``get_random_32bit_number() % (n+1)``.
- ``svm_c_linear_dcd_train`` — svm/svm_c_linear_dcd_trainer.h:468-635:
  the shrinking DCD loop (eps=0.1, max_iterations=10000, have_bias=true —
  MITIE leaves every knob at its default,
  mitielib/src/binary_relation_detector_trainer.cpp:226-232).
- ``test_binary_decision_function`` — svm/svm.h:107-158.
- ``cross_validate_trainer`` — svm/svm_threaded.h:87-238: per-class
  rotating contiguous folds; the thread pool only schedules — results are
  summed in fold order, so values are thread-count-independent.
- ``brdt_train`` — the full binary_relation_detector_trainer::train()
  flow (binary_relation_detector_trainer.cpp:176-238): shuffle, log-space
  2-D BOBYQA C search over the 6-fold-CV F-beta objective (skipped, like
  the reference, when positives <= folds), the (folds-1)/folds rescale,
  and the final full-data train.

Scale note: MITIE's trainer is driver-side by design (the sample list
lives in the trainer object); Spark-side distribution happens upstream in
candidate-pair generation (queries_kg.adjacent_pair_candidates) and
downstream in detection (operators/extraction.py) — training itself is a
small dense solve that must be bit-reproducible, not distributed.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "DlibRand",
    "randomize_samples",
    "svm_c_linear_dcd_train",
    "test_binary_decision_function",
    "cross_validate_trainer",
    "brdt_train",
]

# ---------------------------------------------------------------------------
# dlib::rand — MT19937 + 10000-draw priming
# ---------------------------------------------------------------------------

_U32 = np.uint32
_MT_A = _U32(0x9908B0DF)
_UPPER = _U32(0x80000000)
_LOWER = _U32(0x7FFFFFFF)


def _mt_twist(x: np.ndarray) -> None:
    """In-place MT19937 state twist (mersenne_twister.h:141-168).

    The slice order reproduces the sequential in-place semantics: element
    k's recurrence reads x[k] (old), x[k+1] (old for k<623, NEW x'[0] for
    k=623) and x[(k+m) mod n] (new when (k+m) mod n < k).  Each numpy
    assignment's RHS is materialized first, which equals "old value" for
    the overlapping x[k+1] reads, and the three-way split makes every
    x[(k+m) mod n] read land on an already-updated slice.
    """
    zero = _U32(0)
    y = (x[0:227] & _UPPER) | (x[1:228] & _LOWER)
    x[0:227] = x[397:624] ^ (y >> 1) ^ np.where(y & 1, _MT_A, zero)
    y = (x[227:454] & _UPPER) | (x[228:455] & _LOWER)
    x[227:454] = x[0:227] ^ (y >> 1) ^ np.where(y & 1, _MT_A, zero)
    y = (x[454:623] & _UPPER) | (x[455:624] & _LOWER)
    x[454:623] = x[227:396] ^ (y >> 1) ^ np.where(y & 1, _MT_A, zero)
    y = (x[623] & _UPPER) | (x[0] & _LOWER)
    x[623] = x[396] ^ (y >> 1) ^ (_MT_A if y & 1 else zero)


def _mt_temper(x: np.ndarray) -> np.ndarray:
    """Standard MT19937 output tempering (mersenne_twister.h:186-196)."""
    z = x.copy()
    z ^= z >> 11
    z ^= (z << 7) & _U32(0x9D2C5680)
    z ^= (z << 15) & _U32(0xEFC60000)
    z ^= z >> 18
    return z


class DlibRand:
    """dlib::rand (rand_kernel_1.h): default-seeded MT19937 with the first
    10000 draws discarded.  A string seed folds bytes as ``s = s*37 + c``
    with SIGNED char ``c`` (rand_kernel_1.h:84-88; chars >= 0x80
    sign-extend on x86 — same convention as the feature-hashing ports)."""

    __slots__ = ("_state", "_buf", "_pos")

    def __init__(self, seed: str = "") -> None:
        if seed:
            s = 0
            for ch in seed.encode("utf-8"):
                c = ch - 256 if ch >= 128 else ch  # signed char
                s = (s * 37 + c) & 0xFFFFFFFF
        else:
            s = 5489
        state = np.empty(624, dtype=np.uint64)
        state[0] = s
        prev = s
        for i in range(1, 624):
            prev = (1812433253 * (prev ^ (prev >> 30)) + i) & 0xFFFFFFFF
            state[i] = prev
        self._state = state.astype(np.uint32)
        self._refill()
        # prime the generator a bit (rand_kernel_1.h:237-239)
        self.skip(10000)

    def _refill(self) -> None:
        _mt_twist(self._state)
        self._buf = _mt_temper(self._state)
        self._pos = 0

    def skip(self, n: int) -> None:
        while n > 0:
            avail = 624 - self._pos
            if n < avail:
                self._pos += n
                return
            n -= avail
            self._refill()

    def get_random_32bit_number(self) -> int:
        if self._pos == 624:
            self._refill()
        v = int(self._buf[self._pos])
        self._pos += 1
        return v


# ---------------------------------------------------------------------------
# sample plumbing
# ---------------------------------------------------------------------------


def _as_arrays(sample) -> tuple[np.ndarray, np.ndarray]:
    """A sparse sample as (sorted index array, value array).  Accepts the
    repo-wide pair-list form (models/relation_ref.reference_relation_pairs)
    or an already-converted tuple."""
    if isinstance(sample, tuple) and len(sample) == 2 and isinstance(
        sample[0], np.ndarray
    ):
        return sample
    idx = np.fromiter((p[0] for p in sample), dtype=np.intp, count=len(sample))
    val = np.fromiter((p[1] for p in sample), dtype=np.float64, count=len(sample))
    return idx, val


def _seq_sum(a: np.ndarray) -> float:
    """Strictly left-to-right float64 accumulation — the order every dlib
    sparse sum uses (sparse_vector.h:225-276,334-360).  np.add.accumulate
    is sequential; np.sum's pairwise tree is one ulp off."""
    return float(np.add.accumulate(a)[-1]) if len(a) else 0.0


def _score(w: np.ndarray, b: float, idx: np.ndarray, val: np.ndarray) -> float:
    """decision_function value: dot(w, x) - b, stopping at the first index
    past w's length like dlib's sparse dot (sparse_vector.h:351-356 — the
    iterator walk breaks at ``ai->first >= b.size()``; indices are
    sorted, so that's a prefix)."""
    k = int(np.searchsorted(idx, len(w)))
    return _seq_sum(val[:k] * w[idx[:k]]) - b


# ---------------------------------------------------------------------------
# randomize_samples
# ---------------------------------------------------------------------------


def randomize_samples(samples: list, labels: list, rnd: DlibRand | None = None):
    """In-place end-first Fisher-Yates over (samples, labels) with a fresh
    default-seeded dlib::rand — svm/svm.h:995-1032 (the 2-arg overload
    constructs ``rand r`` itself)."""
    if rnd is None:
        rnd = DlibRand()
    n = len(samples) - 1
    while n > 0:
        idx = rnd.get_random_32bit_number() % (n + 1)
        samples[idx], samples[n] = samples[n], samples[idx]
        labels[idx], labels[n] = labels[n], labels[idx]
        n -= 1


# ---------------------------------------------------------------------------
# the DCD solver
# ---------------------------------------------------------------------------


def svm_c_linear_dcd_train(
    samples: list,
    labels,
    Cpos: float,
    Cneg: float,
    eps: float = 0.1,
    max_iterations: int = 10000,
    have_bias: bool = True,
    do_shrinking: bool = True,
) -> tuple[np.ndarray, float]:
    """svm_c_linear_dcd_trainer::do_train
    (svm_c_linear_dcd_trainer.h:468-635) → dense ``(w, b)`` with decision
    value ``dot(w, x) - b``.

    ``last_weight_1`` is not ported — MITIE never sets it.  The returned
    ``w`` has length max_index_plus_one(samples); ``b`` is the trailing
    bias weight (df.b = w(w.size()-1), h:621-624)."""
    arrs = [_as_arrays(s) for s in samples]
    y = [float(v) for v in labels]
    n = len(arrs)
    # optimizer_state::init (h:224-344)
    dims = 0
    for idx, _ in arrs:
        if len(idx):
            dims = max(dims, int(idx[-1]) + 1)
    alpha = [0.0] * n
    w = np.zeros(dims + 1 if have_bias else dims, dtype=np.float64)
    Q = []
    index = []
    for i, (idx, val) in enumerate(arrs):
        q = _seq_sum(val * val)  # dlib::dot(x,x): sequential v*v
        if have_bias:
            index.append(i)
            q += 1
        elif q != 0:
            index.append(i)
        Q.append(q)

    rnd = DlibRand()
    active_size = len(index)
    inf = float("inf")
    PG_max_prev = inf
    PG_min_prev = -inf
    w_last = len(w) - 1  # bias slot when have_bias

    for _ in range(max_iterations):
        PG_max = -inf
        PG_min = inf

        # randomly shuffle the indices (h:511-517) — one draw per slot,
        # including the final modulo-1 draw
        for i in range(active_size):
            j = i + rnd.get_random_32bit_number() % (active_size - i)
            index[i], index[j] = index[j], index[i]

        ii = 0
        while ii < active_size:
            i = index[ii]
            idx, val = arrs[i]
            yi = y[i]
            if have_bias:
                G = yi * (_seq_sum(val * w[idx]) - w[w_last]) - 1
            else:
                G = yi * _seq_sum(val * w[idx]) - 1
            C = Cpos if yi > 0 else Cneg

            PG = 0.0
            if alpha[i] == 0:
                if G > PG_max_prev:
                    active_size -= 1
                    index[ii], index[active_size] = (
                        index[active_size],
                        index[ii],
                    )
                    continue  # re-run this slot (C++ --ii; continue)
                if G < 0:
                    PG = G
            elif alpha[i] == C:
                if G < PG_min_prev:
                    active_size -= 1
                    index[ii], index[active_size] = (
                        index[active_size],
                        index[ii],
                    )
                    continue
                if G > 0:
                    PG = G
            else:
                PG = G

            if PG > PG_max:
                PG_max = PG
            if PG < PG_min:
                PG_min = PG

            if abs(PG) > 1e-12:
                alpha_old = alpha[i]
                alpha[i] = min(max(alpha[i] - G / Q[i], 0.0), C)
                delta = (alpha[i] - alpha_old) * yi
                w[idx] += delta * val
                if have_bias:
                    w[w_last] -= delta
            ii += 1

        if PG_max - PG_min <= eps:
            if active_size == len(index):
                break
            # one final unshrunk sweep before accepting convergence
            active_size = len(index)
            PG_max_prev = inf
            PG_min_prev = -inf
        elif do_shrinking:
            PG_max_prev = PG_max
            PG_min_prev = PG_min
            if PG_max_prev <= 0:
                PG_max_prev = inf
            if PG_min_prev >= 0:
                PG_min_prev = -inf

    if have_bias:
        return w[:dims].copy(), float(w[dims])
    return w, 0.0


# ---------------------------------------------------------------------------
# CV harness (exact fold composition) + the accuracy metric it averages
# ---------------------------------------------------------------------------


def test_binary_decision_function(
    w: np.ndarray, b: float, samples: list, labels
) -> tuple[float, float]:
    """svm/svm.h:107-158 → (pos accuracy, neg accuracy); a decision value
    >= 0 counts the positive class, < 0 the negative."""
    num_pos = num_neg = pos_ok = neg_ok = 0
    for s, yv in zip(samples, labels):
        idx, val = _as_arrays(s)
        d = _score(w, b, idx, val)
        if yv == 1.0:
            num_pos += 1
            if d >= 0:
                pos_ok += 1
        else:
            num_neg += 1
            if d < 0:
                neg_ok += 1
    return pos_ok / num_pos, neg_ok / num_neg


def cross_validate_trainer(
    samples: list,
    labels,
    folds: int,
    Cpos: float,
    Cneg: float,
) -> tuple[float, float]:
    """cross_validate_trainer_threaded_impl (svm_threaded.h:87-238):
    per-class test blocks rotate contiguously through the (already
    shuffled) sample order with modulo wrap; train = the samples following
    the test block, per class.  Results sum in fold order — bit-identical
    at any thread count — then divide by ``folds``."""
    y = [float(v) for v in labels]
    total = len(y)
    num_pos = sum(1 for v in y if v == 1.0)
    num_neg = total - num_pos
    n_pos_test = num_pos // folds
    n_pos_train = num_pos - n_pos_test
    n_neg_test = num_neg // folds
    n_neg_train = num_neg - n_neg_test

    pos_idx = 0
    neg_idx = 0
    res0 = 0.0
    res1 = 0.0
    for _ in range(folds):
        x_test: list[int] = []
        while len(x_test) < n_pos_test:
            if y[pos_idx] == 1.0:
                x_test.append(pos_idx)
            pos_idx = (pos_idx + 1) % total
        while len(x_test) < n_pos_test + n_neg_test:
            if y[neg_idx] == -1.0:
                x_test.append(neg_idx)
            neg_idx = (neg_idx + 1) % total

        x_train: list[int] = []
        tp, tn = pos_idx, neg_idx
        while len(x_train) < n_pos_train:
            if y[tp] == 1.0:
                x_train.append(tp)
            tp = (tp + 1) % total
        while len(x_train) < n_pos_train + n_neg_train:
            if y[tn] == -1.0:
                x_train.append(tn)
            tn = (tn + 1) % total

        w, b = svm_c_linear_dcd_train(
            [samples[i] for i in x_train],
            [y[i] for i in x_train],
            Cpos,
            Cneg,
        )
        r0, r1 = test_binary_decision_function(
            w, b, [samples[i] for i in x_test], [y[i] for i in x_test]
        )
        res0 += r0
        res1 += r1
    return res0 / folds, res1 / folds


# ---------------------------------------------------------------------------
# the MITIE relation-trainer flow
# ---------------------------------------------------------------------------


def brdt_train(
    samples: list,
    labels: list,
    num_pos: int,
    beta: float = 0.1,
    auto_tune: bool = True,
    C_override: tuple[float, float] | None = None,
) -> tuple[np.ndarray, float, tuple[float, float]]:
    """binary_relation_detector_trainer::train
    (binary_relation_detector_trainer.cpp:176-238) minus feature
    extraction: shuffles (samples, labels) IN PLACE with the default
    dlib::rand, searches (C1, C2) in log space with the ported BOBYQA over
    the 6-fold-CV F-beta objective — exactly like the reference, only when
    ``num_pos > cv_folds`` — rescales by (folds-1)/folds, trains on the
    full set.  Returns (w, b, (C1, C2)).

    ``auto_tune=False`` keeps the reference's untuned default C = the
    rescaled 5000/n (what the C++ produces for small datasets); the
    reference has no such switch — it is this API's documented cost
    opt-out (api.binary_relation_detector_trainer).  ``C_override`` pins
    (C1, C2) directly, skipping both the search and the rescale."""
    arrs = [_as_arrays(s) for s in samples]
    labels = list(labels)
    randomize_samples(arrs, labels)
    n = len(arrs)
    cv_folds = 6

    if C_override is not None:
        c1, c2 = float(C_override[0]), float(C_override[1])
    else:
        # log-space search box (cpp:199-216); math.* routes through the
        # same libm as the compiled reference, keeping exp/log bit-equal
        p0 = math.log(5000.0 / n)
        params = [p0, p0]
        if auto_tune and num_pos > cv_folds:
            from mitie_spark.models.bobyqa import find_max_bobyqa

            lo = math.log(1.0 / n)
            hi = math.log(100000.0 / n)
            rho_begin = (hi - lo) * 0.15
            rho_end = math.log(1.2 / n) - math.log(1.0 / n)

            def obj(p):
                r0, r1 = cross_validate_trainer(
                    arrs, labels, cv_folds, math.exp(p[0]), math.exp(p[1])
                )
                # F-beta from the two class accuracies (cpp:162); plain
                # float math so a 0/0 degenerate fold yields the same NaN
                # the C++ does
                return (1 + beta * beta) * r0 * r1 / (beta * beta * r1 + r0)

            params, _ = find_max_bobyqa(
                obj, params, 2 * 2 + 1, [lo, lo], [hi, hi], rho_begin,
                rho_end, 200,
            )
        scale = (cv_folds - 1.0) / cv_folds
        c1 = math.exp(float(params[0])) * scale
        c2 = math.exp(float(params[1])) * scale

    w, b = svm_c_linear_dcd_train(arrs, labels, c1, c2)
    return w, b, (c1, c2)
