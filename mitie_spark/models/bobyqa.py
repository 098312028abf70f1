"""BOBYQA — Powell's bound-constrained derivative-free optimizer.

Original-prose Python port of the implementation shipped with the
reference (dlib/dlib/optimization/optimization_bobyqa.h:1-3421, itself an
f2c translation of M.J.D. Powell's 2009 Fortran; the algorithm is
published: "The BOBYQA algorithm for bound constrained optimization
without derivatives", Powell 2009).  The reference's trainers tune their
hyperparameters through this exact optimizer:

- ner_trainer.cpp:552  ``find_max_bobyqa(obj, params, 2n+1,
  (0.1, 10), (100, 100), 15, 1, 100)`` over (C, loss*10) maximizing
  2-fold CV recall of the sequence segmenter, and
- binary_relation_detector_trainer.cpp:217 over log-space
  (C_pos, C_neg) maximizing 6-fold CV F(beta).

"Train here == train there" therefore needs Powell's *iterate
trajectory*, not just the objective/bounds — a different derivative-free
search lands on different tuned hyperparameters.  This port preserves
the f2c operation order line-for-line in float64 (every scalar
accumulation, min/max chain and truncating integer cast), so the sequence
of points at which the objective is evaluated — and hence the tuned
parameters — are BIT-IDENTICAL to the compiled reference.  Verified by
tests/test_cross_engine.py::test_bobyqa_* against a probe binary built
from the reference header (full evaluation streams compared as hex
doubles), and end-to-end by reproducing the compiled C++ ner_trainer's
tuned (best C, best loss) on the tiny fixture.

Implementation notes (all deliberate, all fidelity-bearing):

- Fortran 1-based indexing is kept by allocating ``size+1`` buffers and
  ignoring slot 0; 2-D arrays are indexed ``[k, j]`` where the reference
  computes ``k + j*dim`` on a shifted pointer.
- Plain Python floats ARE IEEE float64 and CPython evaluates expressions
  in source order with no FMA contraction — the same contract the
  reference binary has under ``g++ -O3`` on x86-64 (SSE2, no -mfma), per
  the repo's cross-engine conventions (CLAUDE.md).
- Scalar loops, never vectorized reductions: NumPy pairwise summation
  would change association and drift the last ulp (same rule as
  ner_model.dlib_f32_mean).
- f2c's ``goto`` graphs are preserved as label-dispatch ``while`` loops;
  each ``label == N`` block is the statement region that follows ``LN:``
  in the reference, cited per block.
"""

from __future__ import annotations

import math

__all__ = [
    "BobyqaFailure",
    "OptimizeSingleVariableFailure",
    "find_min_bobyqa",
    "find_max_bobyqa",
    "find_min_single_variable",
    "find_max_single_variable",
]


class BobyqaFailure(Exception):
    """Mirrors dlib::bobyqa_failure (optimization_bobyqa.h:31-33).

    The reference trainers catch this and fall back to their default
    hyperparameters (ner_trainer.cpp:555-560)."""


def _zeros(n: int) -> list[float]:
    return [0.0] * n


def _zeros2(r: int, c: int) -> list[list[float]]:
    return [[0.0] * c for _ in range(r)]


# ---------------------------------------------------------------------------
# update_ — rank-2 update of the inverse-interpolation matrices
# (optimization_bobyqa.h:3204-3335)
# ---------------------------------------------------------------------------


def _update(n, npt, bmat, zmat, ndim, vlag, beta, denom, knew, w):
    nptm = npt - n - 1
    ztest = 0.0
    for k in range(1, npt + 1):
        for j in range(1, nptm + 1):
            ztest = max(ztest, abs(zmat[k][j]))
    ztest *= 1e-20

    # rotations that zero the KNEW-th row of ZMAT (h:3268-3290)
    for j in range(2, nptm + 1):
        if abs(zmat[knew][j]) > ztest:
            temp = math.sqrt(zmat[knew][1] * zmat[knew][1] + zmat[knew][j] * zmat[knew][j])
            tempa = zmat[knew][1] / temp
            tempb = zmat[knew][j] / temp
            for i in range(1, npt + 1):
                temp = tempa * zmat[i][1] + tempb * zmat[i][j]
                zmat[i][j] = tempa * zmat[i][j] - tempb * zmat[i][1]
                zmat[i][1] = temp
        zmat[knew][j] = 0.0

    # first NPT components of the KNEW-th column of HLAG (h:3295-3302)
    for i in range(1, npt + 1):
        w[i] = zmat[knew][1] * zmat[i][1]
    alpha = w[knew]
    tau = vlag[knew]
    vlag[knew] -= 1.0

    # complete the updating of ZMAT (h:3306-3314)
    temp = math.sqrt(denom)
    tempb = zmat[knew][1] / temp
    tempa = tau / temp
    for i in range(1, npt + 1):
        zmat[i][1] = tempa * zmat[i][1] - tempb * vlag[i]

    # finally update BMAT (h:3318-3334)
    for j in range(1, n + 1):
        jp = npt + j
        w[jp] = bmat[knew][j]
        tempa = (alpha * vlag[jp] - tau * w[jp]) / denom
        tempb = (-beta * w[jp] - tau * vlag[jp]) / denom
        for i in range(1, jp + 1):
            bmat[i][j] = bmat[i][j] + tempa * vlag[i] + tempb * w[i]
            if i > npt:
                bmat[jp][i - npt] = bmat[i][j]


# ---------------------------------------------------------------------------
# altmov_ — alternative-step selection (optimization_bobyqa.h:1328-1761)
# ---------------------------------------------------------------------------


def _altmov(n, npt, xpt, xopt, bmat, zmat, ndim, sl, su, kopt, knew, adelt,
            xnew, xalt):
    """Returns (alpha, cauchy); fills xnew/xalt in place (1-based)."""
    glag = _zeros(n + 1)
    hcol = _zeros(npt + 1)
    w = _zeros(2 * n + 1)

    const_ = 1.0 + math.sqrt(2.0)
    for k in range(1, npt + 1):
        hcol[k] = 0.0
    for j in range(1, npt - n - 1 + 1):
        temp = zmat[knew][j]
        for k in range(1, npt + 1):
            hcol[k] += temp * zmat[k][j]
    alpha = hcol[knew]
    ha = 0.5 * alpha

    # gradient of the KNEW-th Lagrange function at XOPT (h:1445-1464)
    for i in range(1, n + 1):
        glag[i] = bmat[knew][i]
    for k in range(1, npt + 1):
        temp = 0.0
        for j in range(1, n + 1):
            temp += xpt[k][j] * xopt[j]
        temp = hcol[k] * temp
        for i in range(1, n + 1):
            glag[i] += temp * xpt[k][i]

    # line search through XOPT and each other point (h:1472-1584)
    presav = 0.0
    ksav = 0
    stpsav = 0.0
    ibdsav = 0
    for k in range(1, npt + 1):
        if k == kopt:
            continue
        dderiv = 0.0
        distsq = 0.0
        for i in range(1, n + 1):
            temp = xpt[k][i] - xopt[i]
            dderiv += glag[i] * temp
            distsq += temp * temp
        subd = adelt / math.sqrt(distsq)
        slbd = -subd
        ilbd = 0
        iubd = 0
        sumin = min(1.0, subd)

        for i in range(1, n + 1):
            temp = xpt[k][i] - xopt[i]
            if temp > 0.0:
                if slbd * temp < sl[i] - xopt[i]:
                    slbd = (sl[i] - xopt[i]) / temp
                    ilbd = -i
                if subd * temp > su[i] - xopt[i]:
                    subd = max(sumin, (su[i] - xopt[i]) / temp)
                    iubd = i
            elif temp < 0.0:
                if slbd * temp > su[i] - xopt[i]:
                    slbd = (su[i] - xopt[i]) / temp
                    ilbd = i
                if subd * temp < sl[i] - xopt[i]:
                    subd = max(sumin, (sl[i] - xopt[i]) / temp)
                    iubd = -i

        if k == knew:
            diff = dderiv - 1.0
            step = slbd
            vlag = slbd * (dderiv - slbd * diff)
            isbd = ilbd
            temp = subd * (dderiv - subd * diff)
            if abs(temp) > abs(vlag):
                step = subd
                vlag = temp
                isbd = iubd
            tempd = 0.5 * dderiv
            tempa = tempd - diff * slbd
            tempb = tempd - diff * subd
            if tempa * tempb < 0.0:
                temp = tempd * tempd / diff
                if abs(temp) > abs(vlag):
                    step = tempd / diff
                    vlag = temp
                    isbd = 0
        else:
            step = slbd
            vlag = slbd * (1.0 - slbd)
            isbd = ilbd
            temp = subd * (1.0 - subd)
            if abs(temp) > abs(vlag):
                step = subd
                vlag = temp
                isbd = iubd
            if subd > 0.5:
                if abs(vlag) < 0.25:
                    step = 0.5
                    vlag = 0.25
                    isbd = 0
            vlag *= dderiv

        temp = step * (1.0 - step) * distsq
        predsq = vlag * vlag * (vlag * vlag + ha * temp * temp)
        if predsq > presav:
            presav = predsq
            ksav = k
            stpsav = step
            ibdsav = isbd

    # construct XNEW honoring the bounds exactly (h:1588-1603)
    for i in range(1, n + 1):
        temp = xopt[i] + stpsav * (xpt[ksav][i] - xopt[i])
        xnew[i] = max(sl[i], min(su[i], temp))
    if ibdsav < 0:
        xnew[-ibdsav] = sl[-ibdsav]
    if ibdsav > 0:
        xnew[ibdsav] = su[ibdsav]

    # constrained Cauchy step, both gradient signs (h:1609-1758)
    bigstp = adelt + adelt
    iflag = 0
    cauchy = 0.0
    csave = 0.0
    while True:  # L100
        wfixsq = 0.0
        ggfree = 0.0
        for i in range(1, n + 1):
            w[i] = 0.0
            tempa = min(xopt[i] - sl[i], glag[i])
            tempb = max(xopt[i] - su[i], glag[i])
            if tempa > 0.0 or tempb < 0.0:
                w[i] = bigstp
                ggfree += glag[i] * glag[i]
        if ggfree == 0.0:
            cauchy = 0.0
            return alpha, cauchy  # L200

        # investigate whether more components of W can be fixed (L120)
        step = 0.0
        while True:
            temp = adelt * adelt - wfixsq
            if temp > 0.0:
                wsqsav = wfixsq
                step = math.sqrt(temp / ggfree)
                ggfree = 0.0
                for i in range(1, n + 1):
                    if w[i] == bigstp:
                        temp = xopt[i] - step * glag[i]
                        if temp <= sl[i]:
                            w[i] = sl[i] - xopt[i]
                            wfixsq += w[i] * w[i]
                        elif temp >= su[i]:
                            w[i] = su[i] - xopt[i]
                            wfixsq += w[i] * w[i]
                        else:
                            ggfree += glag[i] * glag[i]
                if wfixsq > wsqsav and ggfree > 0.0:
                    continue
            break

        # remaining free components of W and all of XALT (h:1674-1693)
        gw = 0.0
        for i in range(1, n + 1):
            if w[i] == bigstp:
                w[i] = -step * glag[i]
                xalt[i] = max(sl[i], min(su[i], xopt[i] + w[i]))
            elif w[i] == 0.0:
                xalt[i] = xopt[i]
            elif glag[i] > 0.0:
                xalt[i] = sl[i]
            else:
                xalt[i] = su[i]
            gw += glag[i] * w[i]

        # curvature along W; optional rescale (h:1700-1734)
        curv = 0.0
        for k in range(1, npt + 1):
            temp = 0.0
            for j in range(1, n + 1):
                temp += xpt[k][j] * w[j]
            curv += hcol[k] * temp * temp
        if iflag == 1:
            curv = -curv
        if curv > -gw and curv < -const_ * gw:
            scale = -gw / curv
            for i in range(1, n + 1):
                temp = xopt[i] + scale * w[i]
                xalt[i] = max(sl[i], min(su[i], temp))
            cauchy = (0.5 * gw * scale) ** 2
        else:
            cauchy = (gw + 0.5 * curv) ** 2

        if iflag == 0:
            for i in range(1, n + 1):
                glag[i] = -glag[i]
                w[n + i] = xalt[i]
            csave = cauchy
            iflag = 1
            continue  # back to L100
        break
    if csave > cauchy:
        for i in range(1, n + 1):
            xalt[i] = w[n + i]
        cauchy = csave
    return alpha, cauchy


# ---------------------------------------------------------------------------
# trsbox_ — truncated-CG trust-region step with bounds
# (optimization_bobyqa.h:2637-3200)
# ---------------------------------------------------------------------------


def _trsbox(n, npt, xpt, xopt, gopt, hq, pq, sl, su, delta, xnew, d, gnew):
    """Returns (dsq, crvmin); fills xnew/d/gnew in place (1-based)."""
    xbdi = _zeros(n + 1)
    s = _zeros(n + 1)
    hs = _zeros(n + 1)
    hred = _zeros(n + 1)

    iterc = 0
    nact = 0
    for i in range(1, n + 1):
        xbdi[i] = 0.0
        if xopt[i] <= sl[i]:
            if gopt[i] >= 0.0:
                xbdi[i] = -1.0
        elif xopt[i] >= su[i]:
            if gopt[i] <= 0.0:
                xbdi[i] = 1.0
        if xbdi[i] != 0.0:
            nact += 1
        d[i] = 0.0
        gnew[i] = gopt[i]
    delsq = delta * delta
    qred = 0.0
    crvmin = -1.0

    beta = 0.0
    gredsq = 0.0
    itermax = 0
    itcsav = 0
    stepsq = 0.0
    blen = 0.0
    stplen = 0.0
    iact = 0
    dredsq = 0.0
    dredg = 0.0
    sredg = 0.0
    angbd = 0.0
    xsav = 0.0
    iu = 0
    isav = 0
    angt = 0.0
    ggsav = 0.0
    rdprev = 0.0
    rdnext = 0.0

    label = 20
    while True:
        if label == 20:
            beta = 0.0
            label = 30
        elif label == 30:
            stepsq = 0.0
            for i in range(1, n + 1):
                if xbdi[i] != 0.0:
                    s[i] = 0.0
                elif beta == 0.0:
                    s[i] = -gnew[i]
                else:
                    s[i] = beta * s[i] - gnew[i]
                stepsq += s[i] * s[i]
            if stepsq == 0.0:
                label = 190
                continue
            if beta == 0.0:
                gredsq = stepsq
                itermax = iterc + n - nact
            if gredsq * delsq <= qred * 1e-4 * qred:
                label = 190
                continue
            label = 210
        elif label == 50:
            resid = delsq
            ds = 0.0
            shs = 0.0
            for i in range(1, n + 1):
                if xbdi[i] == 0.0:
                    resid -= d[i] * d[i]
                    ds += s[i] * d[i]
                    shs += s[i] * hs[i]
            if resid <= 0.0:
                label = 90
                continue
            temp = math.sqrt(stepsq * resid + ds * ds)
            if ds < 0.0:
                blen = (temp - ds) / stepsq
            else:
                blen = resid / (temp + ds)
            stplen = blen
            if shs > 0.0:
                stplen = min(blen, gredsq / shs)

            # preserve the simple bounds (h:2851-2867)
            iact = 0
            for i in range(1, n + 1):
                if s[i] != 0.0:
                    xsum = xopt[i] + d[i]
                    if s[i] > 0.0:
                        temp = (su[i] - xsum) / s[i]
                    else:
                        temp = (sl[i] - xsum) / s[i]
                    if temp < stplen:
                        stplen = temp
                        iact = i

            # update CRVMIN, GNEW and D (h:2871-2898)
            sdec = 0.0
            if stplen > 0.0:
                iterc += 1
                temp = shs / stepsq
                if iact == 0 and temp > 0.0:
                    crvmin = min(crvmin, temp)
                    if crvmin == -1.0:
                        crvmin = temp
                ggsav = gredsq
                gredsq = 0.0
                for i in range(1, n + 1):
                    gnew[i] += stplen * hs[i]
                    if xbdi[i] == 0.0:
                        gredsq += gnew[i] * gnew[i]
                    d[i] += stplen * s[i]
                sdec = max(stplen * (ggsav - 0.5 * stplen * shs), 0.0)
                qred += sdec

            # restart CG when a new bound is hit (h:2902-2915)
            if iact > 0:
                nact += 1
                xbdi[iact] = 1.0
                if s[iact] < 0.0:
                    xbdi[iact] = -1.0
                delsq -= d[iact] * d[iact]
                if delsq <= 0.0:
                    label = 90
                    continue
                label = 20
                continue

            if stplen < blen:
                if iterc == itermax:
                    label = 190
                    continue
                if sdec <= qred * 0.01:
                    label = 190
                    continue
                beta = gredsq / ggsav
                label = 30
                continue
            label = 90
        elif label == 90:
            crvmin = 0.0
            label = 100
        elif label == 100:
            if nact >= n - 1:
                label = 190
                continue
            dredsq = 0.0
            dredg = 0.0
            gredsq = 0.0
            for i in range(1, n + 1):
                if xbdi[i] == 0.0:
                    dredsq += d[i] * d[i]
                    dredg += d[i] * gnew[i]
                    gredsq += gnew[i] * gnew[i]
                    s[i] = d[i]
                else:
                    s[i] = 0.0
            itcsav = iterc
            label = 210
        elif label == 120:
            iterc += 1
            temp = gredsq * dredsq - dredg * dredg
            if temp <= qred * 1e-4 * qred:
                label = 190
                continue
            temp = math.sqrt(temp)
            for i in range(1, n + 1):
                if xbdi[i] == 0.0:
                    s[i] = (dredg * d[i] - dredsq * gnew[i]) / temp
                else:
                    s[i] = 0.0
            sredg = -temp

            # ANGBD: bound on tan of half the rotation angle (h:2989-3034)
            angbd = 1.0
            iact = 0
            restart100 = False
            for i in range(1, n + 1):
                if xbdi[i] == 0.0:
                    tempa = xopt[i] + d[i] - sl[i]
                    tempb = su[i] - xopt[i] - d[i]
                    if tempa <= 0.0:
                        nact += 1
                        xbdi[i] = -1.0
                        restart100 = True
                        break
                    elif tempb <= 0.0:
                        nact += 1
                        xbdi[i] = 1.0
                        restart100 = True
                        break
                    ssq = d[i] * d[i] + s[i] * s[i]
                    temp = ssq - (xopt[i] - sl[i]) * (xopt[i] - sl[i])
                    if temp > 0.0:
                        temp = math.sqrt(temp) - s[i]
                        if angbd * temp > tempa:
                            angbd = tempa / temp
                            iact = i
                            xsav = -1.0
                    temp = ssq - (su[i] - xopt[i]) * (su[i] - xopt[i])
                    if temp > 0.0:
                        temp = math.sqrt(temp) + s[i]
                        if angbd * temp > tempb:
                            angbd = tempb / temp
                            iact = i
                            xsav = 1.0
            if restart100:
                label = 100
                continue
            label = 210
        elif label == 150:
            shs = 0.0
            dhs = 0.0
            dhd = 0.0
            for i in range(1, n + 1):
                if xbdi[i] == 0.0:
                    shs += s[i] * hs[i]
                    dhs += d[i] * hs[i]
                    dhd += d[i] * hred[i]

            # scan equally spaced ANGT values in [0, ANGBD] (h:3057-3076)
            redmax = 0.0
            isav = 0
            redsav = 0.0
            iu = int(angbd * 17.0 + 3.1)
            for i in range(1, iu + 1):
                angt = angbd * float(i) / float(iu)
                sth = (angt + angt) / (1.0 + angt * angt)
                temp = shs + angt * (angt * dhd - dhs - dhs)
                rednew = sth * (angt * dredg - sredg - 0.5 * sth * temp)
                if rednew > redmax:
                    redmax = rednew
                    isav = i
                    rdprev = redsav
                elif i == isav + 1:
                    rdnext = rednew
                redsav = rednew

            if isav == 0:
                label = 190
                continue
            if isav < iu:
                temp = (rdnext - rdprev) / (redmax + redmax - rdprev - rdnext)
                angt = angbd * (float(isav) + 0.5 * temp) / float(iu)
            cth = (1.0 - angt * angt) / (1.0 + angt * angt)
            sth = (angt + angt) / (1.0 + angt * angt)
            temp = shs + angt * (angt * dhd - dhs - dhs)
            sdec = sth * (angt * dredg - sredg - 0.5 * sth * temp)
            if sdec <= 0.0:
                label = 190
                continue

            # update GNEW, D and HRED (h:3100-3120)
            dredg = 0.0
            gredsq = 0.0
            for i in range(1, n + 1):
                gnew[i] = gnew[i] + (cth - 1.0) * hred[i] + sth * hs[i]
                if xbdi[i] == 0.0:
                    d[i] = cth * d[i] + sth * s[i]
                    dredg += d[i] * gnew[i]
                    gredsq += gnew[i] * gnew[i]
                hred[i] = cth * hred[i] + sth * hs[i]
            qred += sdec
            if iact > 0 and isav == iu:
                nact += 1
                xbdi[iact] = xsav
                label = 100
                continue
            if sdec > qred * 0.01:
                label = 120
                continue
            label = 190
        elif label == 190:
            dsq = 0.0
            for i in range(1, n + 1):
                xnew[i] = max(min(xopt[i] + d[i], su[i]), sl[i])
                if xbdi[i] == -1.0:
                    xnew[i] = sl[i]
                if xbdi[i] == 1.0:
                    xnew[i] = su[i]
                d[i] = xnew[i] - xopt[i]
                dsq += d[i] * d[i]
            return dsq, crvmin
        elif label == 210:
            # HS = H*S — the shared "external subroutine" (h:3155-3199)
            ih = 0
            for j in range(1, n + 1):
                hs[j] = 0.0
                for i in range(1, j + 1):
                    ih += 1
                    if i < j:
                        hs[j] += hq[ih] * s[i]
                    hs[i] += hq[ih] * s[j]
            for k in range(1, npt + 1):
                if pq[k] != 0.0:
                    temp = 0.0
                    for j in range(1, n + 1):
                        temp += xpt[k][j] * s[j]
                    temp *= pq[k]
                    for i in range(1, n + 1):
                        hs[i] += temp * xpt[k][i]
            if crvmin != 0.0:
                label = 50
                continue
            if iterc > itcsav:
                label = 150
                continue
            for i in range(1, n + 1):
                hred[i] = hs[i]
            label = 120


# ---------------------------------------------------------------------------
# prelim_ — initial interpolation set and model
# (optimization_bobyqa.h:1765-2016)
# ---------------------------------------------------------------------------


def _prelim(calfun, n, npt, x, xl, xu, rhobeg, maxfun, xbase, xpt, fval,
            gopt, hq, pq, bmat, zmat, ndim, sl, su):
    """Returns (nf, kopt); fills the model arrays in place (1-based)."""
    rhosq = rhobeg * rhobeg
    recip = 1.0 / rhosq
    np_ = n + 1

    for j in range(1, n + 1):
        xbase[j] = x[j]
        for k in range(1, npt + 1):
            xpt[k][j] = 0.0
        for i in range(1, ndim + 1):
            bmat[i][j] = 0.0
    for ih in range(1, n * np_ // 2 + 1):
        hq[ih] = 0.0
    for k in range(1, npt + 1):
        pq[k] = 0.0
        for j in range(1, npt - np_ + 1):
            zmat[k][j] = 0.0

    nf = 0
    kopt = 1
    fbeg = 0.0
    stepa = 0.0
    stepb = 0.0
    ipt = 0
    jpt = 0
    while True:  # L50
        nfm = nf
        nfx = nf - n
        nf += 1
        if nfm <= 2 * n:
            if 1 <= nfm <= n:
                stepa = rhobeg
                if su[nfm] == 0.0:
                    stepa = -stepa
                xpt[nf][nfm] = stepa
            elif nfm > n:
                stepa = xpt[nf - n][nfx]
                stepb = -rhobeg
                if sl[nfx] == 0.0:
                    stepb = min(2.0 * rhobeg, su[nfx])
                if su[nfx] == 0.0:
                    stepb = max(-2.0 * rhobeg, sl[nfx])
                xpt[nf][nfx] = stepb
        else:
            itemp = (nfm - np_) // n
            jpt = nfm - itemp * n - n
            ipt = jpt + itemp
            if ipt > n:
                itemp = jpt
                jpt = ipt - n
                ipt = itemp
            xpt[nf][ipt] = xpt[ipt + 1][ipt]
            xpt[nf][jpt] = xpt[jpt + 1][jpt]

        # next value of F (h:1934-1956)
        for j in range(1, n + 1):
            x[j] = min(max(xl[j], xbase[j] + xpt[nf][j]), xu[j])
            if xpt[nf][j] == sl[j]:
                x[j] = xl[j]
            if xpt[nf][j] == su[j]:
                x[j] = xu[j]
        f = calfun(x[1:n + 1])
        fval[nf] = f
        if nf == 1:
            fbeg = f
            kopt = 1
        elif f < fval[kopt]:
            kopt = nf

        # nonzero initial elements of BMAT / the quadratic model
        # (h:1964-2011)
        if nf <= 2 * n + 1:
            if 2 <= nf <= n + 1:
                gopt[nfm] = (f - fbeg) / stepa
                if npt < nf + n:
                    bmat[1][nfm] = -1.0 / stepa
                    bmat[nf][nfm] = 1.0 / stepa
                    bmat[npt + nfm][nfm] = -0.5 * rhosq
            elif nf >= n + 2:
                ih = nfx * (nfx + 1) // 2
                temp = (f - fbeg) / stepb
                diff = stepb - stepa
                hq[ih] = 2.0 * (temp - gopt[nfx]) / diff
                gopt[nfx] = (gopt[nfx] * stepb - temp * stepa) / diff
                if stepa * stepb < 0.0:
                    if f < fval[nf - n]:
                        fval[nf] = fval[nf - n]
                        fval[nf - n] = f
                        if kopt == nf:
                            kopt = nf - n
                        xpt[nf - n][nfx] = stepb
                        xpt[nf][nfx] = stepa
                bmat[1][nfx] = -(stepa + stepb) / (stepa * stepb)
                bmat[nf][nfx] = -0.5 / xpt[nf - n][nfx]
                bmat[nf - n][nfx] = -bmat[1][nfx] - bmat[nf][nfx]
                zmat[1][nfx] = math.sqrt(2.0) / (stepa * stepb)
                zmat[nf][nfx] = math.sqrt(0.5) / rhosq
                zmat[nf - n][nfx] = -zmat[1][nfx] - zmat[nf][nfx]
        else:
            ih = ipt * (ipt - 1) // 2 + jpt
            zmat[1][nfx] = recip
            zmat[nf][nfx] = recip
            zmat[ipt + 1][nfx] = -recip
            zmat[jpt + 1][nfx] = -recip
            temp = xpt[nf][ipt] * xpt[nf][jpt]
            hq[ih] = (fbeg - fval[ipt + 1] - fval[jpt + 1] + f) / temp
        if nf < npt and nf < maxfun:
            continue
        return nf, kopt


# ---------------------------------------------------------------------------
# rescue_ — rebuild the interpolation set after denominator damage
# (optimization_bobyqa.h:2020-2633)
# ---------------------------------------------------------------------------


def _rescue(calfun, n, npt, xl, xu, maxfun, xbase, xpt, fval, xopt, gopt,
            hq, pq, bmat, zmat, ndim, sl, su, nf, delta, kopt, vlag):
    """Returns (nf, kopt); nf == -1 signals the maxfun stop (h:2495)."""
    ptsaux = _zeros2(n + 1, 3)  # ptsaux[j][1], ptsaux[j][2]
    ptsid = _zeros(npt + 1)
    w = _zeros(ndim + npt + 1)

    np_ = n + 1
    sfrac = 0.5 / float(np_)
    nptm = npt - np_

    # shift so XOPT is the origin; zero ZMAT (h:2150-2171)
    sumpq = 0.0
    winc = 0.0
    for k in range(1, npt + 1):
        distsq = 0.0
        for j in range(1, n + 1):
            xpt[k][j] -= xopt[j]
            distsq += xpt[k][j] * xpt[k][j]
        sumpq += pq[k]
        w[ndim + k] = distsq
        winc = max(winc, distsq)
        for j in range(1, nptm + 1):
            zmat[k][j] = 0.0

    # update HQ for the base shift (h:2176-2191)
    ih = 0
    for j in range(1, n + 1):
        w[j] = 0.5 * sumpq * xopt[j]
        for k in range(1, npt + 1):
            w[j] += pq[k] * xpt[k][j]
        for i in range(1, j + 1):
            ih += 1
            hq[ih] = hq[ih] + w[i] * xopt[j] + w[j] * xopt[i]

    # shift XBASE/SL/SU/XOPT; zero BMAT; set PTSAUX (h:2196-2222)
    for j in range(1, n + 1):
        xbase[j] += xopt[j]
        sl[j] -= xopt[j]
        su[j] -= xopt[j]
        xopt[j] = 0.0
        ptsaux[j][1] = min(delta, su[j])
        ptsaux[j][2] = max(-delta, sl[j])
        if ptsaux[j][1] + ptsaux[j][2] < 0.0:
            temp = ptsaux[j][1]
            ptsaux[j][1] = ptsaux[j][2]
            ptsaux[j][2] = temp
        if abs(ptsaux[j][2]) < 0.5 * abs(ptsaux[j][1]):
            ptsaux[j][2] = 0.5 * ptsaux[j][1]
        for i in range(1, ndim + 1):
            bmat[i][j] = 0.0
    fbase = fval[kopt]

    # provisional coordinate-direction points (h:2229-2256)
    ptsid[1] = sfrac
    for j in range(1, n + 1):
        jp = j + 1
        jpn = jp + n
        ptsid[jp] = float(j) + sfrac
        if jpn <= npt:
            ptsid[jpn] = float(j) / float(np_) + sfrac
            temp = 1.0 / (ptsaux[j][1] - ptsaux[j][2])
            bmat[jp][j] = -temp + 1.0 / ptsaux[j][1]
            bmat[jpn][j] = temp + 1.0 / ptsaux[j][2]
            bmat[1][j] = -bmat[jp][j] - bmat[jpn][j]
            zmat[1][j] = math.sqrt(2.0) / abs(ptsaux[j][1] * ptsaux[j][2])
            zmat[jp][j] = zmat[1][j] * ptsaux[j][2] * temp
            zmat[jpn][j] = -zmat[1][j] * ptsaux[j][1] * temp
        else:
            bmat[1][j] = -1.0 / ptsaux[j][1]
            bmat[jp][j] = 1.0 / ptsaux[j][1]
            bmat[j + npt][j] = -0.5 * (ptsaux[j][1] * ptsaux[j][1])

    # remaining provisional identifiers (h:2260-2279)
    if npt >= n + np_:
        for k in range(2 * np_, npt + 1):
            iw = int((float(k - np_) - 0.5) / float(n))
            ip = k - np_ - iw * n
            iq = ip + iw
            if iq > n:
                iq -= n
            ptsid[k] = float(ip) + float(iq) / float(np_) + sfrac
            temp = 1.0 / (ptsaux[ip][1] * ptsaux[iq][1])
            zmat[1][k - np_] = temp
            zmat[ip + 1][k - np_] = -temp
            zmat[iq + 1][k - np_] = -temp
            zmat[k][k - np_] = temp
    nrem = npt
    kold = 1
    knew = kopt

    beta = 0.0
    denom = 0.0
    label = 80
    while label != 260:
        if label == 80:
            # exchange PTSID(KOLD) with PTSID(KNEW) (h:2287-2326)
            for j in range(1, n + 1):
                temp = bmat[kold][j]
                bmat[kold][j] = bmat[knew][j]
                bmat[knew][j] = temp
            for j in range(1, nptm + 1):
                temp = zmat[kold][j]
                zmat[kold][j] = zmat[knew][j]
                zmat[knew][j] = temp
            ptsid[kold] = ptsid[knew]
            ptsid[knew] = 0.0
            w[ndim + knew] = 0.0
            nrem -= 1
            if knew != kopt:
                temp = vlag[kold]
                vlag[kold] = vlag[knew]
                vlag[knew] = temp
                _update(n, npt, bmat, zmat, ndim, vlag, beta, denom, knew, w)
                if nrem == 0:
                    return nf, kopt  # L350
                for k in range(1, npt + 1):
                    w[ndim + k] = abs(w[ndim + k])
            label = 120
        elif label == 120:
            # pick the original point closest to XOPT (h:2332-2346)
            dsqmin = 0.0
            for k in range(1, npt + 1):
                if w[ndim + k] > 0.0:
                    if dsqmin == 0.0 or w[ndim + k] < dsqmin:
                        knew = k
                        dsqmin = w[ndim + k]
            if dsqmin == 0.0:
                label = 260
                continue

            # W-vector of the chosen original point (h:2350-2382)
            for j in range(1, n + 1):
                w[npt + j] = xpt[knew][j]
            for k in range(1, npt + 1):
                summ = 0.0
                if k == kopt:
                    pass
                elif ptsid[k] == 0.0:
                    for j in range(1, n + 1):
                        summ += w[npt + j] * xpt[k][j]
                else:
                    ip = int(ptsid[k])
                    if ip > 0:
                        summ = w[npt + ip] * ptsaux[ip][1]
                    iq = int(float(np_) * ptsid[k] - float(ip * np_))
                    if iq > 0:
                        iw = 1
                        if ip == 0:
                            iw = 2
                        summ += w[npt + iq] * ptsaux[iq][iw]
                w[k] = 0.5 * summ * summ

            # VLAG and BETA for the update (h:2387-2439)
            for k in range(1, npt + 1):
                summ = 0.0
                for j in range(1, n + 1):
                    summ += bmat[k][j] * w[npt + j]
                vlag[k] = summ
            beta = 0.0
            for j in range(1, nptm + 1):
                summ = 0.0
                for k in range(1, npt + 1):
                    summ += zmat[k][j] * w[k]
                beta -= summ * summ
                for k in range(1, npt + 1):
                    vlag[k] += summ * zmat[k][j]
            bsum = 0.0
            distsq = 0.0
            for j in range(1, n + 1):
                summ = 0.0
                for k in range(1, npt + 1):
                    summ += bmat[k][j] * w[k]
                jp = j + npt
                bsum += summ * w[jp]
                for ip in range(npt + 1, ndim + 1):
                    summ += bmat[ip][j] * w[ip]
                bsum += summ * w[jp]
                vlag[jp] = summ
                distsq += xpt[knew][j] * xpt[knew][j]
            beta = 0.5 * distsq * distsq + beta - bsum
            vlag[kopt] += 1.0

            # choose KOLD avoiding a small denominator (h:2446-2478)
            denom = 0.0
            vlmxsq = 0.0
            for k in range(1, npt + 1):
                if ptsid[k] != 0.0:
                    hdiag = 0.0
                    for j in range(1, nptm + 1):
                        hdiag += zmat[k][j] * zmat[k][j]
                    den = beta * hdiag + vlag[k] * vlag[k]
                    if den > denom:
                        kold = k
                        denom = den
                vlmxsq = max(vlmxsq, vlag[k] * vlag[k])
            if denom <= vlmxsq * 0.01:
                w[ndim + knew] = -w[ndim + knew] - winc
                label = 120
                continue
            label = 80

    # L260: evaluate F at any provisional points still in the set
    # (h:2488-2630)
    for kpt in range(1, npt + 1):
        if ptsid[kpt] == 0.0:
            continue
        if nf >= maxfun:
            return -1, kopt
        ih = 0
        for j in range(1, n + 1):
            w[j] = xpt[kpt][j]
            xpt[kpt][j] = 0.0
            temp = pq[kpt] * w[j]
            for i in range(1, j + 1):
                ih += 1
                hq[ih] += temp * w[i]
        pq[kpt] = 0.0
        ip = int(ptsid[kpt])
        iq = int(float(np_) * ptsid[kpt] - float(ip * np_))
        xp = 0.0
        xq = 0.0
        if ip > 0:
            xp = ptsaux[ip][1]
            xpt[kpt][ip] = xp
        if iq > 0:
            xq = ptsaux[iq][1]
            if ip == 0:
                xq = ptsaux[iq][2]
            xpt[kpt][iq] = xq

        # VQUAD = current model at the new point (h:2529-2553)
        vquad = fbase
        ihp = 0
        if ip > 0:
            ihp = (ip + ip * ip) // 2
            vquad += xp * (gopt[ip] + 0.5 * xp * hq[ihp])
        if iq > 0:
            ihq = (iq + iq * iq) // 2
            vquad += xq * (gopt[iq] + 0.5 * xq * hq[ihq])
            if ip > 0:
                iw = max(ihp, ihq) - abs(ip - iq)
                vquad += xp * xq * hq[iw]
        for k in range(1, npt + 1):
            temp = 0.0
            if ip > 0:
                temp += xp * xpt[k][ip]
            if iq > 0:
                temp += xq * xpt[k][iq]
            vquad += 0.5 * pq[k] * temp * temp

        # F at the new interpolation point (h:2559-2580)
        for i in range(1, n + 1):
            w[i] = min(max(xl[i], xbase[i] + xpt[kpt][i]), xu[i])
            if xpt[kpt][i] == sl[i]:
                w[i] = xl[i]
            if xpt[kpt][i] == su[i]:
                w[i] = xu[i]
        nf += 1
        f = calfun(w[1:n + 1])
        fval[kpt] = f
        if f < fval[kopt]:
            kopt = kpt
        diff = f - vquad

        # update the quadratic model (h:2585-2627)
        for i in range(1, n + 1):
            gopt[i] += diff * bmat[kpt][i]
        for k in range(1, npt + 1):
            summ = 0.0
            for j in range(1, nptm + 1):
                summ += zmat[k][j] * zmat[kpt][j]
            temp = diff * summ
            if ptsid[k] == 0.0:
                pq[k] += temp
            else:
                ip = int(ptsid[k])
                iq = int(float(np_) * ptsid[k] - float(ip * np_))
                ihq = (iq * iq + iq) // 2
                if ip == 0:
                    hq[ihq] += temp * (ptsaux[iq][2] * ptsaux[iq][2])
                else:
                    ihp = (ip * ip + ip) // 2
                    hq[ihp] += temp * (ptsaux[ip][1] * ptsaux[ip][1])
                    if iq > 0:
                        hq[ihq] += temp * (ptsaux[iq][1] * ptsaux[iq][1])
                        iw = max(ihp, ihq) - abs(iq - ip)
                        hq[iw] += temp * ptsaux[ip][1] * ptsaux[iq][1]
        ptsid[kpt] = 0.0
    return nf, kopt


# ---------------------------------------------------------------------------
# bobyqb_ — the main iteration (optimization_bobyqa.h:238-1324)
# ---------------------------------------------------------------------------


def _bobyqb(calfun, n, npt, x, xl, xu, rhobeg, rhoend, maxfun):
    np_ = n + 1
    nptm = npt - np_
    nh = n * np_ // 2
    ndim = npt + n

    xbase = _zeros(n + 1)
    xpt = _zeros2(npt + 1, n + 1)
    fval = _zeros(npt + 1)
    xopt = _zeros(n + 1)
    gopt = _zeros(n + 1)
    hq = _zeros(nh + 1)
    pq = _zeros(npt + 1)
    bmat = _zeros2(ndim + 1, n + 1)
    zmat = _zeros2(npt + 1, max(nptm, 0) + 1)
    sl = _zeros(n + 1)
    su = _zeros(n + 1)
    xnew = _zeros(n + 1)
    xalt = _zeros(n + 1)
    d = _zeros(n + 1)
    vlag = _zeros(ndim + 1)
    w = _zeros(3 * ndim + 1)

    # SL/SU and initial-X adjustments done by bobyqa_ before bobyqb_
    # (h:186-224)
    for j in range(1, n + 1):
        temp = xu[j] - xl[j]
        if temp < rhobeg + rhobeg:
            raise BobyqaFailure(
                "Return from BOBYQA because one of the differences in "
                "x_lower and x_upper is less than 2*rho_begin"
            )
        sl[j] = xl[j] - x[j]
        su[j] = xu[j] - x[j]
        if sl[j] >= -rhobeg:
            if sl[j] >= 0.0:
                x[j] = xl[j]
                sl[j] = 0.0
                su[j] = temp
            else:
                x[j] = xl[j] + rhobeg
                sl[j] = -rhobeg
                su[j] = max(xu[j] - x[j], rhobeg)
        elif su[j] <= rhobeg:
            if su[j] <= 0.0:
                x[j] = xu[j]
                sl[j] = -temp
                su[j] = 0.0
            else:
                x[j] = xu[j] - rhobeg
                sl[j] = min(xl[j] - x[j], -rhobeg)
                su[j] = rhobeg

    nf, kopt = _prelim(calfun, n, npt, x, xl, xu, rhobeg, maxfun, xbase,
                       xpt, fval, gopt, hq, pq, bmat, zmat, ndim, sl, su)
    xoptsq = 0.0
    for i in range(1, n + 1):
        xopt[i] = xpt[kopt][i]
        xoptsq += xopt[i] * xopt[i]
    fsave = fval[1]
    if nf < npt:
        raise BobyqaFailure(
            "Return from BOBYQA because the objective function has been "
            "called max_f_evals times."
        )
    kbase = 1

    rho = rhobeg
    delta = rho
    nresc = nf
    ntrits = 0
    diffa = 0.0
    diffb = 0.0
    diffc = 0.0
    itest = 0
    nfsav = nf

    knew = 0
    dsq = 0.0
    dnorm = 0.0
    distsq = 0.0
    adelt = 0.0
    alpha = 0.0
    cauchy = 0.0
    beta = 0.0
    denom = 0.0
    ratio = 0.0
    f = 0.0
    vquad = 0.0
    fopt = 0.0
    crvmin = 0.0

    label = 20
    while True:
        if label == 20:
            # update GOPT for a new KOPT (h:412-444)
            if kopt != kbase:
                ih = 0
                for j in range(1, n + 1):
                    for i in range(1, j + 1):
                        ih += 1
                        if i < j:
                            gopt[j] += hq[ih] * xopt[i]
                        gopt[i] += hq[ih] * xopt[j]
                if nf > npt:
                    for k in range(1, npt + 1):
                        temp = 0.0
                        for j in range(1, n + 1):
                            temp += xpt[k][j] * xopt[j]
                        temp = pq[k] * temp
                        for i in range(1, n + 1):
                            gopt[i] += temp * xpt[k][i]
            label = 60
        elif label == 60:
            # trust-region step (h:453-510)
            dsq, crvmin = _trsbox(n, npt, xpt, xopt, gopt, hq, pq, sl, su,
                                  delta, xnew, d, w)
            # w[1..n] now holds GNEW — read below as the reference reads
            # its w[] slice (h:487-490)
            dnorm = min(delta, math.sqrt(dsq))
            if dnorm < 0.5 * rho:
                ntrits = -1
                distsq = (10.0 * rho) * (10.0 * rho)
                if nf <= nfsav + 2:
                    label = 650
                    continue
                errbig = max(max(diffa, diffb), diffc)
                frhosq = rho * 0.125 * rho
                if crvmin > 0.0 and errbig > frhosq * crvmin:
                    label = 650
                    continue
                bdtol = errbig / rho
                go650 = False
                for j in range(1, n + 1):
                    bdtest = bdtol
                    if xnew[j] == sl[j]:
                        bdtest = w[j]
                    if xnew[j] == su[j]:
                        bdtest = -w[j]
                    if bdtest < bdtol:
                        curv = hq[(j + j * j) // 2]
                        for k in range(1, npt + 1):
                            curv += pq[k] * (xpt[k][j] * xpt[k][j])
                        bdtest += 0.5 * curv * rho
                        if bdtest < bdtol:
                            go650 = True
                            break
                label = 650 if go650 else 680
                continue
            ntrits += 1
            label = 90
        elif label == 90:
            # shift XBASE when XOPT drifts far from it (h:518-619)
            if dsq <= xoptsq * 0.001:
                fracsq = xoptsq * 0.25
                sumpq = 0.0
                for k in range(1, npt + 1):
                    sumpq += pq[k]
                    summ = -0.5 * xoptsq
                    for i in range(1, n + 1):
                        summ += xpt[k][i] * xopt[i]
                    w[npt + k] = summ
                    temp = fracsq - 0.5 * summ
                    for i in range(1, n + 1):
                        w[i] = bmat[k][i]
                        vlag[i] = summ * xpt[k][i] + temp * xopt[i]
                        ip = npt + i
                        for j in range(1, i + 1):
                            bmat[ip][j] = (bmat[ip][j] + w[i] * vlag[j]
                                           + vlag[i] * w[j])
                for jj in range(1, nptm + 1):
                    sumz = 0.0
                    sumw = 0.0
                    for k in range(1, npt + 1):
                        sumz += zmat[k][jj]
                        vlag[k] = w[npt + k] * zmat[k][jj]
                        sumw += vlag[k]
                    for j in range(1, n + 1):
                        summ = (fracsq * sumz - 0.5 * sumw) * xopt[j]
                        for k in range(1, npt + 1):
                            summ += vlag[k] * xpt[k][j]
                        w[j] = summ
                        for k in range(1, npt + 1):
                            bmat[k][j] += summ * zmat[k][jj]
                    for i in range(1, n + 1):
                        ip = i + npt
                        temp = w[i]
                        for j in range(1, i + 1):
                            bmat[ip][j] += temp * w[j]
                ih = 0
                for j in range(1, n + 1):
                    w[j] = -0.5 * sumpq * xopt[j]
                    for k in range(1, npt + 1):
                        w[j] += pq[k] * xpt[k][j]
                        xpt[k][j] -= xopt[j]
                    for i in range(1, j + 1):
                        ih += 1
                        hq[ih] = hq[ih] + w[i] * xopt[j] + xopt[i] * w[j]
                        bmat[npt + i][j] = bmat[npt + j][i]
                for i in range(1, n + 1):
                    xbase[i] += xopt[i]
                    xnew[i] -= xopt[i]
                    sl[i] -= xopt[i]
                    su[i] -= xopt[i]
                    xopt[i] = 0.0
                xoptsq = 0.0
            if ntrits == 0:
                label = 210
                continue
            label = 230
        elif label == 190:
            # RESCUE (h:634-669)
            nfsav = nf
            kbase = kopt
            nf, kopt = _rescue(calfun, n, npt, xl, xu, maxfun, xbase, xpt,
                               fval, xopt, gopt, hq, pq, bmat, zmat, ndim,
                               sl, su, nf, delta, kopt, vlag)
            xoptsq = 0.0
            if kopt != kbase:
                for i in range(1, n + 1):
                    xopt[i] = xpt[kopt][i]
                    xoptsq += xopt[i] * xopt[i]
            if nf < 0:
                nf = maxfun
                raise BobyqaFailure(
                    "Return from BOBYQA because the objective function has "
                    "been called max_f_evals times."
                )
            nresc = nf
            if nfsav < nf:
                nfsav = nf
                label = 20
                continue
            if ntrits > 0:
                label = 60
                continue
            label = 210
        elif label == 210:
            # ALTMOV (h:682-690)
            alpha, cauchy = _altmov(n, npt, xpt, xopt, bmat, zmat, ndim,
                                    sl, su, kopt, knew, adelt, xnew, xalt)
            for i in range(1, n + 1):
                d[i] = xnew[i] - xopt[i]
            label = 230
        elif label == 230:
            # VLAG and BETA for the current D (h:696-757)
            for k in range(1, npt + 1):
                suma = 0.0
                sumb = 0.0
                summ = 0.0
                for j in range(1, n + 1):
                    suma += xpt[k][j] * d[j]
                    sumb += xpt[k][j] * xopt[j]
                    summ += bmat[k][j] * d[j]
                w[k] = suma * (0.5 * suma + sumb)
                vlag[k] = summ
                w[npt + k] = suma
            beta = 0.0
            for jj in range(1, nptm + 1):
                summ = 0.0
                for k in range(1, npt + 1):
                    summ += zmat[k][jj] * w[k]
                beta -= summ * summ
                for k in range(1, npt + 1):
                    vlag[k] += summ * zmat[k][jj]
            dsq = 0.0
            bsum = 0.0
            dx = 0.0
            for j in range(1, n + 1):
                dsq += d[j] * d[j]
                summ = 0.0
                for k in range(1, npt + 1):
                    summ += w[k] * bmat[k][j]
                bsum += summ * d[j]
                jp = npt + j
                for i in range(1, n + 1):
                    summ += bmat[jp][i] * d[i]
                vlag[jp] = summ
                bsum += summ * d[j]
                dx += d[j] * xopt[j]
            beta = dx * dx + dsq * (xoptsq + dx + dx + 0.5 * dsq) + beta - bsum
            vlag[kopt] += 1.0

            if ntrits == 0:
                # maybe replace the ALTMOV step by the Cauchy step
                # (h:763-785)
                denom = vlag[knew] * vlag[knew] + alpha * beta
                if denom < cauchy and cauchy > 0.0:
                    for i in range(1, n + 1):
                        xnew[i] = xalt[i]
                        d[i] = xnew[i] - xopt[i]
                    cauchy = 0.0
                    label = 230
                    continue
                if denom <= 0.5 * (vlag[knew] * vlag[knew]):
                    if nf > nresc:
                        label = 190
                        continue
                    raise BobyqaFailure(
                        "Return from BOBYQA because of much cancellation "
                        "in a denominator."
                    )
            else:
                # choose KNEW for the trust-region step (h:793-846)
                delsq = delta * delta
                scaden = 0.0
                biglsq = 0.0
                knew = 0
                for k in range(1, npt + 1):
                    if k == kopt:
                        continue
                    hdiag = 0.0
                    for jj in range(1, nptm + 1):
                        hdiag += zmat[k][jj] * zmat[k][jj]
                    den = beta * hdiag + vlag[k] * vlag[k]
                    distsq = 0.0
                    for j in range(1, n + 1):
                        temp_ = xpt[k][j] - xopt[j]
                        distsq += temp_ * temp_
                    temp = max(1.0, (distsq / delsq) * (distsq / delsq))
                    if temp * den > scaden:
                        scaden = temp * den
                        knew = k
                        denom = den
                    biglsq = max(biglsq, temp * (vlag[k] * vlag[k]))
                if scaden <= 0.5 * biglsq:
                    if nf > nresc:
                        label = 190
                        continue
                    raise BobyqaFailure(
                        "Return from BOBYQA because of much cancellation "
                        "in a denominator."
                    )
            label = 360
        elif label == 360:
            # evaluate F at XBASE+XNEW (h:856-881)
            for i in range(1, n + 1):
                x[i] = min(max(xl[i], xbase[i] + xnew[i]), xu[i])
                if xnew[i] == sl[i]:
                    x[i] = xl[i]
                if xnew[i] == su[i]:
                    x[i] = xu[i]
            if nf >= maxfun:
                raise BobyqaFailure(
                    "Return from BOBYQA because the objective function has "
                    "been called max_f_evals times."
                )
            nf += 1
            f = calfun(x[1:n + 1])
            if ntrits == -1:
                fsave = f
                label = 720
                continue

            # prediction error of the quadratic model (h:886-916)
            fopt = fval[kopt]
            vquad = 0.0
            ih = 0
            for j in range(1, n + 1):
                vquad += d[j] * gopt[j]
                for i in range(1, j + 1):
                    ih += 1
                    temp = d[i] * d[j]
                    if i == j:
                        temp = 0.5 * temp
                    vquad += hq[ih] * temp
            for k in range(1, npt + 1):
                vquad += 0.5 * pq[k] * (w[npt + k] * w[npt + k])
            diff = f - fopt - vquad
            diffc = diffb
            diffb = diffa
            diffa = abs(diff)
            if dnorm > rho:
                nfsav = nf

            # next DELTA after a trust-region step (h:920-994)
            if ntrits > 0:
                if vquad >= 0.0:
                    raise BobyqaFailure(
                        "Return from BOBYQA because a trust region step "
                        "has failed to reduce Q."
                    )
                ratio = (f - fopt) / vquad
                if ratio <= 0.1:
                    delta = min(0.5 * delta, dnorm)
                elif ratio <= 0.7:
                    delta = max(0.5 * delta, dnorm)
                else:
                    delta = max(0.5 * delta, dnorm + dnorm)
                if delta <= rho * 1.5:
                    delta = rho

                if f < fopt:
                    ksav = knew
                    densav = denom
                    delsq = delta * delta
                    scaden = 0.0
                    biglsq = 0.0
                    knew = 0
                    for k in range(1, npt + 1):
                        hdiag = 0.0
                        for jj in range(1, nptm + 1):
                            hdiag += zmat[k][jj] * zmat[k][jj]
                        den = beta * hdiag + vlag[k] * vlag[k]
                        distsq = 0.0
                        for j in range(1, n + 1):
                            temp_ = xpt[k][j] - xnew[j]
                            distsq += temp_ * temp_
                        temp = max(1.0, (distsq / delsq) * (distsq / delsq))
                        if temp * den > scaden:
                            scaden = temp * den
                            knew = k
                            denom = den
                        biglsq = max(biglsq, temp * (vlag[k] * vlag[k]))
                    if scaden <= 0.5 * biglsq:
                        knew = ksav
                        denom = densav

            # move the KNEW-th point; update the model (h:1000-1059)
            _update(n, npt, bmat, zmat, ndim, vlag, beta, denom, knew, w)
            ih = 0
            pqold = pq[knew]
            pq[knew] = 0.0
            for i in range(1, n + 1):
                temp = pqold * xpt[knew][i]
                for j in range(1, i + 1):
                    ih += 1
                    hq[ih] += temp * xpt[knew][j]
            for jj in range(1, nptm + 1):
                temp = diff * zmat[knew][jj]
                for k in range(1, npt + 1):
                    pq[k] += temp * zmat[k][jj]

            fval[knew] = f
            for i in range(1, n + 1):
                xpt[knew][i] = xnew[i]
                w[i] = bmat[knew][i]
            for k in range(1, npt + 1):
                suma = 0.0
                for jj in range(1, nptm + 1):
                    suma += zmat[knew][jj] * zmat[k][jj]
                sumb = 0.0
                for j in range(1, n + 1):
                    sumb += xpt[k][j] * xopt[j]
                temp = suma * sumb
                for i in range(1, n + 1):
                    w[i] += temp * xpt[k][i]
            for i in range(1, n + 1):
                gopt[i] += diff * w[i]

            # update XOPT/GOPT/KOPT on improvement (h:1064-1098)
            if f < fopt:
                kopt = knew
                xoptsq = 0.0
                ih = 0
                for j in range(1, n + 1):
                    xopt[j] = xnew[j]
                    xoptsq += xopt[j] * xopt[j]
                    for i in range(1, j + 1):
                        ih += 1
                        if i < j:
                            gopt[j] += hq[ih] * d[i]
                        gopt[i] += hq[ih] * d[j]
                for k in range(1, npt + 1):
                    temp = 0.0
                    for j in range(1, n + 1):
                        temp += xpt[k][j] * d[j]
                    temp = pq[k] * temp
                    for i in range(1, n + 1):
                        gopt[i] += temp * xpt[k][i]

            # possibly replace the model by the least-Frobenius-norm
            # interpolant (h:1105-1199)
            if ntrits > 0:
                for k in range(1, npt + 1):
                    vlag[k] = fval[k] - fval[kopt]
                    w[k] = 0.0
                for j in range(1, nptm + 1):
                    summ = 0.0
                    for k in range(1, npt + 1):
                        summ += zmat[k][j] * vlag[k]
                    for k in range(1, npt + 1):
                        w[k] += summ * zmat[k][j]
                for k in range(1, npt + 1):
                    summ = 0.0
                    for j in range(1, n + 1):
                        summ += xpt[k][j] * xopt[j]
                    w[k + npt] = w[k]
                    w[k] = summ * w[k]
                gqsq = 0.0
                gisq = 0.0
                for i in range(1, n + 1):
                    summ = 0.0
                    for k in range(1, npt + 1):
                        summ = summ + bmat[k][i] * vlag[k] + xpt[k][i] * w[k]
                    if xopt[i] == sl[i]:
                        gqsq += min(0.0, gopt[i]) ** 2
                        gisq += min(0.0, summ) ** 2
                    elif xopt[i] == su[i]:
                        gqsq += max(0.0, gopt[i]) ** 2
                        gisq += max(0.0, summ) ** 2
                    else:
                        gqsq += gopt[i] * gopt[i]
                        gisq += summ * summ
                    vlag[npt + i] = summ

                itest += 1
                if gqsq < 10.0 * gisq:
                    itest = 0
                if itest >= 3:
                    for i in range(1, max(npt, nh) + 1):
                        if i <= n:
                            gopt[i] = vlag[npt + i]
                        if i <= npt:
                            pq[i] = w[npt + i]
                        if i <= nh:
                            hq[i] = 0.0
                        itest = 0

            # sufficient decrease → another trust-region step
            # (h:1206-1222)
            if ntrits == 0:
                label = 60
                continue
            if f <= fopt + 0.1 * vquad:
                label = 60
                continue
            distsq = max((2.0 * delta) * (2.0 * delta),
                         (10.0 * rho) * (10.0 * rho))
            label = 650
        elif label == 650:
            # find the interpolation point furthest from XOPT
            # (h:1223-1275)
            knew = 0
            for k in range(1, npt + 1):
                summ = 0.0
                for j in range(1, n + 1):
                    temp_ = xpt[k][j] - xopt[j]
                    summ += temp_ * temp_
                if summ > distsq:
                    knew = k
                    distsq = summ
            if knew > 0:
                dist = math.sqrt(distsq)
                if ntrits == -1:
                    delta = min(0.1 * delta, 0.5 * dist)
                    if delta <= rho * 1.5:
                        delta = rho
                ntrits = 0
                adelt = max(min(0.1 * dist, delta), rho)
                dsq = adelt * adelt
                label = 90
                continue
            if ntrits == -1:
                label = 680
                continue
            if ratio > 0.0:
                label = 60
                continue
            if max(delta, dnorm) > rho:
                label = 60
                continue
            label = 680
        elif label == 680:
            # next RHO and DELTA (h:1280-1302)
            if rho > rhoend:
                delta = 0.5 * rho
                ratio = rho / rhoend
                if ratio <= 16.0:
                    rho = rhoend
                elif ratio <= 250.0:
                    rho = math.sqrt(ratio) * rhoend
                else:
                    rho = 0.1 * rho
                delta = max(delta, rho)
                ntrits = 0
                nfsav = nf
                label = 60
                continue
            if ntrits == -1:
                label = 360
                continue
            label = 720
        elif label == 720:
            # final X and F (h:1303-1323)
            if fval[kopt] <= fsave:
                for i in range(1, n + 1):
                    x[i] = min(max(xl[i], xbase[i] + xopt[i]), xu[i])
                    if xopt[i] == sl[i]:
                        x[i] = xl[i]
                    if xopt[i] == su[i]:
                        x[i] = xu[i]
                f = fval[kopt]
            return f


# ---------------------------------------------------------------------------
# public API — mirrors dlib::find_min_bobyqa / find_max_bobyqa
# (optimization_bobyqa.h:3340-3415)
# ---------------------------------------------------------------------------


def find_min_bobyqa(f, x0, npt, x_lower, x_upper, rho_begin, rho_end,
                    max_f_evals):
    """Minimize ``f`` over the box [x_lower, x_upper] starting at ``x0``.

    Returns ``(x, fmin)`` where x is a plain list of floats (the
    reference mutates x in place and returns the objective value).
    ``f`` receives a list of n floats.  Argument validation mirrors
    find_min_bobyqa's DLIB_CASSERTs (h:3360-3386) as ValueError — the
    reference trainers only catch :class:`BobyqaFailure`.
    """
    x = [float(v) for v in x0]
    xl = [float(v) for v in x_lower]
    xu = [float(v) for v in x_upper]
    n = len(x)
    if not (len(xl) == len(xu) == n and n > 1 and max_f_evals > 1):
        raise ValueError("find_min_bobyqa: invalid arguments")
    if not (n + 2 <= npt <= (n + 1) * (n + 2) // 2
            and 0 < rho_end < rho_begin
            and min(u - l for u, l in zip(xu, xl)) > 2 * rho_begin
            and min(v - l for v, l in zip(x, xl)) >= 0
            and min(u - v for u, v in zip(xu, x)) >= 0):
        raise ValueError("find_min_bobyqa: invalid arguments")

    # 1-based buffers (slot 0 unused) — see module docstring
    x1 = [0.0] + x
    xl1 = [0.0] + xl
    xu1 = [0.0] + xu
    # npt range re-checked by bobyqa_ itself (h:151-154)
    if npt < n + 2 or npt > (n + 2) * (n + 1) // 2:
        raise BobyqaFailure(
            "Return from BOBYQA because NPT is not in the required interval"
        )
    fmin = _bobyqb(lambda v: float(f(list(v))), n, int(npt), x1, xl1, xu1,
                   float(rho_begin), float(rho_end), int(max_f_evals))
    return x1[1:], fmin


def find_max_bobyqa(f, x0, npt, x_lower, x_upper, rho_begin, rho_end,
                    max_f_evals):
    """Maximize ``f`` — negate_function wrapper, exactly as the reference
    (h:3400-3415).  Returns ``(x, fmax)``."""
    x, fmin = find_min_bobyqa(lambda v: -f(v), x0, npt, x_lower, x_upper,
                              rho_begin, rho_end, max_f_evals)
    return x, -fmin


# ---------------------------------------------------------------------------
# find_min/max_single_variable — the reference's OTHER hyperparameter
# optimizer (dlib/optimization/optimization_line_search.h:558-869), used by
# the NER segment-classifier C search (ner_trainer.cpp:381-395) and the
# text-categorizer C search (text_categorizer_trainer.cpp:254-268), both
# with (start=300, [0.01, 5000], eps=1, max_iter=100, radius=100).  Same
# bit-fidelity contract as the BOBYQA port above.
# ---------------------------------------------------------------------------


class OptimizeSingleVariableFailure(Exception):
    """Mirrors dlib::optimize_single_variable_failure
    (optimization_line_search.h:552-554) — caught by the reference
    trainers, which then fall back to C=300."""


def _lagrange_poly_min_extrap(p1, p2, p3, f1, f2, f3):
    """optimization_line_search.h:239-277 (Ruszczynski §5.2 formula)."""
    temp1 = (f1 * (p3 * p3 - p2 * p2) + f2 * (p1 * p1 - p3 * p3)
             + f3 * (p2 * p2 - p1 * p1))
    temp2 = 2 * (f1 * (p3 - p2) + f2 * (p1 - p3) + f3 * (p2 - p1))
    if temp2 == 0:
        return p2
    result = temp1 / temp2
    if p1 <= result <= p3:
        return result
    return min(max(p1, result), p3)


def find_min_single_variable(f, starting_point, begin=-1e200, end=1e200,
                             eps=1e-3, max_iter=100,
                             initial_search_radius=1.0):
    """optimization_line_search.h:558-845.  Returns ``(x, fmin)`` (the
    reference mutates starting_point in place and returns fmin)."""
    if not (eps > 0 and max_iter > 1 and begin <= starting_point <= end
            and initial_search_radius > 0):
        raise ValueError("find_min_single_variable: invalid arguments")

    search_radius = initial_search_radius
    f_evals = 1

    if begin == end:
        return starting_point, f(starting_point)

    # starting set of 3 points inside [begin, end] (h:600-617)
    p1 = max(starting_point - search_radius, begin)
    p3 = min(starting_point + search_radius, end)
    f1 = f(p1)
    f3 = f(p3)
    if starting_point == p1 or starting_point == p3:
        p2 = (p1 + p3) / 2
        f2 = f(p2)
    else:
        p2 = starting_point
        f2 = f(starting_point)
    f_evals += 2

    # hunt for a bracketing set f1 > f2 < f3 (h:623-733)
    while not (f1 > f2 and f2 < f3):
        if f_evals >= max_iter:
            raise OptimizeSingleVariableFailure(
                "The max number of iterations of single variable "
                "optimization have been reached\nwithout converging.")
        if p3 - p1 < eps:
            if f1 < min(f2, f3):
                return p1, f1
            if f2 < min(f1, f3):
                return p2, f2
            return p3, f3

        if f1 == f2 and f1 < f3 and p1 != begin:
            p1 = max(p1 - search_radius, begin)
            f1 = f(p1)
            f_evals += 1
            search_radius *= 2
            continue
        if f2 == f3 and f3 < f1 and p3 != end:
            p3 = min(p3 + search_radius, end)
            f3 = f(p3)
            f_evals += 1
            search_radius *= 2
            continue

        if f1 <= f3:
            if p1 == begin or (f1 == f2 and (end - begin) < search_radius):
                p3 = p2
                f3 = f2
                p2 = (p1 + p2) / 2.0
                f2 = f(p2)
            else:
                p3 = p2
                f3 = f2
                p2 = p1
                f2 = f1
                p1 = max(p1 - search_radius, begin)
                f1 = f(p1)
                search_radius *= 2
        else:
            if p3 == end or (f2 == f3 and (end - begin) < search_radius):
                p1 = p2
                f1 = f2
                p2 = (p3 + p2) / 2.0
                f2 = f(p2)
            else:
                p1 = p2
                f1 = f2
                p2 = p3
                f2 = f3
                p3 = min(p3 + search_radius, end)
                f3 = f(p3)
                search_radius *= 2
        f_evals += 1

    # refine with Lagrange interpolation (h:736-830)
    tau = 0.1
    while f_evals < max_iter and p3 - p1 > eps:
        p_min = _lagrange_poly_min_extrap(p1, p2, p3, f1, f2, f3)

        if p_min < p2:
            min_dist = (p2 - p1) * tau
            if abs(p1 - p_min) < min_dist:
                p_min = p1 + min_dist
            elif abs(p2 - p_min) < min_dist:
                p_min = p2 - min_dist
        else:
            min_dist = (p3 - p2) * tau
            if abs(p2 - p_min) < min_dist:
                p_min = p2 + min_dist
            elif abs(p3 - p_min) < min_dist:
                p_min = p3 - min_dist

        bracket_ratio = abs(p1 - p2) / abs(p2 - p3)
        if not (bracket_ratio < 10 and bracket_ratio > 0.1):
            if bracket_ratio > 1 and p_min > p2:
                p_min = (p1 + p2) / 2
            elif p_min < p2:
                p_min = (p2 + p3) / 2

        f_min = f(p_min)

        if p_min < p2:
            if f1 > f_min and f_min < f2:
                p3 = p2
                f3 = f2
                p2 = p_min
                f2 = f_min
            else:
                p1 = p_min
                f1 = f_min
        else:
            if f2 > f_min and f_min < f3:
                p1 = p2
                f1 = f2
                p2 = p_min
                f2 = f_min
            else:
                p3 = p_min
                f3 = f_min
        f_evals += 1

    if f_evals >= max_iter:
        raise OptimizeSingleVariableFailure(
            "The max number of iterations of single variable optimization "
            "have been reached\nwithout converging.")
    return p2, f2


def find_max_single_variable(f, starting_point, begin=-1e200, end=1e200,
                             eps=1e-3, max_iter=100,
                             initial_search_radius=1.0):
    """optimization_line_search.h:859-869.  Returns ``(x, fmax)``."""
    x, fmin = find_min_single_variable(lambda v: -f(v), starting_point,
                                       begin, end, eps, max_iter,
                                       initial_search_radius)
    return x, -fmin
