// Direct differential probe for the RESCUE subroutine of the reference's
// BOBYQA (optimization_bobyqa.h:2020-2633).  RESCUE is a rounding-damage
// safeguard that Powell himself documents as "not invoked in most
// applications"; no public-API objective we found triggers it, so this
// probe drives the private member directly on a crafted deterministic
// model state and dumps EVERY array it mutates in hex, giving the Python
// port (mitie_spark/models/bobyqa.py::_rescue) full differential coverage.
//
// `#define private public` is test scaffolding confined to this probe —
// the production path never touches reference internals.
//
// Output: "E ..." objective evaluations (shared format with
// probe_bobyqa.cpp), then "A <name> <hex...>" per output array, then
// "S <nf> <kopt>".

// pre-include every std header dlib pulls in, so `private public` only
// affects dlib itself (include guards make the second inclusion a no-op)
#include <cstdio>
#include <cmath>
#include <cstdint>
#include <vector>
#include <sstream>
#include <iostream>
#include <fstream>
#include <string>
#include <algorithm>
#include <memory>
#include <complex>
#include <limits>
#include <iomanip>
#include <cstring>
#include <stdexcept>
#include <map>
#include <set>

#define private public
#include <dlib/optimization.h>
#undef private

using dlib::matrix;
typedef matrix<double, 0, 1> col;

static int g_nf = 0;
static const char* g_case = "";

static void log_eval(const col& x, double f)
{
    ++g_nf;
    std::printf("E %s %d", g_case, g_nf);
    for (long i = 0; i < x.size(); ++i) std::printf(" %a", x(i));
    std::printf(" %a\n", f);
}

struct rescue_calfun {
    double operator()(const col& v) const {
        double f = (v(0) - 0.25) * (v(0) - 0.25)
                 + 3.0 * (v(1) + 0.75) * (v(1) + 0.75);
        log_eval(v, f);
        return f;
    }
};

static uint64_t splitmix64(uint64_t z)
{
    z += 0x9e3779b97f4a7c15ULL;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
}

// deterministic value in [0,1) from an integer tag — exactly reproducible
// in Python (24-bit mantissa, exact scale)
static double unit(uint64_t tag)
{
    return (double)(splitmix64(tag) >> 40) * 0x1p-24;
}

static void dump(const char* cs, const char* name, const double* a, int len)
{
    std::printf("A %s %s", cs, name);
    for (int i = 0; i < len; ++i) std::printf(" %a", a[i]);
    std::printf("\n");
}

// variant 1: generic mid-run state (originals all reinstated, no calfun)
// variant 2: duplicate interpolation points — degenerate denominators force
//            provisional points to survive and be evaluated via CALFUN
static void run_variant(int variant)
{
    const char* cs = variant == 1 ? "rescue1" : "rescue2";
    g_case = cs;
    g_nf = 0;
    const long n = 2, npt = 5, ndim = npt + n, nptm = npt - n - 1;
    const long maxfun = 50;
    long nf = 9;           // pretend 9 evaluations already happened
    long kopt = 3;
    const double delta = 0.25;

    // crafted state (all tags disjoint): a plausible mid-run model
    double xl[n], xu[n], xbase[n], xopt[n], gopt[n], sl[n], su[n];
    double fval[npt], pq[npt], ptsid_[npt];
    double hq[n * (n + 1) / 2];
    double xpt[npt * n], bmat[ndim * n], zmat[npt * nptm];
    double vlag[ndim], ptsaux[2 * n], w[ndim + npt];

    for (long j = 0; j < n; ++j) {
        xl[j] = -10.0;
        xu[j] = 10.0;
        xbase[j] = unit(100 + j) - 0.5;
        xopt[j] = (unit(200 + j) - 0.5) * 0.5;
        gopt[j] = (unit(300 + j) - 0.5) * 4.0;
        sl[j] = xl[j] - xbase[j];
        su[j] = xu[j] - xbase[j];
    }
    for (long k = 0; k < npt; ++k) {
        fval[k] = unit(400 + k) * 10.0;
        pq[k] = (unit(500 + k) - 0.5) * 2.0;
        for (long j = 0; j < n; ++j)
            xpt[k + j * npt] = (unit(600 + k * 7 + j) - 0.5) * 0.8;
    }
    fval[kopt - 1] = -1.0;  // make KOPT the genuine minimum
    for (long j = 0; j < n; ++j)   // XPT(KOPT,:) equals XOPT, as in a real run
        xpt[(kopt - 1) + j * npt] = xopt[j];
    if (variant == 2) {
        // collapse every non-KOPT point onto one location: reinstating an
        // original then gives a degenerate denominator, so RESCUE keeps
        // provisional points and must call CALFUN for them
        for (long k = 0; k < npt; ++k)
            if (k != kopt - 1)
                for (long j = 0; j < n; ++j)
                    xpt[k + j * npt] = xopt[j] + (j == 0 ? 0.0078125 : -0.015625);
    }
    for (long i = 0; i < n * (n + 1) / 2; ++i)
        hq[i] = (unit(700 + i) - 0.5) * 1.5;
    for (long i = 0; i < ndim * n; ++i)
        bmat[i] = (unit(800 + i) - 0.5) * 1.2;
    for (long i = 0; i < npt * nptm; ++i)
        zmat[i] = (unit(900 + i) - 0.5) * 1.1;
    for (long i = 0; i < ndim; ++i) vlag[i] = 0.0;
    for (long i = 0; i < 2 * n; ++i) ptsaux[i] = 0.0;
    for (long i = 0; i < npt; ++i) ptsid_[i] = 0.0;
    for (long i = 0; i < ndim + npt; ++i) w[i] = 0.0;

    dlib::bobyqa_implementation impl;
    impl.rescue_(rescue_calfun(), n, npt, xl, xu, maxfun, xbase, xpt, fval,
                 xopt, gopt, hq, pq, bmat, zmat, ndim, sl, su, nf, delta,
                 kopt, vlag, ptsaux, ptsid_, w);

    dump(cs, "xbase", xbase, n);
    dump(cs, "xpt", xpt, npt * n);
    dump(cs, "fval", fval, npt);
    dump(cs, "xopt", xopt, n);
    dump(cs, "gopt", gopt, n);
    dump(cs, "hq", hq, n * (n + 1) / 2);
    dump(cs, "pq", pq, npt);
    dump(cs, "bmat", bmat, ndim * n);
    dump(cs, "zmat", zmat, npt * nptm);
    dump(cs, "sl", sl, n);
    dump(cs, "su", su, n);
    std::printf("S %s %ld %ld\n", cs, nf, kopt);
}

int main()
{
    run_variant(1);
    run_variant(2);
    return 0;
}
