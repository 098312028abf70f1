// Differential probe for the BOBYQA port (mitie_spark/models/bobyqa.py).
//
// Runs the REFERENCE's own optimizer (dlib/optimization/optimization_bobyqa.h,
// the exact code ner_trainer.cpp:552 and
// binary_relation_detector_trainer.cpp:217 call) on a fixed suite of
// deterministic objectives and dumps EVERY objective evaluation plus the
// final iterate as C99 hex doubles ("%a"), so the Python side can compare
// the full iterate trajectory bit-for-bit.
//
// Output, one line per event:
//   C <case> <n> <npt> <rhobeg> <rhoend> <maxfun> <mode>   (config; hex rho)
//   B <case> <x0...> <lo...> <hi...>                       (hex start/bounds)
//   E <case> <nf> <x...> <f>                               (hex evaluation)
//   R <case> <x...> <f>                                    (hex result)
//   X <case> <what>                                        (bobyqa_failure)
//
// Build (test fixture does this): g++ -O3 -I <refbuild> probe_bobyqa.cpp
// — header-only, same -O3/no-FMA float contract as libmitie.so.

#include <dlib/optimization.h>
#include <cstdio>
#include <cmath>
#include <cstdint>
#include <string>
#include <vector>

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

// ---------------------------------------------------------------------------
// objectives — each implemented with IDENTICAL operation order in
// tests/test_cross_engine.py (the Python twin)
// ---------------------------------------------------------------------------

struct quad_obj {
    double operator()(const col& v) const {
        double f = (v(0) - 1.7) * (v(0) - 1.7)
                 + 2.3 * (v(1) + 0.4) * (v(1) + 0.4)
                 + 0.5 * v(0) * v(1);
        log_eval(v, f);
        return f;
    }
};

struct rosen_obj {
    double operator()(const col& v) const {
        double f = 100.0 * (v(1) - v(0) * v(0)) * (v(1) - v(0) * v(0))
                 + (1.0 - v(0)) * (1.0 - v(0));
        log_eval(v, f);
        return f;
    }
};

// the ner_trainer's search shape: smooth unimodal surface over (C, loss*10)
struct nerlike_obj {
    double operator()(const col& v) const {
        double f = -((v(0) - 37.0) * (v(0) - 37.0) / 500.0
                     + (v(1) - 55.0) * (v(1) - 55.0) / 800.0);
        log_eval(v, f);
        return f;
    }
};

// CV-recall-like plateaus: piecewise-constant (exactly representable steps)
struct step_obj {
    double operator()(const col& v) const {
        double f = std::floor(v(0) / 10.0) * 0.125
                 + std::floor(v(1) / 20.0) * 0.0625;
        log_eval(v, f);
        return f;
    }
};

// constant objective — the trajectory is pure trust-region geometry
struct const_obj {
    double operator()(const col& v) const {
        double f = 1.0;
        log_eval(v, f);
        return f;
    }
};

// deterministic integer-hash noise (splitmix64 on quantized coords):
// exactly reproducible across languages, hostile to the quadratic model —
// exercises the cancellation/RESCUE machinery
static uint64_t splitmix64(uint64_t z)
{
    z += 0x9e3779b97f4a7c15ULL;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
}

struct noise_obj {
    uint64_t seed;
    double operator()(const col& v) const {
        uint64_t h = seed;
        for (long i = 0; i < v.size(); ++i) {
            double q = std::floor(v(i) * 4096.0);
            h = splitmix64(h ^ (uint64_t)(int64_t)q);
        }
        // base bowl + lattice noise, both exact-order
        double f = (v(0) - 0.3) * (v(0) - 0.3) + (v(1) + 0.2) * (v(1) + 0.2);
        f = f + (double)(h >> 40) * 0x1p-30;
        log_eval(v, f);
        return f;
    }
};

// 3-D bowl for the npt=(n+1)(n+2)/2 prelim branch
struct bowl3_obj {
    double operator()(const col& v) const {
        double f = (v(0) - 0.9) * (v(0) - 0.9)
                 + 1.7 * (v(1) + 1.1) * (v(1) + 1.1)
                 + 0.3 * (v(2) - 2.2) * (v(2) - 2.2)
                 + 0.25 * v(0) * v(2);
        log_eval(v, f);
        return f;
    }
};

// ---------------------------------------------------------------------------

static col mkcol(const std::vector<double>& v)
{
    col c(v.size());
    for (size_t i = 0; i < v.size(); ++i) c(i) = v[i];
    return c;
}

template <typename F>
static void run_case(const char* name, F f, bool maximize,
                     std::vector<double> x0, std::vector<double> lo,
                     std::vector<double> hi, long npt, double rhobeg,
                     double rhoend, long maxfun)
{
    g_case = name;
    g_nf = 0;
    std::printf("C %s %zu %ld %a %a %ld %s\n", name, x0.size(), npt,
                rhobeg, rhoend, maxfun, maximize ? "max" : "min");
    std::printf("B %s", name);
    for (double v : x0) std::printf(" %a", v);
    for (double v : lo) std::printf(" %a", v);
    for (double v : hi) std::printf(" %a", v);
    std::printf("\n");
    col x = mkcol(x0), l = mkcol(lo), u = mkcol(hi);
    try {
        double fv = maximize
            ? dlib::find_max_bobyqa(f, x, npt, l, u, rhobeg, rhoend, maxfun)
            : dlib::find_min_bobyqa(f, x, npt, l, u, rhobeg, rhoend, maxfun);
        std::printf("R %s", name);
        for (long i = 0; i < x.size(); ++i) std::printf(" %a", x(i));
        std::printf(" %a\n", fv);
    } catch (dlib::bobyqa_failure&) {
        std::printf("X %s failure\n", name);
    }
}

// --------------------------------------------------------------------------
// find_max_single_variable — the classifier-C search
// (ner_trainer.cpp:381-395, text_categorizer_trainer.cpp:254-268)
// --------------------------------------------------------------------------

struct sv_obj {
    int kind;
    double operator()(double c) const {
        double f;
        if (kind == 0) f = 1.0;                                   // constant
        else if (kind == 1) f = -(c - 731.0) * (c - 731.0) / 1e6; // smooth
        else f = std::floor(c / 250.0) * 0.0625;                  // plateaus
        col v(1);
        v(0) = c;
        log_eval(v, f);
        return f;
    }
};

static void run_sv_case(const char* name, int kind, double start, double lo,
                        double hi, double eps, long max_iter, double radius)
{
    g_case = name;
    g_nf = 0;
    std::printf("C %s 1 0 %a %a %ld sv\n", name, radius, eps, max_iter);
    std::printf("B %s %a %a %a\n", name, start, lo, hi);
    double x = start;
    sv_obj f = {kind};
    try {
        double fv = dlib::find_max_single_variable(f, x, lo, hi, eps,
                                                   max_iter, radius);
        std::printf("R %s %a %a\n", name, x, fv);
    } catch (dlib::optimize_single_variable_failure&) {
        std::printf("X %s failure\n", name);
    }
}

int main()
{
    // 1-2: generic minimizations
    run_case("quad", quad_obj(), false, {0.0, 0.0}, {-10.0, -10.0},
             {10.0, 10.0}, 5, 2.0, 1e-8, 200);
    run_case("rosen", rosen_obj(), false, {-1.2, 1.0}, {-5.0, -5.0},
             {5.0, 5.0}, 5, 0.5, 1e-10, 1000);

    // 3-5: the EXACT ner_trainer.cpp:535-552 calling convention
    // (start (C=20, loss*10=30), bounds (0.1,10)-(100,100), npt=2n+1,
    // rhobeg=15, rhoend=1, maxfun=100, maximize)
    run_case("ner_smooth", nerlike_obj(), true, {20.0, 30.0}, {0.1, 10.0},
             {100.0, 100.0}, 5, 15.0, 1.0, 100);
    run_case("ner_step", step_obj(), true, {20.0, 30.0}, {0.1, 10.0},
             {100.0, 100.0}, 5, 15.0, 1.0, 100);
    run_case("ner_const", const_obj(), true, {20.0, 30.0}, {0.1, 10.0},
             {100.0, 100.0}, 5, 15.0, 1.0, 100);

    // 6: the binary_relation_detector_trainer.cpp:198-218 convention for
    // N=14 samples: log-space start/bounds, derived rho (computed HERE so
    // both engines consume the identical doubles via the B line)
    {
        double N = 14.0;
        std::vector<double> x0 = {std::log(5000.0 / N), std::log(5000.0 / N)};
        std::vector<double> lo = {std::log(1.0 / N), std::log(1.0 / N)};
        std::vector<double> hi = {std::log(100000.0 / N), std::log(100000.0 / N)};
        double rho_begin = (hi[0] - lo[0] < hi[1] - lo[1] ? hi[0] - lo[0]
                                                          : hi[1] - lo[1]) * 0.15;
        double rho_end = std::log(1.2 / N) - std::log(1.0 / N);
        run_case("rel_smooth", nerlike_obj(), true, x0, lo, hi, 5,
                 rho_begin, rho_end, 200);
    }

    // 7-9: hostile lattice noise (three seeds) — drives the denominator /
    // RESCUE safeguards
    run_case("noise1", noise_obj{1}, false, {0.0, 0.0}, {-3.0, -3.0},
             {3.0, 3.0}, 5, 1.0, 1e-9, 400);
    run_case("noise2", noise_obj{2}, false, {0.5, -0.5}, {-3.0, -3.0},
             {3.0, 3.0}, 5, 1.0, 1e-9, 400);
    run_case("noise3", noise_obj{3}, false, {-1.0, 1.0}, {-3.0, -3.0},
             {3.0, 3.0}, 5, 1.0, 1e-9, 400);

    // 10: bound-active optimum (unconstrained minimum outside the box)
    run_case("active", quad_obj(), false, {-5.0, -1.0}, {-10.0, -10.0},
             {0.0, 0.0}, 5, 2.0, 1e-8, 200);

    // 11: maxfun exhaustion → bobyqa_failure on both engines
    run_case("budget", rosen_obj(), false, {-1.2, 1.0}, {-5.0, -5.0},
             {5.0, 5.0}, 5, 0.5, 1e-13, 12);

    // 14-17: the EXACT ner classifier / text-categorizer C-search
    // convention: find_max_single_variable(obj, 300, 0.01, 5000, 1, 100,
    // 100) over constant / smooth / plateaued objectives, plus one smooth
    // minimize with default-ish args
    run_sv_case("sv_const", 0, 300.0, 0.01, 5000.0, 1.0, 100, 100.0);
    run_sv_case("sv_smooth", 1, 300.0, 0.01, 5000.0, 1.0, 100, 100.0);
    run_sv_case("sv_step", 2, 300.0, 0.01, 5000.0, 1.0, 100, 100.0);
    run_sv_case("sv_tight", 1, 10.0, 0.01, 5000.0, 1e-6, 100, 1.0);

    // 12-13: n=3 — full npt=(n+1)(n+2)/2 prelim branch and npt=2n+1
    run_case("bowl3_full", bowl3_obj(), false, {0.0, 0.0, 0.0},
             {-6.0, -6.0, -6.0}, {6.0, 6.0, 6.0}, 10, 1.0, 1e-9, 500);
    run_case("bowl3_2n1", bowl3_obj(), false, {0.0, 0.0, 0.0},
             {-6.0, -6.0, -6.0}, {6.0, 6.0, 6.0}, 7, 1.0, 1e-9, 500);

    return 0;
}
