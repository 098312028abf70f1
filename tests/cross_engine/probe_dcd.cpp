// Differential probe for the DCD-trainer port (mitie_spark/models/dcd.py).
//
// Runs the REFERENCE's own components — dlib::rand, randomize_samples,
// svm_c_linear_dcd_trainer, cross_validate_trainer_threaded (the exact
// code binary_relation_detector_trainer.cpp:155-232 calls) — on a
// deterministic synthetic sparse dataset and dumps every result as C99
// hex doubles so the Python side can compare bit-for-bit.
//
// Output, one line per event:
//   R <12 uint32>                 first post-prime draws of a default rand
//   P <30 ints>                   randomize_samples permutation of 0..29
//   D <case> <b> <idx:val ...>    DCD decision function (basis is dense-
//                                 in-sparse: every index 0..dims-1)
//   C <pos_acc> <neg_acc>         6-fold CV result (the single-threaded
//                                 cross_validate_trainer — same fold
//                                 composition and fold-order sum as the
//                                 threaded variant MITIE calls, which
//                                 needs dlib's compiled thread pool; the
//                                 threaded path is covered end-to-end
//                                 through libmitie in the tuned test)
//
// The dataset is generated with a splitmix-style LCG mirrored in
// tests/test_cross_engine.py — keep the two in sync.
//
// Build (test fixture does this): g++ -O3 -I <refbuild>/dlib probe_dcd.cpp

#include <dlib/svm.h>
#include <dlib/rand.h>
#include <cstdio>
#include <map>
#include <vector>

using namespace dlib;
typedef std::vector<std::pair<unsigned long, double> > sv_t;

static unsigned long long lcg_state = 42;
static unsigned lcg_next()
{
    lcg_state = lcg_state * 6364136223846793005ULL + 1442695040888963407ULL;
    return (unsigned)(lcg_state >> 33);
}

int main()
{
    // R: the raw random stream (pins the MT19937 + 10000-draw priming)
    {
        dlib::rand r;
        printf("R");
        for (int i = 0; i < 12; ++i)
            printf(" %u", (unsigned)r.get_random_32bit_number());
        printf("\n");
    }

    // deterministic, slightly noisy, linearly-mostly-separable dataset
    const int N = 30, DIMS = 60;
    std::vector<sv_t> samples;
    std::vector<double> labels;
    for (int i = 0; i < N; ++i)
    {
        int label = (i % 2 == 0) ? +1 : -1;
        std::map<unsigned long, double> m;
        m[label > 0 ? 0 : 1] = 1.0; // planted signal
        for (int k = 0; k < 7; ++k)
        {
            unsigned long idx = 2 + lcg_next() % (DIMS - 2);
            double val = ((lcg_next() % 9) + 1) * 0.25;
            m[idx] += val;
        }
        if (i % 7 == 0)
            label = -label; // label noise: exercises bound alphas + shrink
        sv_t s(m.begin(), m.end());
        samples.push_back(s);
        labels.push_back(label);
    }

    // P: randomize_samples permutation (svm.h:995-1032, default rand)
    {
        std::vector<int> ids(N), dummy(N, 0);
        for (int i = 0; i < N; ++i)
            ids[i] = i;
        randomize_samples(ids, dummy);
        printf("P");
        for (int i = 0; i < N; ++i)
            printf(" %d", ids[i]);
        printf("\n");
    }

    // D: the DCD solve at several (C1, C2) — covers interior, clamped and
    // asymmetric-C regimes
    const double Cs[3][2] = {{1.0, 1.0}, {0.3, 2.0}, {25.0, 0.05}};
    for (int t = 0; t < 3; ++t)
    {
        svm_c_linear_dcd_trainer<sparse_linear_kernel<sv_t> > trainer;
        trainer.set_c_class1(Cs[t][0]);
        trainer.set_c_class2(Cs[t][1]);
        decision_function<sparse_linear_kernel<sv_t> > df =
            trainer.train(samples, labels);
        printf("D %d %a", t, df.b);
        const sv_t& bv = df.basis_vectors(0);
        for (sv_t::const_iterator p = bv.begin(); p != bv.end(); ++p)
            printf(" %lu:%a", p->first, p->second);
        printf("\n");
    }

    // C: the 6-fold CV (svm.h:408-540; identical fold composition and
    // fold-order sum to the threaded variant at svm_threaded.h:87-238)
    {
        svm_c_linear_dcd_trainer<sparse_linear_kernel<sv_t> > trainer;
        trainer.set_c_class1(0.8);
        trainer.set_c_class2(1.7);
        matrix<double> res =
            cross_validate_trainer(trainer, samples, labels, 6);
        printf("C %a %a\n", res(0), res(1));
    }
    return 0;
}
