// Differential probe for the OCA multiclass-SVM port
// (mitie_spark/models/oca.py).
//
// Runs the REFERENCE's own numeric machinery — dlib's oca solver,
// solve_qp_using_smo, structural_svm_problem::get_risk/optimization_status,
// cross_validate_multiclass_trainer, test_multiclass_decision_function and
// find_max_single_variable (the exact code ner_trainer.cpp:281-405 and
// text_categorizer_trainer.cpp:144-270 call) — on a deterministic
// synthetic multiclass sparse dataset and dumps every result as C99 hex
// doubles so the Python side can compare bit-for-bit.
//
// The ONE piece defined here rather than taken from the reference is
// seq_multiclass_problem: a mirror of multiclass_svm_problem
// (dlib/svm/svm_multiclass_linear_trainer.h:25-160, same PSI layout and
// separation oracle) deriving from the NON-threaded
// structural_svm_problem base.  The real trainer wraps the problem in
// structural_svm_problem_threaded, whose subgradient accumulation
// switches float-addition shapes on WALL-CLOCK timings
// (structural_svm_problem_threaded.h:114-137) — not bit-reproducible
// against itself, so the deterministic sequential shape (which is also
// the threaded wrapper's unbuffered path) is the differential target.
// Test scaffolding, same adjudication as probe_eval.cpp.
//
// Output, one line per event:
//   W <case> <hex ...>   final OCA weight vector ((dims+1)*K, row-major)
//   O <case> <hex>       returned objective value
//   V <r> <c> <count>    2-fold CV confusion-matrix entries (C=300)
//   E <Chex> <fhex>      tuning-objective evaluations in call order
//   T <Chex>             tuned C from find_max_single_variable
//
// The dataset is generated with a splitmix-style LCG mirrored in
// tests/test_cross_engine.py — keep the two in sync.
//
// Build (test fixture does this): g++ -O3 -I <refbuild>/dlib probe_multiclass.cpp

#include <dlib/svm.h>
#include <dlib/optimization.h>
#include <cstdio>
#include <map>
#include <vector>

using namespace dlib;
typedef std::vector<std::pair<unsigned long, double> > sv_t;
typedef matrix<double, 0, 1> w_type;

static unsigned long long lcg_state = 42;
static unsigned lcg_next()
{
    lcg_state = lcg_state * 6364136223846793005ULL + 1442695040888963407ULL;
    return (unsigned)(lcg_state >> 33);
}

// mirror of multiclass_svm_problem (svm_multiclass_linear_trainer.h:25-160)
// on the non-threaded structural_svm_problem base
struct seq_multiclass_problem : public structural_svm_problem<w_type, sv_t>
{
    seq_multiclass_problem (
        const std::vector<sv_t>& samples_,
        const std::vector<unsigned long>& labels_,
        const std::vector<unsigned long>& distinct_labels_,
        unsigned long dims_
    ) : samples(samples_), labels(labels_), distinct_labels(distinct_labels_),
        dims(dims_ + 1) // +1 for the bias
    {}

    virtual long get_num_dimensions () const
    { return dims*distinct_labels.size(); }

    virtual long get_num_samples () const
    { return static_cast<long>(samples.size()); }

    virtual void get_truth_joint_feature_vector (long idx, sv_t& psi) const
    {
        assign(psi, samples[idx]);
        psi.push_back(std::make_pair(dims-1, -1.0));
        long label_idx = 0;
        for (unsigned long i = 0; i < distinct_labels.size(); ++i)
        {
            if (distinct_labels[i] == labels[idx])
            {
                label_idx = i;
                break;
            }
        }
        offset_feature_vector(psi, dims*label_idx);
    }

    virtual void separation_oracle (
        const long idx,
        const w_type& current_solution,
        double& loss,
        sv_t& psi
    ) const
    {
        double best_val = -std::numeric_limits<double>::infinity();
        unsigned long best_idx = 0;
        for (unsigned long i = 0; i < distinct_labels.size(); ++i)
        {
            double temp = dot(mat(&current_solution(i*dims), dims-1), samples[idx])
                          - current_solution((i+1)*dims-1);
            if (labels[idx] != distinct_labels[i])
                temp += 1;
            if (temp > best_val)
            {
                best_val = temp;
                best_idx = i;
            }
        }
        assign(psi, samples[idx]);
        psi.push_back(std::make_pair(dims-1, -1.0));
        offset_feature_vector(psi, dims*best_idx);
        loss = (distinct_labels[best_idx] == labels[idx]) ? 0 : 1;
    }

private:
    void offset_feature_vector (sv_t& sample, const unsigned long val) const
    {
        if (val != 0)
            for (sv_t::iterator i = sample.begin(); i != sample.end(); ++i)
                i->first += val;
    }

    const std::vector<sv_t>& samples;
    const std::vector<unsigned long>& labels;
    const std::vector<unsigned long>& distinct_labels;
    const long dims;
};

// the svm_multiclass_linear_trainer::train flow
// (svm_multiclass_linear_trainer.h:315-410, no prior) over the
// deterministic problem; dumps the raw OCA weight vector when out_w != 0
struct seq_trainer
{
    typedef double scalar_type;
    typedef sv_t sample_type;
    typedef unsigned long label_type;
    typedef default_memory_manager mem_manager_type;
    typedef multiclass_linear_decision_function<sparse_linear_kernel<sv_t>, unsigned long>
        trained_function_type;

    double C;
    double eps;
    unsigned long max_iter;
    mutable w_type* out_w;
    mutable double* out_obj;

    seq_trainer(double C_, double eps_, unsigned long max_iter_)
        : C(C_), eps(eps_), max_iter(max_iter_), out_w(0), out_obj(0) {}

    trained_function_type train (
        const std::vector<sv_t>& all_samples,
        const std::vector<unsigned long>& all_labels
    ) const
    {
        trained_function_type df;
        df.labels = select_all_distinct_labels(all_labels);
        const long dims = max_index_plus_one(all_samples);

        w_type weights;
        seq_multiclass_problem problem(all_samples, all_labels, df.labels, dims);
        problem.set_max_cache_size(0);
        problem.set_c(C);
        problem.set_epsilon(eps);
        problem.set_max_iterations(max_iter);

        oca solver;
        double obj = solver(problem, weights);
        if (out_w) *out_w = weights;
        if (out_obj) *out_obj = obj;

        df.weights = colm(reshape(weights, df.labels.size(), dims+1), range(0, dims-1));
        df.b       = colm(reshape(weights, df.labels.size(), dims+1), dims);
        return df;
    }
};

// compute_fscore from ner_trainer.cpp:312-329 (same formula in
// text_categorizer_trainer.cpp:173-190)
static double compute_fscore(const matrix<double>& res,
                             unsigned long num_labels, double beta)
{
    double correct = sum(diag(subm(res, 0, 0, num_labels, num_labels)));
    double total_pred = sum(subm(res, 0, 0, res.nr(), num_labels));
    double total_truth = sum(subm(res, 0, 0, num_labels, res.nc()));
    double precision = correct/total_pred;
    double recall = correct/total_truth;
    return (1+beta*beta) * precision*recall/(beta*beta*precision + recall);
}

// the tuning objective (ner_trainer.cpp:281-310 /
// text_categorizer_trainer.cpp:144-170: CV trainer uses the DEFAULT
// epsilon 0.001, only set_c/set_max_iterations are called)
struct tune_objective
{
    const std::vector<sv_t>& samples;
    const std::vector<unsigned long>& labels;

    tune_objective(const std::vector<sv_t>& s, const std::vector<unsigned long>& l)
        : samples(s), labels(l) {}

    double operator()(const double C) const
    {
        seq_trainer trainer(C, 0.001, 2000);
        matrix<double> res = cross_validate_multiclass_trainer(trainer, samples, labels, 2);
        double score = compute_fscore(res, 3, 0.5);
        printf("E %a %a\n", C, score);
        return score;
    }
};

int main()
{
    // deterministic 3-class sparse dataset, mirrored in Python
    const int N = 24;
    std::vector<sv_t> samples;
    std::vector<unsigned long> labels;
    for (int i = 0; i < N; ++i)
    {
        unsigned long lab = i % 3;
        std::map<unsigned long, double> m;
        m[lab] = 2.0;
        for (int j = 0; j < 5; ++j)
        {
            unsigned long idx = 3 + lcg_next() % 37;
            double val = ((lcg_next() % 9) + 1) * 0.25;
            m[idx] += val;
        }
        samples.push_back(sv_t(m.begin(), m.end()));
        labels.push_back(lab);
    }

    // W/O: the full OCA solve at three (C, eps, max_iter) regimes
    const double cases[3][2] = { {300.0, 0.0001}, {1.0, 0.001}, {25.0, 0.001} };
    const unsigned long iters[3] = { 2000, 10000, 2000 };
    for (int t = 0; t < 3; ++t)
    {
        seq_trainer trainer(cases[t][0], cases[t][1], iters[t]);
        w_type w;
        double obj = 0;
        trainer.out_w = &w;
        trainer.out_obj = &obj;
        trainer.train(samples, labels);
        printf("W %d", t);
        for (long k = 0; k < w.size(); ++k)
            printf(" %a", w(k));
        printf("\nO %d %a\n", t, obj);
    }

    // V: dlib's real 2-fold cross_validate_multiclass_trainer at C=300
    {
        seq_trainer trainer(300.0, 0.001, 2000);
        matrix<double> res = cross_validate_multiclass_trainer(trainer, samples, labels, 2);
        for (long r = 0; r < res.nr(); ++r)
            for (long c = 0; c < res.nc(); ++c)
                printf("V %ld %ld %.0f\n", r, c, res(r, c));
    }

    // T: the find_max_single_variable C search (ner_trainer.cpp:375-397)
    {
        tune_objective obj(samples, labels);
        double C = 300;
        try
        {
            find_max_single_variable(obj, C, 0.01, 5000, 1, 100, 100);
        }
        catch (optimize_single_variable_failure&)
        {
            C = 300;
        }
        printf("T %a\n", C);
    }

    return 0;
}
