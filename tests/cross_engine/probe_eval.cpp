// Cross-engine CoNLL eval probe: load a ner_model.dat, parse a CoNLL-2003
// file with the reference's own parser, run the reference's own
// evaluate_named_entity_recognizer, print exact metrics.
#include <mitie/named_entity_extractor.h>
#include <mitie/ner_trainer.h>
#include <mitie/conll_parser.h>
#include <dlib/serialize.h>
#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

using namespace mitie;

int main(int argc, char** argv) {
    if (argc != 3) {
        std::fprintf(stderr, "usage: probe_eval ner_model.dat data.conll\n");
        return 1;
    }
    std::ifstream fin(argv[1], std::ios::binary);
    std::string classname;
    dlib::deserialize(classname, fin);
    named_entity_extractor ner;
    deserialize(ner, fin);  // ADL finds the mitie:: friend overload

    std::vector<std::vector<std::string> > sentences;
    std::vector<std::vector<std::pair<unsigned long, unsigned long> > > chunks;
    std::vector<std::vector<std::string> > labels;
    parse_conll_data(argv[2], sentences, chunks, labels);
    std::printf("sentences %lu\n", (unsigned long)sentences.size());

    ner_eval_metrics m = evaluate_named_entity_recognizer(ner, sentences, chunks, labels);
    for (unsigned long i = 0; i < m.per_label_metrics.size(); ++i) {
        std::printf("LABEL %s %.17g %.17g\n", m.per_label_metrics[i].label.c_str(),
                    m.per_label_metrics[i].precision, m.per_label_metrics[i].recall);
    }
    std::printf("OVERALL %.17g %.17g\n", m.overall_precision, m.overall_recall);
    return 0;
}
