"""mitie_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of the reference information-extraction stack
(mit-nlp/MITIE, surveyed in SURVEY.md) as an idiomatic Spark pipeline:
DataFrames + Arrow-vectorized pandas UDFs end-to-end, models as broadcast
NumPy arrays, stage boundaries as partitioned parquet tables.

Layout
------
- functions/   scalar/vectorized text functions (tokenizer, stemmer, hashing,
               morphology, html→text, quality/lang-id)
- models/      trainable model containers (word vectors, NER, relations)
- operators/   DataFrame-level operators (NER, relations, linking, dedup,
               similarity search, multimodal plumbing)
- sources/     readers/writers (pages table, CoNLL, gigaword-style XML)
- plans/       end-to-end pipeline with lineage/checkpoint/resume
- streaming/   structured-streaming variant of the ner_stream entry point
"""

__version__ = "0.1.0"
