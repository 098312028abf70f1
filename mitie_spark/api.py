"""Drop-in-style API mirroring the reference's Python binding surface.

Function/class names and call shapes follow /root/reference/mitielib/mitie.py
(§2.7 of SURVEY.md) so a user of the reference can switch with minimal edits:

- ``tokenize`` / ``tokenize_with_offsets``  (mitie.py:210-247)
- ``load_entire_file``                       (mitie.py:200-207)
- ``named_entity_extractor``                 (mitie.py:250-358)
- ``extract_binary_relation`` + ``binary_relation_detector`` (mitie.py:317-420)
- ``text_categorizer``                       (mitie.py:723-779)
- ``total_word_feature_extractor``           (mitie.py:844-905)

Model files are this repo's ``.npz`` artifacts (the reference's dlib binary
blobs require the non-vendored C library to read). Behavioral notes:
- ``extract_entities`` returns (range, tag, score) triples like the binding;
- ``extract_binary_relation`` follows the **C++ example semantics** (no
  ±5-token window crop): the golden relations file was produced by the C++
  path (SURVEY.md §2.3 M3 note), so that is the parity-relevant variant.
"""

from __future__ import annotations

import os

from mitie_spark.functions.tokenizer import tokenize, tokenize_with_offsets  # noqa: F401
from mitie_spark.models.train import ARTIFACT_DIR


def load_entire_file(filename: str) -> str:
    """mitie.py:200-207."""
    with open(filename, "rb") as f:
        return f.read().decode("utf-8", errors="replace")


class named_entity_extractor:
    """mitie.py:250-358 — extract_entities over token lists."""

    def __init__(self, filename: str | None = None):
        from mitie_spark.models.ner_model import NerModel

        self._model = NerModel.load(
            filename or os.path.join(ARTIFACT_DIR, "ner_model.npz")
        )

    def get_possible_ner_tags(self) -> list[str]:
        return list(self._model.tags)

    def extract_entities(self, tokens: list[str]):
        """→ [(range, tag, score)] with range = python range object, exactly
        like the binding (mitie.py:299-315)."""
        return [
            (range(s, e), tag, score)
            for s, e, tag, score in self._model.extract_entities(list(tokens))
        ]

    def extract_binary_relation(self, tokens, arg1_range, arg2_range):
        """→ a ``binary_relation`` carrying the pair context (C++ example
        semantics: full token sequence, no window crop)."""
        return binary_relation(
            list(tokens),
            (arg1_range.start, arg1_range.stop),
            (arg2_range.start, arg2_range.stop),
        )


class binary_relation:
    """Opaque candidate-pair container (mitie.py:361-372 analog)."""

    def __init__(self, tokens, arg1, arg2):
        self.tokens = tokens
        self.arg1 = arg1
        self.arg2 = arg2


class binary_relation_detector:
    """mitie.py:374-420 — score > 0 ⇒ relation holds."""

    def __init__(self, filename: str | None = None, name: str | None = None):
        from mitie_spark.models.relation_model import RelationModel

        self._model = RelationModel.load(
            filename or os.path.join(ARTIFACT_DIR, "relation_model.npz")
        )
        self.name = name or self._model.preds[0]
        self._idx = self._model.preds.index(self.name)

    def __call__(self, relation: binary_relation) -> float:
        s = self._model.scores(
            relation.tokens, None, relation.arg1, relation.arg2
        )
        return float(s[self._idx])


class text_categorizer:
    """mitie.py:723-779 — __call__(tokens) -> (label, score)."""

    def __init__(self, filename: str | None = None):
        from mitie_spark.models.text_categorizer import TextCategorizer

        self._model = TextCategorizer.load(
            filename or os.path.join(ARTIFACT_DIR, "text_categorizer.npz")
        )

    def __call__(self, tokens: list[str]):
        return self._model(list(tokens))


class total_word_feature_extractor:
    """mitie.py:844-905 — per-word feature vectors + fingerprint."""

    def __init__(self, filename: str):
        from mitie_spark.models.word_vectors import WordVectors

        self._wv = WordVectors.load(filename)

    @property
    def num_dimensions(self) -> int:
        return self._wv.dims

    @property
    def fingerprint(self) -> int:
        import zlib

        return zlib.crc32(self._wv.core.tobytes())

    def get_feature_vector(self, word: str):
        return self._wv.get_feature_vector(word)

    def get_words_in_dictionary(self) -> list[str]:
        return list(self._wv.words)
