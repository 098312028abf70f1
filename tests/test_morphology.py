"""approximate_substring_set (T7) + morphology (T8) port tests."""

import numpy as np

from mitie_spark.functions.morphology import (
    ApproximateSubstringSet,
    MorphologyFeatureExtractor,
)


def test_add_and_find_basic():
    s = ApproximateSubstringSet()
    id_ing = s.add_substring("ing*")  # suffix
    id_un = s.add_substring("*un")  # prefix
    id_ss = s.add_substring("ss")  # internal
    hits = s.find_substrings("unkissing")
    assert id_un in hits
    assert id_ss in hits
    assert id_ing in hits
    assert not s.find_substrings("xyz")


def test_boundary_markers_respected():
    s = ApproximateSubstringSet()
    id_suffix = s.add_substring("ed*")
    assert id_suffix in s.find_substrings("jumped")
    # 'ed' not at the end must NOT match the 'ed*' pattern
    assert id_suffix not in s.find_substrings("editor")


def test_multiple_occurrences_reported_each_time():
    # reference quirk: hits are per-occurrence, not a set (h:90-142)
    s = ApproximateSubstringSet()
    id_ab = s.add_substring("ab")
    hits = s.find_substrings("abab")
    assert hits.count(id_ab) == 2


def test_truncation_at_49_chars():
    s = ApproximateSubstringSet()
    id_z = s.add_substring("zz")
    long_word = "a" * 60 + "zz"
    assert id_z not in s.find_substrings(long_word)  # beyond the 49-byte cap
    assert id_z in s.find_substrings("a" * 40 + "zz")


def test_overwrite_semantics():
    # later add_substring wins hash-bucket collisions (h:56-88); with 8192
    # buckets two random strings rarely collide, so just assert both findable
    s = ApproximateSubstringSet()
    a = s.add_substring("foo")
    b = s.add_substring("bar")
    assert a in s.find_substrings("foods")
    assert b in s.find_substrings("rebar")


def test_morphology_feature_extractor():
    s = ApproximateSubstringSet()
    hid = s.add_substring("ing*")
    trans = np.zeros((8192, 4), dtype=np.float32)
    trans[hid] = [1.0, 2.0, 3.0, 4.0]
    m = MorphologyFeatureExtractor(s, trans)
    # CASE-SENSITIVE like the reference (no tolower anywhere in the
    # word_morphology_feature_extractor path): the upper-case query must
    # miss, the exact-case one must hit
    assert np.allclose(m.get_feature_vector("RUNNING"), [0, 0, 0, 0])
    v = m.get_feature_vector("running")
    assert np.allclose(v, [1, 2, 3, 4])
    assert np.allclose(m.get_feature_vector("runner"), 0)
