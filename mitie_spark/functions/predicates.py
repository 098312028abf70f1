"""ASCII string shape predicates (T5) — port of the reference's byte-exact
rules (/root/reference/mitielib/src/ner_feature_extraction.cpp:70-145).

All predicates are ASCII-only by design (the reference compares raw bytes
against 'A'-'Z' etc.); multibyte UTF-8 characters count as "not a letter",
exactly as in the C++. Note two reference quirks preserved here:
- ``is_all_caps("") == True`` and ``is_all_numbers("") == True`` (vacuous
  loops over an empty word);
- ``caps_pattern`` ORs every position into the same bit (cpp:148-163 sets
  ``val |= 1`` four times — so the hash only distinguishes "any caps among
  the four probe positions" from "none"; we replicate, not repair).
"""

from __future__ import annotations

from mitie_spark.functions.hashing import murmur_hash3_128_u64x3


def is_caps(word: str) -> bool:
    return bool(word) and "A" <= word[0] <= "Z"


def is_all_caps(word: str) -> bool:
    return all("A" <= c <= "Z" for c in word)


def contains_numbers(word: str) -> bool:
    return any("0" <= c <= "9" for c in word)


def contains_letters(word: str) -> bool:
    return any("a" <= c <= "z" or "A" <= c <= "Z" for c in word)


def contains_letters_and_numbers(word: str) -> bool:
    return contains_letters(word) and contains_numbers(word)


def is_all_numbers(word: str) -> bool:
    return all("0" <= c <= "9" for c in word)


def contains_hyphen(word: str) -> bool:
    return "-" in word


def alternating_caps_in_middle(word: str) -> bool:
    for i in range(1, len(word)):
        if ("A" <= word[i] <= "Z") and not ("A" <= word[i - 1] <= "Z"):
            return True
    return False


def caps_pattern(words: list[str], start: int, end: int) -> tuple[int, int]:
    """cpp:148-163 — hash of whether any of {prev word, first, last, next
    word} starts with a capital (all probes OR into bit 0, reference quirk)."""
    val = 0
    if start != 0 and is_caps(words[start - 1]):
        val |= 1
    if is_caps(words[start]):
        val |= 1
    if is_caps(words[end - 1]):
        val |= 1
    if end < len(words) and is_caps(words[end]):
        val |= 1
    return murmur_hash3_128_u64x3(val, 12345, 5739453)
