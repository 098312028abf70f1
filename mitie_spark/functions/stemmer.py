"""Porter stemmer — literal port of the reference's thread-safe ANSI C
implementation (T4).

Reference: /root/reference/mitielib/src/stem.c (Porter's own Release 2 coding
of Porter 1980, including both --DEPARTURE-- points: the `bli`→`ble` rule in
step 2 replacing the published `abli`→`able`, the extra `logi`→`log` rule,
and the k<=1 early-out) and the wrapper /root/reference/mitielib/src/
stemmer.cpp:23-35 (lowercase first, stem in place, truncate).

The port keeps the C structure (buffer b, end offset k, general offset j)
so every rule can be checked line-by-line against the C.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


class _Stemmer:
    __slots__ = ("b", "k", "j")

    def __init__(self, word: str) -> None:
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    # cons(z, i)  — stem.c:98-104
    def cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    # m(z) — stem.c:117-141
    def m(self) -> int:
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    # vowelinstem(z) — stem.c:145-150
    def vowelinstem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    # doublec(z, j) — stem.c:154-160
    def doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    # cvc(z, i) — stem.c:171-177
    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    # ends(z, s) — stem.c:181-190
    def ends(self, s: str) -> bool:
        length = len(s)
        if length > self.k + 1:
            return False
        if self.b[self.k - length + 1 : self.k + 1] != list(s):
            return False
        self.j = self.k - length
        return True

    # setto(z, s) — stem.c:195-200
    def setto(self, s: str) -> None:
        j = self.j
        self.b[j + 1 : j + 1 + len(s)] = list(s)
        self.k = j + len(s)

    # r(z, s) — stem.c:204
    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    # step1ab — stem.c:228-250
    def step1ab(self) -> None:
        b = self.b
        if b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowelinstem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                self.k -= 1
                if b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    # step1c — stem.c:254-257
    def step1c(self) -> None:
        if self.ends("y") and self.vowelinstem():
            self.b[self.k] = "i"

    # step2 — stem.c:264-301 (incl. both DEPARTURE rules)
    def step2(self) -> None:
        ch = self.b[self.k - 1]
        if ch == "a":
            if self.ends("ational"):
                self.r("ate")
            elif self.ends("tional"):
                self.r("tion")
        elif ch == "c":
            if self.ends("enci"):
                self.r("ence")
            elif self.ends("anci"):
                self.r("ance")
        elif ch == "e":
            if self.ends("izer"):
                self.r("ize")
        elif ch == "l":
            if self.ends("bli"):  # DEPARTURE (stem.c:274)
                self.r("ble")
            elif self.ends("alli"):
                self.r("al")
            elif self.ends("entli"):
                self.r("ent")
            elif self.ends("eli"):
                self.r("e")
            elif self.ends("ousli"):
                self.r("ous")
        elif ch == "o":
            if self.ends("ization"):
                self.r("ize")
            elif self.ends("ation"):
                self.r("ate")
            elif self.ends("ator"):
                self.r("ate")
        elif ch == "s":
            if self.ends("alism"):
                self.r("al")
            elif self.ends("iveness"):
                self.r("ive")
            elif self.ends("fulness"):
                self.r("ful")
            elif self.ends("ousness"):
                self.r("ous")
        elif ch == "t":
            if self.ends("aliti"):
                self.r("al")
            elif self.ends("iviti"):
                self.r("ive")
            elif self.ends("biliti"):
                self.r("ble")
        elif ch == "g":
            if self.ends("logi"):  # DEPARTURE (stem.c:297)
                self.r("log")

    # step3 — stem.c:305-318
    def step3(self) -> None:
        ch = self.b[self.k]
        if ch == "e":
            if self.ends("icate"):
                self.r("ic")
            elif self.ends("ative"):
                self.r("")
            elif self.ends("alize"):
                self.r("al")
        elif ch == "i":
            if self.ends("iciti"):
                self.r("ic")
        elif ch == "l":
            if self.ends("ical"):
                self.r("ic")
            elif self.ends("ful"):
                self.r("")
        elif ch == "s":
            if self.ends("ness"):
                self.r("")

    # step4 — stem.c:322-347
    def step4(self) -> None:
        ch = self.b[self.k - 1]
        if ch == "a":
            if not self.ends("al"):
                return
        elif ch == "c":
            if not (self.ends("ance") or self.ends("ence")):
                return
        elif ch == "e":
            if not self.ends("er"):
                return
        elif ch == "i":
            if not self.ends("ic"):
                return
        elif ch == "l":
            if not (self.ends("able") or self.ends("ible")):
                return
        elif ch == "n":
            if not (
                self.ends("ant")
                or self.ends("ement")
                or self.ends("ment")
                or self.ends("ent")
            ):
                return
        elif ch == "o":
            if self.ends("ion") and self.b[self.j] in ("s", "t"):
                pass
            elif self.ends("ou"):
                pass
            else:
                return
        elif ch == "s":
            if not self.ends("ism"):
                return
        elif ch == "t":
            if not (self.ends("ate") or self.ends("iti")):
                return
        elif ch == "u":
            if not self.ends("ous"):
                return
        elif ch == "v":
            if not self.ends("ive"):
                return
        elif ch == "z":
            if not self.ends("ize"):
                return
        else:
            return
        if self.m() > 1:
            self.k = self.j

    # step5 — stem.c:352-361
    def step5(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1


@lru_cache(maxsize=500_000)
def stem_word_bytes(word: str) -> bytes:
    """BYTE-faithful reference stem (stemmer.cpp:23-35): per-byte ASCII
    tolower (glibc C-locale tolower leaves bytes ≥0x80 — negative signed
    chars — unchanged), then stem.c over the raw UTF-8 bytes. Running the
    char-level port over the latin-1 decoding is bit-equivalent: every
    byte maps to one char ≤0xFF, the vowel/suffix comparisons see the same
    values, and the result re-encodes to the exact output bytes. Unicode-
    aware ``str.lower()`` diverged here ('É'→'é' vs the reference's
    unchanged 0xC3 0x89), which broke cross-engine chunk-feature parity on
    non-ASCII words (tests/test_cross_engine.py pins it now)."""
    b = word.encode("utf-8", "surrogateescape")
    low = bytes(c + 32 if 0x41 <= c <= 0x5A else c for c in b)
    if len(low) <= 1:
        return low
    w = low.decode("latin-1")
    z = _Stemmer(w)
    if z.k <= 1:
        return low
    z.step1ab()
    z.step1c()
    z.step2()
    z.step3()
    z.step4()
    z.step5()
    return "".join(z.b[: z.k + 1]).encode("latin-1")


def stem_word(word: str) -> str:
    """Lowercase + stem, per the reference wrapper (stemmer.cpp:23-35).
    Words of length ≤ 2 pass through unstommed (the k<=1 DEPARTURE,
    stem.c:372). The stem can end mid-UTF-8-sequence (the reference
    truncates BYTES); surrogateescape keeps that reversible — hashing
    (functions/hashing.shash) encodes the same way, so hashed stems match
    the reference's byte stems exactly."""
    return stem_word_bytes(word).decode("utf-8", "surrogateescape")


def register_udf():
    # module-level alias so the string type hints ('pd.Series') resolve in
    # this module's globals when pyspark inspects the UDF signature
    global pd
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def stem_udf(words: pd.Series) -> pd.Series:
        return words.map(lambda w: None if w is None else stem_word(w))

    return stem_udf
