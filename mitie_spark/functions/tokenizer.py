"""CoNLL-2003-style tokenizer — exact behavioral port of the reference.

Reference: /root/reference/mitielib/include/mitie/conll_tokenizer.h:47-265
(pull-based, byte-offset-tracking state machine). This module reimplements the
same byte-level rules as a pure-Python core (`tokenize_with_offsets`) plus
Arrow-vectorized Spark UDFs. The core operates on the UTF-8 *bytes* of the
input so byte offsets match the reference exactly.

Rules (all byte-oriented; see the reference lines cited):
- whitespace split on space/\\t/\\n/\\r (conll_tokenizer.h:206-214) and the
  UTF-8 non-breaking space C2 A0 (h:215-231);
- the chars ``[ ] . ( ) ! , " : | ?`` are single-char tokens when they start a
  token (h:162-177);
- ``.`` is glued onto a token when the token is 1 char long, already ends in
  ``.`` (dot runs, ``U.S.``), or has a ``.`` one from the end (h:179-184);
- a trailing ``.`` after a 2-char Upper+lower token (``Jr.``, ``St.``) is
  dropped (h:186-190);
- ``.``/``,`` after a digit accumulate (``1,234.56``) (h:193-199);
- a leading ``'`` glues to the following word (``'s``) but a ``'`` after a
  token breaks it (``Turkey`` + ``'s``) (h:151-161);
- a token starting with U+201C (E2 80 9C) is split after the quote (h:75-85);
  a token ending with U+201D (E2 80 9D) is split before it (h:86-96);
- an *internal* U+2019 (E2 80 99) splits the token, the ’ becoming a leading
  ASCII ``'`` of the second half (h:99-122), with 2-byte front-padding
  bookkeeping so offsets of chained splits stay exact (h:110-115).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd

# single-char punctuation set (conll_tokenizer.h:162-172)
_PUNCT = frozenset(b"[].()!,\":|?")
_WS = frozenset(b" \t\n\r")


def _is_upper(b: int) -> bool:
    return 65 <= b <= 90


def _is_lower(b: int) -> bool:
    return 97 <= b <= 122


def _is_digit(b: int) -> bool:
    return 48 <= b <= 57


class _ByteTokenizer:
    """Mirror of conll_tokenizer's state machine over a bytes buffer."""

    __slots__ = ("data", "pos", "next_token", "next_token_offset", "next_pad")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # current_stream_offset
        self.next_token = b""
        self.next_token_offset = 0
        self.next_pad = 0  # next_token_front_padding

    # --- get_next_token (conll_tokenizer.h:130-244) ---
    def _get_next_token(self) -> Tuple[bytes, int] | None:
        if self.next_token:
            tok, self.next_token = self.next_token, b""
            return tok, self.next_token_offset

        data, n = self.data, len(self.data)
        token_offset = self.pos
        token = bytearray()
        while self.pos < n:
            ch = data[self.pos]
            if ch == 0x27:  # '
                if token:
                    return bytes(token), token_offset
                token.append(ch)
                self.pos += 1
            elif ch in _PUNCT:
                if not token:
                    self.pos += 1
                    return bytes([ch]), token_offset
                if ch == 0x2E and (
                    len(token) == 1
                    or token[-1] == 0x2E
                    or (len(token) >= 2 and token[-2] == 0x2E)
                ):
                    token.append(ch)
                    self.pos += 1
                elif (
                    ch == 0x2E
                    and len(token) == 2
                    and _is_upper(token[0])
                    and _is_lower(token[1])
                ):
                    self.pos += 1  # drop the trailing .
                    return bytes(token), token_offset
                else:
                    last = token[-1]
                    if ch in (0x2C, 0x2E) and _is_digit(last):
                        token.append(ch)
                        self.pos += 1
                    else:
                        return bytes(token), token_offset
            elif ch in _WS:
                self.pos += 1
                if token:
                    return bytes(token), token_offset
                token_offset += 1
            elif ch == 0xC2:  # possible U+00A0 non-breaking space
                self.pos += 1
                if self.pos < n and data[self.pos] == 0xA0:
                    self.pos += 1
                    if token:
                        return bytes(token), token_offset
                    token_offset += 2
                else:
                    token.append(0xC2)
            else:
                token.append(ch)
                self.pos += 1

        if token:
            return bytes(token), token_offset
        return None

    # --- operator() post-splits (conll_tokenizer.h:53-126) ---
    def __call__(self) -> Tuple[bytes, int] | None:
        got = self._get_next_token()
        if got is None:
            return None
        token, token_offset = got

        if len(token) >= 4 and token[:3] == b"\xe2\x80\x9c":  # leading U+201C
            self.next_token_offset = token_offset + 3
            self.next_pad = 0
            self.next_token = token[3:]
            return token[:3], token_offset
        if len(token) >= 4 and token[-3:] == b"\xe2\x80\x9d":  # trailing U+201D
            self.next_token_offset = token_offset + len(token) - 3
            self.next_pad = 0
            self.next_token = token[-3:]
            return token[:-3], token_offset
        # internal U+2019 → split, ’ becomes leading ' of the second half
        i = 1
        while i < len(token):
            if (
                token[i] == 0xE2
                and i + 2 < len(token)
                and token[i + 1] == 0x80
                and token[i + 2] == 0x99
            ):
                self.next_token_offset = token_offset + i + self.next_pad
                self.next_pad = 2
                self.next_token = b"'" + token[i + 3 :]
                return token[:i], token_offset
            i += 1

        self.next_pad = 0
        return token, token_offset


def iter_tokens_bytes(data: bytes) -> Iterator[Tuple[bytes, int]]:
    tk = _ByteTokenizer(data)
    while True:
        got = tk()
        if got is None:
            return
        yield got


def tokenize_with_offsets(text: str) -> List[Tuple[str, int]]:
    """Tokenize ``text``, returning (token, byte_offset) pairs.

    Equivalent of mitie.tokenize_with_offsets (mitielib/mitie.py:228-247);
    offsets are byte offsets into the UTF-8 encoding of ``text``.
    """
    return [
        (tok.decode("utf-8", errors="replace"), off)
        for tok, off in iter_tokens_bytes(text.encode("utf-8"))
    ]


def tokenize(text: str) -> List[str]:
    """Equivalent of mitie.tokenize (mitielib/mitie.py:210-225)."""
    return [t for t, _ in tokenize_with_offsets(text)]


def fold_digits(token: str) -> str:
    """Digit folding [0-9] → '#' (total_word_feature_extractor.h:34-45,
    unigram_tokenizer.h:17-57)."""
    return "".join("#" if "0" <= c <= "9" else c for c in token)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

TOKENS_SCHEMA = "array<struct<token:string,offset:bigint>>"


def register_udfs():
    """Build Arrow-vectorized tokenizer UDFs (lazy import keeps this module
    usable without a SparkSession, e.g. in pure-python unit tests)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(TOKENS_SCHEMA)
    def tokenize_offsets_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append([])
            else:
                out.append(
                    [
                        {"token": tok, "offset": off}
                        for tok, off in tokenize_with_offsets(t)
                    ]
                )
        return pd.Series(out)

    @pandas_udf("array<string>")
    def tokenize_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [[] if t is None else tokenize(t) for t in texts]
        )

    return tokenize_udf, tokenize_offsets_udf
