"""RTF text extractor + minimal writer.

Role in the engine: RTF rounds out the document payloads the router
handles (PDF / DOCX / XLSX / PPTX — it predates OOXML and is still
common in crawls of older corpora and email attachments). The format is
a token stream: ``{`` ``}`` group nesting, ``\\word[N]`` control words,
``\\X`` control symbols, and plain text; bytes above ASCII arrive as
``\\'hh`` codepage escapes (``\\ansicpg``) or ``\\uN?`` unicode escapes
whose fallback length is the group-scoped ``\\ucN`` state.

Extraction walks that token stream with a group-state stack: starred
groups (``{\\*...}``) and the classic non-text destinations (fonttbl,
colortbl, stylesheet, info, pict, ...) are skipped wholesale, ``\\binN``
raw-byte runs are skipped by count (they may contain braces),
``\\par``/``\\line`` map to newline and ``\\tab`` to tab, and everything
else renders through the declared codepage. Malformed input raises
RtfError (fail-fast, same contract as the other extractors).

Correctness story (tests/test_rtf.py): round trip through ``write_rtf``
plus hand-written RTF exercising what the writer never emits
(destinations, codepage escapes, \\uc fallbacks, \\bin, nested groups)
and the corruption fuzz contract.

Scale note: pure per-record function for Arrow ``mapInPandas`` stages —
no shuffle.
"""

from __future__ import annotations

__all__ = ["RtfError", "extract_rtf_text", "write_rtf"]


class RtfError(ValueError):
    """Malformed, bombed, or text-free-by-damage RTF."""


# destinations whose content is never document text (RTF 1.9 §"Destination
# Text"); starred groups ({\*\...}) are skipped wholesale regardless
_SKIP_DESTINATIONS = frozenset(
    {
        "fonttbl",
        "colortbl",
        "stylesheet",
        "info",
        "pict",
        "object",
        "header",
        "footer",
        "headerl",
        "headerr",
        "headerf",
        "footerl",
        "footerr",
        "footerf",
        "footnote",
        "ftnsep",
        "ftnsepc",
        "aftnsep",
        "aftnsepc",
        "comment",
        "annotation",
        "themedata",
        "colorschememapping",
        "datastore",
        "latentstyles",
        "listtable",
        "listoverridetable",
        "revtbl",
        "rsidtbl",
        "generator",
        "xmlnstbl",
        "fldinst",
    }
)

_NEWLINE_WORDS = frozenset({"par", "line", "row"})


def extract_rtf_text(data: bytes, max_out: int = 1 << 26) -> str:
    """RTF bytes → text. Raises RtfError on anything malformed; output
    bounded by max_out."""
    if data[:5] != b"{\\rtf":
        raise RtfError("not an RTF payload")
    codepage = "cp1252"
    out: list[str] = []
    total = 0
    # group state: (uc_count, skipping)
    stack: list[tuple[int, bool]] = []
    uc, skipping = 1, False
    pend_bytes = bytearray()  # consecutive \'hh bytes decode as one run

    def flush() -> None:
        # bytes were counted toward max_out as they arrived
        if pend_bytes:
            try:
                out.append(pend_bytes.decode(codepage))
            except (UnicodeDecodeError, LookupError):
                out.append(pend_bytes.decode("cp1252", "replace"))
            pend_bytes.clear()

    def emit(s: str) -> None:
        nonlocal total
        flush()
        if not skipping and s:
            out.append(s)
            total += len(s)
            if total > max_out:
                raise RtfError("extracted text exceeds max_out")

    i, n = 0, len(data)
    group_open = False  # just entered a group: a \* or destination may follow
    uc_skip = 0  # pending \uN fallback units to swallow
    pend_hi: int | None = None  # pending high surrogate from \uN
    while i < n:
        c = data[i]
        if c == 0x7B:  # {
            stack.append((uc, skipping))
            if len(stack) > 1000:
                raise RtfError("RTF group nesting too deep")
            i += 1
            group_open = True
            uc_skip = 0  # \uN fallback skipping ends at group boundaries
            continue
        if c == 0x7D:  # }
            flush()
            if not stack:
                raise RtfError("unbalanced RTF group close")
            uc_skip = 0
            uc, skipping = stack.pop()
            i += 1
            group_open = False
            if not stack:
                break  # the root group just closed: document complete
            continue
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                raise RtfError("dangling RTF escape")
            nxt = data[i + 1]
            if nxt == 0x27:  # \'hh codepage byte
                if i + 4 > n:
                    raise RtfError("truncated RTF hex escape")
                try:
                    b = int(data[i + 2 : i + 4], 16)
                except ValueError:
                    raise RtfError("bad RTF hex escape") from None
                if uc_skip:
                    uc_skip -= 1
                elif not skipping:
                    pend_bytes.append(b)
                    total += 1
                    if total > max_out:
                        raise RtfError("extracted text exceeds max_out")
                i += 4
                group_open = False
                continue
            if not (65 <= nxt <= 90 or 97 <= nxt <= 122):
                # control symbol — counts as ONE \uN fallback unit (RTF
                # 1.9 skipping rule), its text suppressed while skipping
                if uc_skip:
                    uc_skip -= 1
                elif nxt == 0x2A and group_open:  # {\* ...}: skip wholesale
                    skipping = True
                elif nxt in (0x5C, 0x7B, 0x7D):
                    emit(chr(nxt))
                elif nxt == 0x7E:
                    emit(" ")
                elif nxt == 0x2D:
                    emit("­")  # optional hyphen
                elif nxt == 0x5F:
                    emit("‑")  # non-breaking hyphen
                # others (\:, \|, ...) are formatting hints: no text
                i += 2
                group_open = False
                continue
            # control word: letters then optional signed number then
            # one optional space delimiter
            j = i + 1
            while j < n and (65 <= data[j] <= 90 or 97 <= data[j] <= 122):
                j += 1
            word = data[i + 1 : j].decode("ascii")
            param = None
            if j < n and (data[j] == 0x2D or 48 <= data[j] <= 57):
                k = j + 1 if data[j] == 0x2D else j
                while k < n and 48 <= data[k] <= 57:
                    k += 1
                if k == j + (1 if data[j] == 0x2D else 0):
                    raise RtfError("bare minus after control word")
                param = int(data[j:k])
                j = k
            if j < n and data[j] == 0x20:
                j += 1  # the single delimiter space is part of the word
            i = j
            if word == "bin":
                count = max(param or 0, 0)
                if i + count > n:
                    raise RtfError("truncated RTF \\bin run")
                i += count
                if uc_skip:
                    uc_skip -= 1  # \binN counts as one fallback unit
                group_open = False
                continue
            if uc_skip:
                # a control word counts as ONE \uN fallback unit (RTF 1.9
                # skipping rule): consume it without executing its effect
                uc_skip -= 1
                group_open = False
                continue
            if word == "u":
                if param is None:
                    raise RtfError("RTF \\u without code point")
                cp = param + 65536 if param < 0 else param
                if not 0 <= cp <= 0x10FFFF:
                    raise RtfError("bad RTF unicode escape")
                if not skipping:
                    # recombine the UTF-16 surrogate-pair convention RTF
                    # uses for astral code points; lone surrogates become
                    # U+FFFD (they are not encodable downstream)
                    if 0xD800 <= cp < 0xDC00:
                        if pend_hi is not None:
                            emit("�")
                        pend_hi = cp
                    elif 0xDC00 <= cp < 0xE000:
                        if pend_hi is not None:
                            emit(
                                chr(
                                    0x10000
                                    + ((pend_hi - 0xD800) << 10)
                                    + (cp - 0xDC00)
                                )
                            )
                            pend_hi = None
                        else:
                            emit("�")
                    else:
                        if pend_hi is not None:
                            emit("�")
                            pend_hi = None
                        emit(chr(cp))
                uc_skip = uc
                group_open = False
                continue
            if word == "uc":
                uc = max(param or 0, 0)
            elif word == "ansicpg" and param:
                codepage = f"cp{param}"
            elif word in _NEWLINE_WORDS:
                emit("\n")
            elif word == "tab" or word == "cell":
                emit("\t")
            elif word == "emdash":
                emit("—")
            elif word == "endash":
                emit("–")
            elif word == "lquote":
                emit("‘")
            elif word == "rquote":
                emit("’")
            elif word == "ldblquote":
                emit("“")
            elif word == "rdblquote":
                emit("”")
            elif word == "bullet":
                emit("•")
            elif group_open and word in _SKIP_DESTINATIONS:
                skipping = True
            group_open = False
            continue
        # plain text byte (CR/LF in the file are NOT document text)
        if c not in (0x0D, 0x0A):
            if uc_skip:
                uc_skip -= 1
            elif not skipping:
                pend_bytes.append(c)
                total += 1
                if total > max_out:
                    raise RtfError("extracted text exceeds max_out")
        i += 1
        group_open = False
    else:
        raise RtfError("unterminated RTF document")
    flush()
    if pend_hi is not None:
        out.append("�")
    return "".join(out)


def write_rtf(text: str) -> bytes:
    """text → minimal RTF. Round-trip partner of extract_rtf_text:
    extract(write(t)) == t for any text (non-ASCII goes out as \\uN
    escapes, so there is no codepage dependence)."""
    parts = ["{\\rtf1\\ansi\\ansicpg1252\\uc0 "]
    for ch in text:
        o = ord(ch)
        if ch == "\n":
            parts.append("\\par ")
        elif ch == "\t":
            parts.append("\\tab ")
        elif ch in "\\{}":
            parts.append("\\" + ch)
        elif 32 <= o < 128:
            parts.append(ch)
        elif o < 32:
            raise ValueError(f"control character {ch!r} not representable")
        elif o < 32768:
            parts.append(f"\\u{o} ")
        elif o < 65536:
            parts.append(f"\\u{o - 65536} ")  # RTF \u params are int16
        else:  # astral plane: UTF-16 surrogate pair, the RTF convention
            o -= 0x10000
            hi, lo = 0xD800 + (o >> 10), 0xDC00 + (o & 0x3FF)
            parts.append(f"\\u{hi - 65536} \\u{lo - 65536} ")
    parts.append("}")
    return "".join(parts).encode("ascii")
