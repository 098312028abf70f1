"""Hand-crafted brotli stream composer (test helper).

Builds minimal valid RFC 7932 streams with explicitly chosen prefix
codes, commands, and distance codes. Two jobs:

1. Oracle probing: features the C encoder rarely or never emits with a
   predictable shape (distance ring-buffer short codes, simple-code
   symbol orderings, metadata meta-blocks, context-map RLE) are pinned
   by crafting a stream and decoding it with the system libbrotlidec —
   the library's output is the ground truth our decoder must match.
2. Directed test vectors for tests/test_brotli.py.

Only the subset needed for those jobs is supported: one compressed
meta-block, single block types, NPOSTFIX=NDIRECT=0, simple prefix codes
(1-4 symbols, symbols listed SORTED so the code assignment is
convention-independent), plus raw/metadata meta-block emission.
"""

from __future__ import annotations


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def put(self, nbits: int, v: int) -> None:
        assert 0 <= v < (1 << nbits)
        self.buf |= v << self.cnt
        self.cnt += nbits
        while self.cnt >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.cnt -= 8

    def put_code(self, length: int, code: int) -> None:
        """Emit a canonical prefix code MSB-first (stream order)."""
        for i in range(length - 1, -1, -1):
            self.put(1, (code >> i) & 1)

    def align(self) -> None:
        if self.cnt:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.cnt = 0

    def raw(self, data: bytes) -> None:
        assert self.cnt == 0
        self.out += data

    def bytes(self) -> bytes:
        b = bytearray(self.out)
        if self.cnt:
            b.append(self.buf & 0xFF)
        return bytes(b)


# canonical depth patterns for simple codes by symbol count
_SIMPLE_DEPTHS = {1: [0], 2: [1, 1], 3: [1, 2, 2], 4: [2, 2, 2, 2]}
_SIMPLE_DEPTHS_SEL = [1, 2, 3, 3]  # NSYM=4, tree-select=1


class SimpleCode:
    """A simple prefix code over explicitly listed symbols. `codes`
    maps symbol → (length, canonical code) for emission."""

    def __init__(self, alphabet: int, symbols: list[int], tree_select: int = 0):
        assert 1 <= len(symbols) <= 4
        assert symbols == sorted(symbols), "list sorted for convention-free tests"
        self.alphabet = alphabet
        self.symbols = symbols
        self.tree_select = tree_select
        depths = (
            _SIMPLE_DEPTHS_SEL
            if (len(symbols) == 4 and tree_select)
            else _SIMPLE_DEPTHS[len(symbols)]
        )
        code = 0
        prev = depths[0]
        self.codes = {}
        for d, s in sorted(zip(depths, symbols)):
            code <<= d - prev
            prev = d
            self.codes[s] = (d, code)
            code += 1

    def write_def(self, bw: BitWriter) -> None:
        bw.put(2, 1)  # simple form
        bw.put(2, len(self.symbols) - 1)
        abits = max(1, (self.alphabet - 1).bit_length())
        for s in self.symbols:
            bw.put(abits, s)
        if len(self.symbols) == 4:
            bw.put(1, self.tree_select)

    def emit(self, bw: BitWriter, sym: int) -> None:
        d, c = self.codes[sym]
        if d:
            bw.put_code(d, c)


# insert/copy length code tables (mirror of the decoder's)
INS_EXTRA = [0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 24]
CPY_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 24]
INS_BASE, CPY_BASE = [], []
_b = 0
for _e in INS_EXTRA:
    INS_BASE.append(_b)
    _b += 1 << _e
_b = 2
for _e in CPY_EXTRA:
    CPY_BASE.append(_b)
    _b += 1 << _e


def ins_code_for(n: int) -> tuple[int, int]:
    for c in range(23, -1, -1):
        if INS_BASE[c] <= n < INS_BASE[c] + (1 << INS_EXTRA[c]):
            return c, n - INS_BASE[c]
    raise ValueError(n)


def cpy_code_for(n: int) -> tuple[int, int]:
    for c in range(23, -1, -1):
        if CPY_BASE[c] <= n < CPY_BASE[c] + (1 << CPY_EXTRA[c]):
            return c, n - CPY_BASE[c]
    raise ValueError(n)


def cmd_symbol(ins_code: int, cpy_code: int, implicit: bool) -> int:
    """Command symbol for (insert code, copy code); implicit=True picks
    the cmd<128 cells (distance code 0 reused, not read)."""
    cells = {
        (0, 0, True): 0, (0, 8, True): 64,
        (0, 0, False): 128, (0, 8, False): 192,
        (8, 0, False): 256, (8, 8, False): 320,
        (0, 16, False): 384, (16, 0, False): 448,
        (8, 16, False): 512, (16, 8, False): 576,
        (16, 16, False): 640,
    }
    i_hi, i_lo = ins_code & ~7, ins_code & 7
    c_hi, c_lo = cpy_code & ~7, cpy_code & 7
    base = cells[(i_hi, c_hi, implicit)]
    return base + (i_lo << 3) + c_lo


def dist_long_code(distance: int) -> tuple[int, int, int]:
    """distance → (dcode, extra_bits, extra_value) for NPOSTFIX=NDIRECT=0."""
    for h in range(48):
        nd = 1 + (h >> 1)
        off = ((2 + (h & 1)) << nd) - 4
        lo, hi = off + 1, off + (1 << nd)
        if lo <= distance <= hi:
            return 16 + h, nd, distance - off - 1
    raise ValueError(distance)


def craft_stream(
    literal_syms: list[int],
    dist_syms: list[int],
    commands: list[tuple],
    *,
    wbits_bit: bool = True,
    prelude_meta: bytes | None = None,
    context_map_rle: bool = False,
) -> bytes:
    """One compressed meta-block (ISLAST) from explicit commands.

    commands: list of (literals: bytes, copy_len: int|None, dcode_spec)
      dcode_spec: None → implicit (cmd<128, reuse last distance, nothing
      read); ("short", c) → ring code c in 0..15; ("long", distance) →
      explicit distance via the long-code formula. copy_len None is only
      valid for the final command (insert-only tail is expressed by a
      copy that the meta-block length cuts off).
    """
    bw = BitWriter()
    if wbits_bit:
        bw.put(1, 0)  # WBITS = 16
    if prelude_meta is not None:  # metadata meta-block before the data
        bw.put(1, 0)  # ISLAST=0
        bw.put(2, 3)  # MNIBBLES code 3 → metadata
        bw.put(1, 0)  # reserved
        n = len(prelude_meta)
        if n == 0:
            bw.put(2, 0)
        else:
            assert n <= 255
            bw.put(2, 1)
            bw.put(8, n - 1)
        bw.align()
        bw.raw(prelude_meta)

    # resolve command symbols + codebooks
    cmd_specs = []
    mlen = 0
    for lits, cpy, dspec in commands:
        ic, ie = ins_code_for(len(lits))
        if cpy is None:
            cc, ce = cpy_code_for(2)  # cut off by MLEN, never executed
            cpy_eff = 0
        else:
            cc, ce = cpy_code_for(cpy)
            cpy_eff = cpy
        implicit = dspec is None
        sym = cmd_symbol(ic, cc, implicit)
        cmd_specs.append((lits, sym, (ic, ie), (cc, ce), dspec))
        mlen += len(lits) + cpy_eff
    cmd_sorted = sorted({s for _, s, _, _, _ in cmd_specs})
    assert len(cmd_sorted) <= 4, "at most 4 distinct command symbols"
    cmd_code = SimpleCode(704, cmd_sorted)
    lit_code = SimpleCode(256, sorted(set(literal_syms)))
    dist_code = SimpleCode(64, sorted(set(dist_syms))) if dist_syms else None

    bw.put(1, 1)  # ISLAST
    bw.put(1, 0)  # ISLASTEMPTY
    bw.put(2, 0)  # MNIBBLES → 4
    bw.put(16, mlen - 1)
    for _ in range(3):  # NBLTYPES L, I, D = 1
        bw.put(1, 0)
    bw.put(2, 0)  # NPOSTFIX
    bw.put(4, 0)  # NDIRECT
    bw.put(2, 0)  # context mode LSB6 for the single literal block type
    if context_map_rle:
        # NTREES_L = 2 with a context map that RLE-zeros all 64 entries
        # except the last, which selects tree 1 (both trees identical).
        bw.put(1, 1)
        bw.put(3, 0)  # k=0 → NTREES = 2
        bw.put(1, 1)  # RLEMAX present
        bw.put(4, 5)  # RLEMAX = 6
        rle_code = SimpleCode(2 + 6, [5, 7])  # RLE-5 and value (7-6)=1
        rle_code.write_def(bw)
        rle_code.emit(bw, 5)  # zeros: reps = 32 + extra(5 bits)
        bw.put(5, 31)  # 63 zeros
        rle_code.emit(bw, 7)  # entry 63 → tree 1
        bw.put(1, 0)  # no IMTF
    else:
        bw.put(1, 0)  # NTREES_L = 1
    bw.put(1, 0)  # NTREES_D = 1
    lit_code.write_def(bw)
    if context_map_rle:
        lit_code.write_def(bw)  # second identical literal tree
    cmd_code.write_def(bw)
    if dist_code is not None:
        dist_code.write_def(bw)
    else:
        SimpleCode(64, [0]).write_def(bw)

    for lits, sym, (ic, ie), (cc, ce), dspec in cmd_specs:
        cmd_code.emit(bw, sym)
        if INS_EXTRA[ic]:
            bw.put(INS_EXTRA[ic], ie)
        if CPY_EXTRA[cc]:
            bw.put(CPY_EXTRA[cc], ce)
        for b in lits:
            lit_code.emit(bw, b)
        if dspec is None:
            continue
        kind, val = dspec
        if kind == "short":
            dist_code.emit(bw, val)
        else:
            dcode, nd, extra = dist_long_code(val)
            dist_code.emit(bw, dcode)
            bw.put(nd, extra)
    return bw.bytes()
