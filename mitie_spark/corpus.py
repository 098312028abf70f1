"""Deterministic synthetic Common-Crawl-style pages corpus with planted truth.

Replaces the reference's sample corpus (/root/reference/sample_text.txt and
its golden outputs) as the parity target: since the reference's binary models
are not vendored (makefile fetches them at build time, makefile:13-17), the
P/R ≥ 0.95 triple-parity target is evaluated against *planted* ground truth
from this generator — every entity mention and every (subj, pred, obj) triple
in the corpus is known exactly by construction.

Output tables (parquet):
- pages          (url, warc_ts, html:binary, text, lang)  — the input_hint schema
- mentions_true  (url, token_start, token_end, tag, surface) — whole-doc token spans
- triples_true   (url, subj, pred, obj)
- alias_dict     (alias, canonical_id, canonical_name, tag) — linking dimension

Invariants:
- text == html_to_text(html) byte-identically per url (asserted at build);
- tokenize(text) == the generator's token list (sentences are built in token
  space and detokenized with rules the CoNLL tokenizer round-trips);
- skew: a handful of domains carry ~30% of pages; ~1% of pages are 40×
  median length (exercises AQE skew handling + per-doc batch capping).

Everything is seeded (seed + page index) — same args → same bytes.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import random
from datetime import datetime, timedelta

from mitie_spark.functions.html2text import html_to_text

# --- vocabularies (all tokens ≥3 chars: avoids the 2-char-abbreviation
# tokenizer rule eating sentence periods; see conll_tokenizer.h:186-190) ---

FIRST = [
    "Maria", "Chen", "Amara", "Viktor", "Sofia", "Ethan", "Priya", "Lukas",
    "Fatima", "Diego", "Hana", "Marcus", "Ingrid", "Rafael", "Yuki", "Omar",
    "Elena", "Kwame", "Linnea", "Tomas", "Aisha", "Pavel", "Noor", "Bruno",
    "Greta", "Hassan", "Ines", "Jonas", "Keiko", "Liam", "Mira", "Nadia",
    "Oscar", "Petra", "Quinn", "Rosa", "Stefan", "Tara", "Umar", "Vera",
]
LAST = [
    "Okafor", "Lindqvist", "Tanaka", "Moreau", "Petrov", "Silva", "Haddad",
    "Kowalski", "Novak", "Fischer", "Guerrero", "Ibrahim", "Johansson",
    "Kaur", "Larsen", "Mbeki", "Nakamura", "Oliveira", "Popescu", "Quispe",
    "Rossi", "Schmidt", "Takahashi", "Uddin", "Vasquez", "Weber", "Xiong",
    "Yamamoto", "Zhang", "Andersson", "Bauer", "Castillo", "Dubois",
    "Eriksson", "Ferrari", "Gonzalez", "Hoffmann", "Ivanov", "Jensen", "Khan",
]
CITY = [
    "Lyon", "Porto", "Osaka", "Cusco", "Turku", "Gdansk", "Sochi", "Bergen",
    "Leipzig", "Valencia", "Brno", "Graz", "Nantes", "Bilbao", "Salem",
    "Quito", "Lagos", "Accra", "Nairobi", "Medellin", "Curitiba", "Sapporo",
    "Daegu", "Xiamen", "Mysore", "Bandung", "Adelaide", "Hamilton", "Tampere",
    "Aarhus", "Malmo", "Basel", "Verona", "Seville", "Krakow", "Istanbul",
    "Boston", "Denver", "Austin", "Portland",
]
COUNTRY = [
    "Russia", "Norway", "Poland", "Spain", "Japan", "Peru", "Finland",
    "Germany", "Austria", "France", "Ecuador", "Nigeria", "Ghana", "Kenya",
    "Colombia", "Brazil", "Korea", "China", "India", "Indonesia", "Australia",
    "Turkey", "Sweden", "Denmark", "Italy", "Mexico",
]
ORG_A = [
    "Acme", "Northbridge", "Helix", "Vertex", "Quantum", "Stellar", "Apex",
    "Cobalt", "Meridian", "Pinnacle", "Vanguard", "Zenith", "Atlas", "Nova",
    "Orion", "Polaris", "Summit", "Crescent", "Harbor", "Beacon",
]
ORG_B = [
    "Systems", "Labs", "Industries", "Analytics", "Dynamics", "Robotics",
    "Logistics", "Partners", "Holdings", "Networks", "Biotech", "Energy",
]
DAY = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"]
SALAD = [
    "the", "fast", "key", "order", "sort", "table", "scan", "merge", "part",
    "window", "small", "hash", "join", "batch", "stream", "spark", "data",
    "slow", "filter", "customer", "line", "value", "group", "query", "row",
    "agg", "column", "big", "vector", "dup",
]

PREDS = ("born_in", "contains", "works_for")


def _person(rng):
    return [rng.choice(FIRST), rng.choice(LAST)]


def _org(rng):
    return [rng.choice(ORG_A), rng.choice(ORG_B)]


def make_sentence(rng: random.Random):
    """Return (tokens, mentions, rels) for one sentence.

    mentions: (start, end, tag, surface) token spans (half-open);
    rels: (subj_mention_idx, pred, obj_mention_idx) — mention-indexed so
    training can locate the argument spans; string triples derive as
    (mentions[si][3], pred, mentions[oi][3]).
    """
    kind = rng.choices(
        ["born", "contains", "works", "visited", "met", "based", "salad"],
        weights=[16, 14, 14, 12, 8, 8, 28],
    )[0]
    if kind == "salad":
        n = rng.randint(5, 12)
        toks = [rng.choice(SALAD) for _ in range(n)] + ["."]
        return toks, [], []
    if kind == "born":
        p, c = _person(rng), rng.choice(CITY)
        toks = p + ["was", "born", "in", c, "."]
        ments = [(0, 2, "PERSON", " ".join(p)), (5, 6, "LOCATION", c)]
        return toks, ments, [(0, "born_in", 1)]
    if kind == "contains":
        c, k = rng.choice(CITY), rng.choice(COUNTRY)
        toks = [c, "is", "a", "city", "in", k, "."]
        ments = [(0, 1, "LOCATION", c), (5, 6, "LOCATION", k)]
        return toks, ments, [(1, "contains", 0)]
    if kind == "works":
        p, o = _person(rng), _org(rng)
        toks = p + ["works", "for"] + o + ["."]
        ments = [(0, 2, "PERSON", " ".join(p)), (4, 6, "ORGANIZATION", " ".join(o))]
        return toks, ments, [(0, "works_for", 1)]
    if kind == "visited":
        p, c, d = _person(rng), rng.choice(CITY), rng.choice(DAY)
        toks = p + ["visited", c, "last", d, "."]
        ments = [(0, 2, "PERSON", " ".join(p)), (3, 4, "LOCATION", c)]
        return toks, ments, []
    if kind == "met":
        p1, p2, c = _person(rng), _person(rng), rng.choice(CITY)
        toks = p1 + ["met"] + p2 + ["in", c, "."]
        ments = [
            (0, 2, "PERSON", " ".join(p1)),
            (3, 5, "PERSON", " ".join(p2)),
            (6, 7, "LOCATION", c),
        ]
        return toks, ments, []
    # based: org mentioned with a city, no planted triple (negative context)
    o, c = _org(rng), rng.choice(CITY)
    toks = o + ["has", "offices", "near", c, "."]
    ments = [(0, 2, "ORGANIZATION", " ".join(o)), (5, 6, "LOCATION", c)]
    return toks, ments, []


_NOSPACE_BEFORE = {".", ",", "!", "?", ":", ")", "]"}


def detokenize(tokens: list[str]) -> str:
    """Inverse of the tokenizer for our templated sentences: space-join, but
    attach closing punctuation to the previous token."""
    out = []
    for t in tokens:
        if out and t in _NOSPACE_BEFORE:
            out[-1] = out[-1] + t
        else:
            out.append(t)
    return " ".join(out)


DOMAINS = [f"site-{i}.example" for i in range(20)]
# zipf-ish weights: first 3 domains ≈ 30% of pages (domain skew knob)
DOMAIN_W = [12, 10, 8] + [70 / 17] * 17
LANGS = ["en"] * 17 + ["de", "es", "fr"]


def make_page(seed: int, idx: int):
    rng = random.Random(f"{seed}:{idx}")
    domain = rng.choices(DOMAINS, weights=DOMAIN_W)[0]
    url = f"https://{domain}/doc/{idx}"
    lang = rng.choice(LANGS)
    n_sent = 200 if rng.random() < 0.01 else rng.randint(2, 8)  # length skew

    sent_data = [make_sentence(rng) for _ in range(n_sent)]
    # paragraphs of 1-3 sentences
    paras, cur = [], []
    for s in sent_data:
        cur.append(s)
        if len(cur) >= rng.randint(1, 3):
            paras.append(cur)
            cur = []
    if cur:
        paras.append(cur)

    # doc-level token positions (text paragraphs joined by \n\n — whitespace
    # only, so token indices are the concatenation of sentence tokens)
    mentions, triples, pos = [], [], 0
    para_texts = []
    for para in paras:
        sent_texts = []
        for toks, ments, rels in para:
            for (s, e, tag, surf) in ments:
                mentions.append((pos + s, pos + e, tag, surf))
            for (si, pr, oi) in rels:
                triples.append((ments[si][3], pr, ments[oi][3]))
            pos += len(toks)
            sent_texts.append(detokenize(toks))
        para_texts.append(" ".join(sent_texts))

    title = f"Report {idx} from {domain}"
    body = "".join(f"<p>{p}</p>\n" for p in para_texts)
    html = (
        f"<html><head><title>{title}</title>"
        f"<style>p {{margin: 0}}</style></head>\n"
        f"<body><!-- generated page {idx} -->\n{body}"
        f"<script>var page={idx};</script></body></html>"
    )
    text = html_to_text(html.encode("utf-8"))
    ts = datetime(2024, 1, 1) + timedelta(seconds=(idx * 977) % (365 * 86400))
    # title tokens precede body tokens in the extracted text
    from mitie_spark.functions.tokenizer import tokenize as _tok

    title_len = len(_tok(title))
    mentions = [(s + title_len, e + title_len, tag, surf) for s, e, tag, surf in mentions]
    # the module's load-bearing invariant, ASSERTED at build (a vocab word
    # or template change that trips a tokenizer rule would otherwise skew
    # every mentions_true offset and surface only as a mysterious P/R drop
    # in the gated kg_* queries): extracted-text tokens == title tokens +
    # the generator's sentence tokens, so mention offsets index tokenize(text)
    doc_toks = _tok(text)
    gen_toks = [t for para in paras for toks, _, _ in para for t in toks]
    assert doc_toks[title_len:] == gen_toks, (
        f"corpus invariant broken at page {idx}: tokenize(text) diverges "
        "from the generator's token stream"
    )
    for s, e, _tag, surf in mentions:
        assert " ".join(doc_toks[s:e]) == surf, (
            f"corpus invariant broken at page {idx}: mention span ({s},{e}) "
            f"does not cover {surf!r}"
        )
    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }, mentions, triples


def build_alias_dict():
    """Entity-linking dimension table: canonical names + alias variants."""
    rows = []

    def cid(name: str) -> str:
        return "Q_" + hashlib.md5(name.encode()).hexdigest()[:10]

    for f in FIRST:
        for l in LAST:
            name = f"{f} {l}"
            rows.append((name, cid(name), name, "PERSON"))
            rows.append((f"{f[0]}. {l}", cid(name), name, "PERSON"))
    for c in CITY + COUNTRY:
        rows.append((c, cid(c), c, "LOCATION"))
    for a in ORG_A:
        for b in ORG_B:
            name = f"{a} {b}"
            rows.append((name, cid(name), name, "ORGANIZATION"))
            rows.append((a, cid(name), name, "ORGANIZATION"))
    return rows


def generate(out_dir: str, n_pages: int, seed: int = 42) -> dict:
    """Write pages + truth tables as parquet; returns counts."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    pages, ment_rows, trip_rows = [], [], []
    for i in range(n_pages):
        page, mentions, triples = make_page(seed, i)
        pages.append(page)
        for (s, e, tag, surf) in mentions:
            ment_rows.append((page["url"], s, e, tag, surf))
        for (su, pr, ob) in triples:
            trip_rows.append((page["url"], su, pr, ob))

    pages_df = pd.DataFrame(pages)
    # Spark's parquet reader rejects TIMESTAMP(NANOS) — write microseconds
    pages_df["warc_ts"] = pages_df["warc_ts"].astype("datetime64[us]")
    # small row groups → Spark can split the file for parallel scans
    # (at web scale the input is naturally many files; this keeps the
    # sandbox corpus splittable the same way)
    pages_df.to_parquet(f"{out_dir}/pages.parquet", index=False, row_group_size=500)
    pd.DataFrame(
        ment_rows, columns=["url", "token_start", "token_end", "tag", "surface"]
    ).to_parquet(f"{out_dir}/mentions_true.parquet", index=False)
    pd.DataFrame(trip_rows, columns=["url", "subj", "pred", "obj"]).to_parquet(
        f"{out_dir}/triples_true.parquet", index=False
    )
    pd.DataFrame(
        build_alias_dict(),
        columns=["alias", "canonical_id", "canonical_name", "tag"],
    ).to_parquet(f"{out_dir}/alias_dict.parquet", index=False)
    return {
        "pages": len(pages),
        "mentions_true": len(ment_rows),
        "triples_true": len(trip_rows),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--pages", type=int, default=500)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    print(generate(args.out, args.pages, args.seed))


if __name__ == "__main__":
    main()
