#!/usr/bin/env python3
"""Dev-only seeded ADVERSARIAL testdata generator (VERDICT r11 item 7).

Usage: python3 scripts/synthgen.py <seed> <outDir>

All 135 oracles replay on the driver's fixed testdata; this writes a
seeded synthetic `documents` + `embeddings` parquet pair with the
shapes that fixed data never exercises — exact-duplicate and
one-token-edit near-duplicate texts at RANDOM positions (not the
fixtures' planted +100000 twins), empty texts, single-token and
punctuation-only documents, heavy token skew (zipf), null lang/source,
a dominant source (~60%), and tie-heavy n_chars — so the sensitive
operators (minhash/simhash sketching, n-gram jaccard, equi-depth,
PSI drift) are re-checked against DuckDB on inputs with different
collision/tie structure each seed. Same routine as the driver after:

    python3 scripts/synthgen.py 1 /tmp/synth1
    SPARK_GRAFT_ONLY=q_dedup_minhash,... sbt "runMain graft.Verify \
        /tmp/synth1 /tmp/synth1_out"
    python3 scripts/selfcheck.py /tmp/synth1 /tmp/synth1_out

Schemas mirror /root/testdata/sf*/: documents(doc_id BIGINT, text
VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT),
embeddings(vec_id BIGINT, embedding FLOAT[], label INT). doc_id stays
0..N-1 because the query fixtures split/plant on id ranges. NOT part
of the shipped library.

Replayable subset = every documents/embeddings-only query EXCEPT
q_embed_neardup, whose oracle is construction-based (it asserts
exactly the planted +100000 twins, valid only when the corpus has no
natural cosine >= 0.95 pair — this generator plants in-table twins,
so natural pairs exist by design). Round-13 status: 41 queries green
on seeds 1 and 2; first runs surfaced and fixed four oracle bugs
(NaN fallback shingles, NULL category join rows, two variant-
distinctness construction shortcuts).
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 500
N_VECS = 500
DIM = 64

# ASCII-only vocabulary (the oracle SQL replays tokenization /
# md5-shingling in DuckDB; unicode regex-class semantics differ across
# engines and would flag cross-engine noise, not operator bugs), but
# structurally nasty: punctuation-glued tokens, repeated stopwords,
# very long tokens, digit runs.
VOCAB = (
    "the a of and to in is it for on with as by at or be this that "
    "data spark query table scan join merge sort hash batch stream "
    "row column key value filter group window agg part line order "
    "x1 x2 y10 y2 z999 0 00 123456789 "
    "end. start, semi; colon: dash-dash quote' paren( bang! "
    "supercalifragilisticexpialidocious pneumonoultramicroscopic "
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
).split()


def gen_documents(rng):
    # zipf-ish token skew: p ~ 1/(rank+1)
    p = 1.0 / (np.arange(len(VOCAB)) + 1.0)
    p /= p.sum()
    langs = ["en", "en", "en", "es", "zh", "de", None]
    texts = []
    for i in range(N_DOCS):
        r = rng.random()
        # TWIN-RANGE CONTRACT (ids < 150): the query fixtures plant
        # truncation twins at doc_id+100000 for doc_id < 150, and the
        # minhash oracle asserts every planted pair is RECOVERED — which
        # only holds when the twin's jaccard is decisively above the
        # 0.3 threshold. An empty doc's twin is empty (identical,
        # jaccard 1 via the whole-text shingle fallback) and a >= 35-
        # token doc's 90%-char twin sits near jaccard 0.8 (banding
        # recall ~1-3e-8); a 1..~10-token doc's twin is GENUINELY not a
        # near-dup (truncation destroys a tiny shingle set), so short
        # non-empty docs are kept OUT of the twin range and appear only
        # at ids >= 150.
        in_twin_range = i < 150
        if r < 0.04 and texts:
            # exact duplicate of a random earlier doc (random position,
            # unlike the fixtures' planted +offset twins)
            base = texts[rng.integers(0, len(texts))]
            if in_twin_range and 0 < len(base.split()) < 35:
                base = ""
            texts.append(base)
        elif r < 0.10 and texts:
            # near-duplicate: one token appended to an earlier doc
            base = texts[rng.integers(0, len(texts))]
            if in_twin_range and len(base.split()) < 35:
                base = " ".join(rng.choice(VOCAB, size=40, p=p))
            texts.append((base + " " + VOCAB[rng.integers(0, len(VOCAB))])
                         .strip())
        elif r < 0.13:
            texts.append("")                       # empty text
        elif r < 0.15 and not in_twin_range:
            texts.append(VOCAB[rng.integers(0, len(VOCAB))])  # one token
        else:
            n = int(rng.pareto(1.5) * 8) + 1       # heavy-tailed length
            if in_twin_range:
                n = max(n, 35)
            texts.append(" ".join(rng.choice(VOCAB, size=min(n, 200),
                                             p=p)))
    return pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([langs[rng.integers(0, len(langs))]
                          for _ in range(N_DOCS)], pa.string()),
        # dominant source: ~60% srcA (sourceFilter / coverage skew)
        "source": pa.array([
            None if rng.random() < 0.03
            else ("srcA" if rng.random() < 0.6
                  else f"src{rng.integers(0, 8)}")
            for _ in range(N_DOCS)], pa.string()),
        # consistent with text (tie-heavy via duplicates + short docs)
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(rng):
    # quantized to 1/64 so every value is exact in float32 AND in the
    # oracle's float64 replay; duplicates + tiny perturbations planted
    vecs = np.round(rng.normal(0, 1, (N_VECS, DIM)) * 64) / 64.0
    for i in range(0, N_VECS, 25):
        j = int(rng.integers(0, N_VECS))
        vecs[i] = vecs[j]                          # exact twin
        if i + 1 < N_VECS:
            vecs[i + 1] = vecs[j].copy()
            vecs[i + 1][0] += 1.0 / 64             # near twin
    return pa.table({
        "vec_id": pa.array(range(N_VECS), pa.int64()),
        "embedding": pa.array([v.astype(np.float32) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 5, N_VECS), pa.int32()),
    })


def main():
    seed, out = int(sys.argv[1]), sys.argv[2]
    rng = np.random.default_rng(seed)
    import os
    os.makedirs(out, exist_ok=True)
    pq.write_table(gen_documents(rng), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(rng), f"{out}/embeddings.parquet")
    print(f"[synthgen] seed={seed} -> {out}/documents.parquet, "
          f"{out}/embeddings.parquet")


if __name__ == "__main__":
    main()
