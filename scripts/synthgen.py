#!/usr/bin/env python3
"""Dev-only seeded ADVERSARIAL testdata generator (VERDICT r11 item 7).

Usage: python3 scripts/synthgen.py <seed> <outDir>

All 135 oracles replay on the driver's fixed testdata; this writes a
full seeded synthetic tenth-scale testdata set (documents,
embeddings, events, and the seven TPC-H tables) with the shapes that
fixed data never exercises — exact-duplicate and
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
embeddings(vec_id BIGINT, embedding FLOAT[], label INT),
events(event_id BIGINT, ts TIMESTAMP_NS, user_id BIGINT, event_type
VARCHAR, value DOUBLE, props VARCHAR). doc_id stays 0..N-1 because
the query fixtures split/plant on id ranges. NOT part of the shipped
library.

The events table targets the sessionization / as-of / window family
(q_sessionize, q_session_window, q_session_prefixes, q_event_dedup,
q_asof_join, q_attribution, q_events_window, q_events_sliding,
q_sessionize_stream, q_stream_drift, q_zvalue, q_layout_sorted,
q_zorder_layout) with the tie/boundary structure the driver's events
never contain: duplicate timestamps within a user (identical ns and
same-us-different-ns), session gaps of exactly 1800 s (same session
for the floor-second `> gap` sessionizer, NEW session for
session_window's `>= gap` us semantics — the two operators must
diverge identically in both engines), dedup gaps of exactly 60 and
61 floor-seconds, purchase-at-view-timestamp and purchase-at-
view+1-day attribution boundaries, events exactly on and 1 ns under
hour-bucket edges, a 25-event single-second burst user, single-event
users, and heavy user skew.

Two generator-side contracts keep construction-sensitive oracles
valid: VIEW events are (user_id, ts_us)-unique (DuckDB's ASOF JOIN
breaks us-ties arbitrarily, so q_asof_join's contract requires
unique view timestamps per user — collisions are retyped to click),
and `value` is never NULL (the drift monitor null-filters before
binning; its oracle replays the grid without a null branch).

The TPC-H tables target the relational/dataflow families (joins,
windows, delta, pivots, sampling fixtures, state tables, sinks) with
order-price ties, a 300-line burst order, an exact part-count tie,
orphan FKs, quantity plants at filter edges, and millisecond
year-boundary dates — see gen_tpch's docstring for the fixture
contracts it honors.

Replayable subset = the FULL 135-query suite. (q_embed_neardup's
oracle was the last construction-bound one — it asserted exactly the
planted +100000 twins; it now replays the whole sign-LSH pipeline
generically, since the hyperplanes are md5-derived and DuckDB can
rebuild the exact band keys.) Round-13 status: 135/135 green on
seeds 1 and 2. The replays surfaced and fixed seven real
divergences: six oracle bugs (NaN fallback shingles, NULL category
join rows, two variant-distinctness construction shortcuts, NULLS
LAST ordering under null lang / event_type, and a falsified
session_window boundary claim - Spark merges an event arriving
exactly at the previous session's end, the `>=` replay split it) and
ONE operator bug — quotaSample's restore join dropped a NULL
stratum's entire quota (null-unsafe equi-join after a window head
that counted NULL as a group; no driver fixture has a NULL lang, so
135-green never reached it).
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


def gen_documents(rng, skew=False):
    # zipf-ish token skew: p ~ 1/(rank+1)
    p = 1.0 / (np.arange(len(VOCAB)) + 1.0)
    p /= p.sum()
    if skew:
        # HOT TERM (skew knob, VERDICT r14 item 8): half of every token
        # draw lands on VOCAB[0] — stresses the hot-posting inverted
        # index, vocab top-k, and co-occurrence oracles
        p = p * 0.5
        p[0] += 0.5
    # MEGA-CLUSTER base (skew): one 40-token body shared by ~8% of the
    # non-twin-range docs (each with one unique trailing token), so
    # MinHash banding gets one giant bucket and CC labeling one giant
    # component — as a CORRECTNESS input, not just a bench fixture
    mega_base = " ".join(rng.choice(VOCAB, size=40, p=p)) if skew else None
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
        elif skew and r < 0.23 and not in_twin_range:
            # mega-cluster member: shared base + unique trailing token
            # (near-identical pairwise, never byte-identical)
            texts.append(f"{mega_base} u{i}")
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


N_USERS = 80
EPOCH_NS = 1704067200 * 10**9          # 2024-01-01 00:00:00 UTC
DAY_NS = 86400 * 10**9
SEC_NS = 10**9


def gen_events(rng, skew=False):
    types = np.array(["view", "click", "purchase", "signup", "error"])
    type_p = np.array([0.35, 0.20, 0.15, 0.15, 0.15])
    rows = []                           # (ts_ns, user, type, value)

    def val():
        # ~20% exact integers: floor(value) ties for the drift binner
        # and DECIMAL-exact sums everywhere
        v = rng.uniform(0.01, 500.0)
        return float(int(v)) if rng.random() < 0.2 else round(v, 2)

    # --- bulk: user skew p ~ 1/(rank+2); users 70..79 get exactly one
    # event each (single-event sessions), user 60 is reserved for the
    # burst below
    p = 1.0 / (np.arange(60) + 2.0)
    p /= p.sum()
    for _ in range(3600):
        # HOT USER (skew knob): ~25% of bulk events land on user 3 — a
        # key outside every plant range (20..39 boundary ladders, 60
        # burst, 70..79 singles) — so per-user windows, quota/stratified
        # sampling, and top-k replay against a hot stratum
        if skew and rng.random() < 0.25:
            u = 3
        else:
            u = int(rng.choice(60, p=p))
        ts = EPOCH_NS + int(rng.integers(0, 27 * DAY_NS))
        rows.append((ts, u, str(rng.choice(types, p=type_p)), val()))
    for u in range(70, N_USERS):
        rows.append((EPOCH_NS + int(rng.integers(0, 27 * DAY_NS)),
                     u, str(rng.choice(types, p=type_p)), val()))

    # --- burst user 60: 25 events inside one second — identical-ns
    # ties and same-us-different-ns ties; clicks/errors only (the view
    # uniqueness contract stays trivially satisfied)
    t0 = EPOCH_NS + 5 * DAY_NS + 3723 * SEC_NS
    for i in range(25):
        off = [0, 0, 1, 500, 999, 1000, 2000][i % 7]  # ns offsets
        rows.append((t0 + off, 60, "click" if i % 3 else "error", val()))

    # --- per-user boundary plants, users 20..39 (kept clear of the
    # zipf bulk's hottest ids so plant structure is not drowned out)
    for u in range(20, 40):
        base = EPOCH_NS + (u - 18) * DAY_NS + int(rng.integers(0, 3600)) * SEC_NS
        # session-gap ladder: gaps of exactly 1799 s, 1800 s, 1801 s,
        # and 1800 s + 999999 us (floor-second gap still 1800)
        t = base
        for gap_ns in (1799 * SEC_NS, 1800 * SEC_NS, 1801 * SEC_NS,
                       1800 * SEC_NS + 999999000):
            rows.append((t, u, "click", val()))
            t += gap_ns
        rows.append((t, u, "click", val()))
        # dedup ladder on (user, click): 60 s (dropped), 61 s (kept),
        # 60.999999 s (floor gap 60 -> dropped)
        t = base + 10 * DAY_NS
        for gap_ns in (60 * SEC_NS, 61 * SEC_NS, 60 * SEC_NS + 999999000):
            rows.append((t, u, "click", val()))
            t += gap_ns
        rows.append((t, u, "click", val()))
        # as-of / attribution boundaries: purchase before any view
        # (asof NULL match), purchase AT the view's timestamp
        # (inclusive >=), at view + 1 day exactly (attribution
        # inclusive upper), and at view + 1 day + 1 us (excluded)
        tv = base + 15 * DAY_NS
        rows.append((tv - 3600 * SEC_NS, u, "purchase", val()))
        rows.append((tv, u, "view", val()))
        rows.append((tv, u, "purchase", val()))
        rows.append((tv + DAY_NS, u, "purchase", val()))
        rows.append((tv + DAY_NS + 1000, u, "purchase", val()))
        # hour-bucket edges: on the edge, 1 ns under, 1 ns over
        th = base - (base % (3600 * SEC_NS))      # aligned hour
        rows.append((th + 20 * DAY_NS, u, "view", val()))
        rows.append((th + 20 * DAY_NS + 3600 * SEC_NS - 1, u, "click",
                     val()))
        rows.append((th + 20 * DAY_NS + 3600 * SEC_NS + 1, u, "click",
                     val()))

    # --- assemble: shuffle rows, then assign event_id in shuffled
    # order so id order carries no information about plant structure
    rng.shuffle(rows)
    ts = np.array([r[0] for r in rows], dtype="datetime64[ns]")
    user = np.array([r[1] for r in rows], dtype=np.int64)
    etype = [r[2] for r in rows]
    value = np.array([r[3] for r in rows], dtype=np.float64)

    # contract: VIEW timestamps unique per (user, us) — q_asof_join's
    # oracle is DuckDB ASOF with no tie-break. Colliding views retype
    # to click (the deliberate view/purchase same-us plants above are
    # cross-type and unaffected).
    seen = set()
    for i in range(len(rows)):
        if etype[i] == "view":
            key = (int(user[i]), int(rows[i][0]) // 1000)
            if key in seen:
                etype[i] = "click"
            else:
                seen.add(key)

    n = len(rows)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(user),
        "event_type": pa.array(
            [None if rng.random() < 0.02 else t for t in etype],
            pa.string()),
        "value": pa.array(value),
        "props": pa.array(
            [None if rng.random() < 0.05
             else '{"k": %d}' % rng.integers(0, 100) for _ in range(n)],
            pa.string()),
    })


N_ORDERS = 4000
N_LINES = 12000
N_CUST = 400
N_SUPP = 100
N_PART = 400
MS_1995 = 788918400 * 1000              # 1995-01-01 00:00:00 UTC, ms


def _price(rng, lo, hi):
    v = rng.uniform(lo, hi)
    return round(v, 2)


def gen_tpch(rng):
    """TPC-H-shaped tables mirroring the driver's schemas and domains
    (statuses O/F/P, the five priorities, Customer#%09d names, ms
    timestamps 1995..2001) with the tie/skew/boundary structure the
    driver's uniform generator never produces. Query-fixture contracts
    honored: o_orderkey unique and dense from 0 (state-table plants
    < 2000, relay keys < 120), 1996 dates present (partition pruning),
    custkey < 100 users interact and partkey < 300 pool is populated
    (sampling fixtures), c_name >= 11 chars (fuzzy-join substr), all
    FKs resolve (orphan lineitems excepted, deliberately).
    """
    tables = {}
    # --- region / nation: the driver's fixed tiny dimensions
    rnames = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    tables["region"] = pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(rnames, pa.string()),
    })
    tables["nation"] = pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)],
                           pa.string()),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    })
    # --- customer: last 50 keys orderless (semi/anti probes); acctbal
    # with exact ties, zeros, negatives
    bal_pool = [0.0, -1.0, 123.45, 123.45, 9999.99, -994.28]
    tables["customer"] = pa.table({
        "c_custkey": pa.array(range(N_CUST), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)],
                           pa.string()),
        "c_nationkey": pa.array(
            [int(rng.integers(0, 25)) for _ in range(N_CUST)],
            pa.int32()),
        "c_acctbal": pa.array(
            [bal_pool[int(rng.integers(0, len(bal_pool)))]
             if rng.random() < 0.2 else _price(rng, -1000, 10000)
             for _ in range(N_CUST)], pa.float64()),
        "c_mktsegment": pa.array(
            [str(rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY",
                             "HOUSEHOLD", "FURNITURE"]))
             for _ in range(N_CUST)], pa.string()),
    })
    tables["supplier"] = pa.table({
        "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)],
                           pa.string()),
        "s_nationkey": pa.array(
            [int(rng.integers(0, 25)) for _ in range(N_SUPP)],
            pa.int32()),
        "s_acctbal": pa.array([_price(rng, -1000, 10000)
                               for _ in range(N_SUPP)], pa.float64()),
    })
    adjs = ["small", "large", "red", "blue", "hot", "cold", "dim",
            "plated"]
    nouns = ["ring", "widget", "bolt", "gear", "case", "tube", "disk",
             "frame"]
    tables["part"] = pa.table({
        "p_partkey": pa.array(range(N_PART), pa.int64()),
        "p_name": pa.array(
            [f"{adjs[int(rng.integers(0, 8))]} "
             f"{nouns[int(rng.integers(0, 8))]}" for _ in range(N_PART)],
            pa.string()),
        "p_brand": pa.array(
            [f"Brand#{rng.integers(0, 25)}" for _ in range(N_PART)],
            pa.string()),
        "p_type": pa.array(
            [str(rng.choice(["ECONOMY", "SMALL", "MEDIUM", "PROMO",
                             "STANDARD", "LARGE"]))
             for _ in range(N_PART)], pa.string()),
        "p_size": pa.array([int(rng.integers(1, 51))
                            for _ in range(N_PART)], pa.int32()),
        "p_retailprice": pa.array(
            [round(900.0 + rng.integers(0, 1000) / 10.0, 1)
             for _ in range(N_PART)], pa.float64()),
    })
    # --- orders: customer skew p ~ 1/(rank+2) over keys 0..349; exact
    # price ties planted; dates include the 1996 year boundary to the
    # millisecond on both sides
    cp = 1.0 / (np.arange(350) + 2.0)
    cp /= cp.sum()
    n_dates = np.empty(N_ORDERS, dtype="int64")
    prices = np.empty(N_ORDERS, dtype="float64")
    for i in range(N_ORDERS):
        r = rng.random()
        if r < 0.005:
            n_dates[i] = MS_1995 + 365 * 86400000      # 1996-01-01 00:00
        elif r < 0.01:
            n_dates[i] = MS_1995 + 365 * 86400000 - 1  # 1995-12-31 23:59:59.999
        else:
            n_dates[i] = MS_1995 + int(rng.integers(0, 2400)) * 86400000 \
                + int(rng.integers(0, 86400000))
        prices[i] = 1013.70 if rng.random() < 0.03 \
            else _price(rng, 900, 500000)
    tables["orders"] = pa.table({
        "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
        "o_custkey": pa.array(
            [int(rng.choice(350, p=cp)) for _ in range(N_ORDERS)],
            pa.int64()),
        "o_orderstatus": pa.array(
            [str(rng.choice(["O", "F", "P"], p=[0.5, 0.4, 0.1]))
             for _ in range(N_ORDERS)], pa.string()),
        "o_totalprice": pa.array(prices),
        "o_orderdate": pa.array(n_dates.view("datetime64[ms]")),
        "o_orderpriority": pa.array(
            [str(rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM",
                             "4-NOT SPECIFIED", "5-LOW"]))
             for _ in range(N_ORDERS)], pa.string()),
    })
    # --- lineitem: order skew (orderkey 7 gets a 300-line burst),
    # part skew with an EXACT top-count tie between partkeys 13 and 17
    # (key-skew's top-1 then resolves on the VARCHAR key desc), orphan
    # orderkeys >= N_ORDERS, duplicate (orderkey, linenumber) pairs,
    # quantity boundary plants at the fixtures' 48/50 filter edges
    rows = []

    def pk_draw():
        # partkeys 13/17 are reserved for the exact-tie plant below;
        # every other draw remaps them so the tie stays exact
        pk = int(rng.integers(0, N_PART))
        return 18 if pk in (13, 17) else pk

    for _ in range(N_LINES - 300 - 2 * 200 - 20):
        ok = 7 if rng.random() < 0.01 else int(rng.integers(0, N_ORDERS))
        q = float(rng.integers(1, 51))
        if rng.random() < 0.05:
            q = float(rng.choice([48.0, 50.0]))  # filter-edge plants
        rows.append((ok, pk_draw(), q))
    for _ in range(300):                   # burst order
        rows.append((7, pk_draw(), 1.0))
    for _ in range(200):                   # exact part-count tie
        rows.append((int(rng.integers(0, N_ORDERS)), 13,
                     float(rng.integers(1, 51))))
        rows.append((int(rng.integers(0, N_ORDERS)), 17,
                     float(rng.integers(1, 51))))
    for i in range(20):                    # orphan lineitems
        rows.append((N_ORDERS + i, pk_draw(), 2.0))
    rng.shuffle(rows)
    tables["lineitem"] = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([int(rng.integers(0, N_SUPP))
                               for _ in rows], pa.int64()),
        # duplicates within an order by construction: 1..7 at random
        "l_linenumber": pa.array([int(rng.integers(1, 8))
                                  for _ in rows], pa.int32()),
        "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
        "l_extendedprice": pa.array(
            [901.82 if rng.random() < 0.03 else _price(rng, 900, 105000)
             for _ in rows], pa.float64()),
        "l_discount": pa.array(
            [round(int(rng.integers(0, 11)) / 100.0, 2) for _ in rows],
            pa.float64()),
        "l_tax": pa.array(
            [round(int(rng.integers(0, 9)) / 100.0, 2) for _ in rows],
            pa.float64()),
        "l_returnflag": pa.array(
            [str(rng.choice(["A", "N", "R"])) for _ in rows],
            pa.string()),
        "l_linestatus": pa.array(
            [str(rng.choice(["F", "O"])) for _ in rows], pa.string()),
        "l_shipdate": pa.array(
            (MS_1995 + rng.integers(0, 2500, len(rows)) * 86400000)
            .astype("int64").view("datetime64[ms]")),
    })
    return tables


def main():
    seed, out = int(sys.argv[1]), sys.argv[2]
    # Third arg picks the events.ts physical encoding — the driver has
    # shipped BOTH, and round 13 proved a one-encoding engine breaks on
    # regeneration day:
    #   ns (default): TIMESTAMP(NANOS) parquet (version=2.6, no
    #       coercion) — Spark surfaces a nanosecond long under
    #       spark.sql.legacy.parquet.nanosAsLong.
    #   us: timestamp[us] — Spark surfaces TIMESTAMP_NTZ. The ns->us
    #       cast truncates (safe=False), exactly what DuckDB does when
    #       it reads the ns variant, so the two variants carry the SAME
    #       us-resolution instants and every oracle replay must agree.
    ts_enc = sys.argv[3] if len(sys.argv) > 3 else "ns"
    assert ts_enc in ("ns", "us"), f"ts encoding must be ns|us: {ts_enc}"
    # Fourth arg "skew" plants a hot user (~25% of bulk events), a hot
    # term (half of all token draws), and a near-dup mega-cluster (~8%
    # of non-twin-range docs) — the adversarial KEY DISTRIBUTIONS the
    # uniform seeds never produce (VERDICT r14 item 8). Uniform-mode
    # output is bit-identical to before the knob existed (no extra rng
    # draws unless skew is on).
    skew = len(sys.argv) > 4 and sys.argv[4] == "skew"
    rng = np.random.default_rng(seed)
    import os
    os.makedirs(out, exist_ok=True)
    pq.write_table(gen_documents(rng, skew), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(rng), f"{out}/embeddings.parquet")
    events = gen_events(rng, skew)
    if ts_enc == "us":
        i = events.schema.get_field_index("ts")
        events = events.set_column(
            i, "ts", pa.compute.cast(events.column("ts"),
                                     pa.timestamp("us"), safe=False))
        pq.write_table(events, f"{out}/events.parquet")
    else:
        pq.write_table(events, f"{out}/events.parquet",
                       version="2.6")   # keep ns timestamps, no coercion
    for name, tbl in gen_tpch(rng).items():
        pq.write_table(tbl, f"{out}/{name}.parquet", version="2.6")
    print(f"[synthgen] seed={seed} -> {out}: documents, embeddings, "
          f"events ({ts_enc}{', skew' if skew else ''}) + 7 TPC-H tables")


if __name__ == "__main__":
    main()
