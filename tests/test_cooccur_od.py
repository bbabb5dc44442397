"""PMI co-occurrence + OD matrix: pure-python reference parity and
the vocabulary-band / per-doc-distinct fan guards."""
from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import pytest


# ------------------------------------------------------------------ PMI
DOCS = [
    (0, "cat dog cat bird"),  # distinct: cat dog bird
    (1, "cat dog fish"),
    (2, "cat dog"),
    (3, "dog fish bird"),
    (4, "cat fish"),
    (5, "cat dog bird xyzzy"),  # xyzzy is a hapax -> out of vocab
    (6, "cat dog"),
    (7, "fish bird cat"),
]
MIN_DF, MAX_DF, MIN_PAIRS = 2, 0.9, 2


def _pmi_reference():
    n = len(DOCS)
    per_doc = [set(t for t in txt.split() if t.isalpha()) for _, txt in DOCS]
    df = Counter(t for s in per_doc for t in s)
    vocab = {t for t, c in df.items() if MIN_DF <= c <= n * MAX_DF}
    pair_n = Counter()
    for s in per_doc:
        terms = sorted(t for t in s if t in vocab)
        for i, a in enumerate(terms):
            for b in terms[i + 1:]:
                pair_n[(a, b)] += 1
    out = {}
    for (a, b), nab in pair_n.items():
        if nab >= MIN_PAIRS:
            pmi = math.log(nab * n / (df[a] * df[b]))
            out[(a, b)] = (nab, df[a], df[b], math.floor(pmi * 1e4))
    return out


def test_pmi_matches_reference(spark):
    from proj_spark.operators.cooccur import pmi_pairs

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["term_a"], r["term_b"]): (r["n_ab"], r["n_a"], r["n_b"], r["pmi_q"])
        for r in pmi_pairs(df, MIN_DF, MAX_DF, MIN_PAIRS).collect()
    }
    assert got == _pmi_reference()


def test_pmi_stopword_ceiling_drops_ubiquitous_term(spark):
    from proj_spark.operators.cooccur import pmi_pairs

    docs = [(i, f"stop w{i % 3}") for i in range(10)]  # 'stop' in all docs
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = pmi_pairs(df, min_df=2, max_df_ratio=0.8, min_pairs=1).collect()
    assert all("stop" not in (r["term_a"], r["term_b"]) for r in rows)


def test_pmi_repeated_token_counts_once(spark):
    from proj_spark.operators.cooccur import pmi_pairs

    docs = [(0, "a b a b a b"), (1, "a b")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = pmi_pairs(df, min_df=1, max_df_ratio=1.0, min_pairs=1).collect()
    assert len(rows) == 1 and rows[0]["n_ab"] == 2


# ------------------------------------------------------------ OD matrix
BASE = dt.datetime(2024, 5, 1, 8, 0, 0)


def test_od_matrix_first_last_per_day(spark):
    from proj_spark.operators.trajectory import od_matrix

    rows = [
        # user 1, day 0: A -> B (middle ping C must be ignored)
        (1, BASE, 0, -100.0, 40.0),
        (1, BASE + dt.timedelta(hours=2), 1, -90.0, 30.0),
        (1, BASE + dt.timedelta(hours=4), 2, -80.0, 20.0),
        # user 1, day 1: stays at A -> self-flow
        (1, BASE + dt.timedelta(days=1), 3, -100.0, 40.0),
        # user 2, day 0: same A -> C flow as user 1? no: A -> C
        (2, BASE, 4, -100.0, 40.0),
        (2, BASE + dt.timedelta(hours=1), 5, -80.0, 20.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "lon", "lat"])
    got = {
        (r["o_cell"], r["d_cell"]): (r["n_trips"], r["n_users"])
        for r in od_matrix(df, res=6, tie="event_id").collect()
    }

    def cell(lon, lat, res=6):
        n = 1 << res
        ix = min(max(int(math.floor((lon + 180.0) / 360.0 * 2 * n)), 0), 2 * n - 1)
        iy = min(max(int(math.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)
        return iy * 2 * n + ix

    a, b, c = cell(-100.0, 40.0), cell(-90.0, 30.0), cell(-80.0, 20.0)
    assert got == {(a, c): (2, 2), (a, a): (1, 1)}
    assert b not in {k[0] for k in got} | {k[1] for k in got} or b in (a, c)
