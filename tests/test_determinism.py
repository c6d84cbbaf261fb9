"""Determinism double-run (SURVEY §5.2 item 3): every hash-checked query must
produce identical values under different shuffle partitionings — catches float
aggregation-order violations of §2.0 rule 1 before the oracle does.

This runs the FULL hash inventory, not a sample: the external driver executes
queries under ITS OWN shuffle-partition setting, so a partitioning-sensitive
result that happens to match DuckDB at the test partitioning would still fail
the driver's check. ~2 runs per query at sf0.001 keeps this fast.
"""

from __future__ import annotations

import pytest

from eviction_lab_etl_spark.registry import ORACLES, QUERIES

from tests.compare import canon_spark

HASH_QUERIES = sorted(name for name in QUERIES if name in ORACLES)


def _fixture_dirs(filename):
    """Every fixture dir the driver or bench touches that carries
    ``filename``: the env-pinned dir first, then sf0.001/0.01/0.1 siblings
    (deduped, order-preserving)."""
    import os

    base = os.path.dirname(
        os.environ.get("ELSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")
    )
    dirs = [
        d
        for d in (os.environ.get("ELSPARK_TEST_SF_DIR"),)
        + tuple(os.path.join(base, f"sf{s}") for s in ("0.001", "0.01", "0.1"))
        if d and os.path.exists(os.path.join(d, filename))
    ]
    assert dirs, f"no fixture dirs with {filename} found"
    return list(dict.fromkeys(dirs))


@pytest.mark.parametrize("name", HASH_QUERIES)
def test_double_run_identical(spark, sf_dir, name):
    results = []
    for partitions in ("1", "13"):
        spark.conf.set("spark.sql.shuffle.partitions", partitions)
        try:
            results.append(canon_spark(QUERIES[name](spark, sf_dir)))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "7")
    assert results[0] == results[1], f"{name}: result depends on partitioning"


def test_idf_micro_floor_margins():
    """`text_tfidf_topterms` and `search_bm25_topk` floor a log-scaled idf to
    integer micro-units and claim both engines land on the same integer.
    That claim is sound only if the true value sits far enough from every
    floor boundary that a 1-ulp libm divergence (~1e-9 at this magnitude)
    cannot cross it. Pin the margin >= 0.02 micro-units for EVERY reachable
    (n, df) pair on EVERY fixture scale the driver or bench touches."""
    import math
    import os

    import duckdb

    for sf_path in _fixture_dirs("documents.parquet"):
        sf = os.path.basename(sf_path)
        con = duckdb.connect()
        docs = os.path.join(sf_path, "documents.parquet")
        n = con.sql(f"SELECT count(*) FROM '{docs}'").fetchone()[0]
        dfs = con.sql(
            f"""
            WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                         FROM '{docs}')
            SELECT t, count(DISTINCT doc_id) AS df FROM tok WHERE t <> ''
            GROUP BY t
            """
        ).fetchall()
        for term, df in dfs:
            x = math.log((n + 1.0) / (df + 1.0)) * 1_000_000  # tfidf idf
            frac = x - math.floor(x)
            assert 0.02 <= frac <= 1 - 0.02 or x == 0.0, (
                f"{sf} tfidf term={term!r} df={df} frac={frac}"
            )
            from eviction_lab_etl_spark.operators.pipelines import HN_QUERIES

            bm25_vocab = {"hash", "join", "spark"} | {
                t for _, terms in HN_QUERIES for t in terms
            }
            if term in bm25_vocab:  # bm25 + hard-negative query vocabulary
                y = math.log(1 + (n - df + 0.5) / (df + 0.5)) * 1_000_000
                fy = y - math.floor(y)
                assert 0.02 <= fy <= 1 - 0.02, (
                    f"{sf} bm25 term={term!r} df={df} frac={fy}"
                )
        # search_hybrid_rrf runs bm25_scores over the RESTRICTED corpus
        # (doc_id < 500 \ {0}), producing (n, df) floor inputs the
        # full-corpus loop above never reaches — pin those margins too.
        n_r = con.sql(
            f"SELECT count(*) FROM '{docs}' WHERE doc_id < 500 AND doc_id <> 0"
        ).fetchone()[0]
        dfs_r = con.sql(
            f"""
            WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                         FROM '{docs}' WHERE doc_id < 500 AND doc_id <> 0)
            SELECT t, count(DISTINCT doc_id) AS df FROM tok
            WHERE t IN ('hash', 'join', 'spark') GROUP BY t
            """
        ).fetchall()
        for term, df in dfs_r:
            y = math.log(1 + (n_r - df + 0.5) / (df + 0.5)) * 1_000_000
            fy = y - math.floor(y)
            assert 0.02 <= fy <= 1 - 0.02, (
                f"{sf} hybrid-restricted bm25 term={term!r} df={df} frac={fy}"
            )


def test_entropy_micro_floor_margins():
    """`text_mix_entropy` floors each per-language entropy contribution
    `997000 * n_i/n_tot * ln(n_tot/n_i)` to integer quasi-micro-nats and claims both
    engines land on the same integer. Pin the boundary margin >= 0.02
    units for EVERY reachable (n_i, n_tot) pair on every fixture scale
    (the singleton n_i == n_tot contributes ln(1) = 0 exactly and is
    exempt), so a 1-ulp libm divergence cannot cross a floor boundary."""
    import math
    import os

    import duckdb

    for sf_path in _fixture_dirs("documents.parquet"):
        sf = os.path.basename(sf_path)
        con = duckdb.connect()
        docs = os.path.join(sf_path, "documents.parquet")
        pairs = con.sql(
            f"""
            WITH c AS (SELECT source, lang, count(*) AS n_i FROM '{docs}'
                       GROUP BY 1, 2)
            SELECT n_i, sum(n_i) OVER (PARTITION BY source) AS n_tot FROM c
            """
        ).fetchall()
        for n_i, n_tot in pairs:
            n_i, n_tot = int(n_i), int(n_tot)
            if n_i == n_tot:
                continue
            x = 997000.0 * n_i / n_tot * math.log(n_tot / n_i)
            frac = x - math.floor(x)
            assert 0.02 <= frac <= 1 - 0.02, (
                f"{sf} n_i={n_i} n_tot={n_tot} frac={frac}"
            )


def test_ewma_value_sign_invariant():
    """`ts_ewma_smooth`'s cross-engine identity (Spark `div` ≡ DuckDB `//`)
    and the cents() quantization are validated for NON-NEGATIVE values only
    (both truncate toward zero, which differs from floor exactly on
    negatives). events.value >= 0.01 on every shipped fixture; if a
    regenerated fixture ever carries a negative amount this fails loudly
    instead of surfacing as an opaque oracle hash mismatch."""
    import os

    import duckdb

    for sf_path in _fixture_dirs("events.parquet"):
        ev = os.path.join(sf_path, "events.parquet")
        lo = duckdb.sql(f"SELECT min(value) FROM '{ev}'").fetchone()[0]
        assert lo >= 0, (
            f"{os.path.basename(sf_path)}: events.value has negative amounts "
            f"(min={lo}) — the ewma div/cents identity no longer holds"
        )


def test_mmr_decision_gaps():
    """`search_mmr_diverse` compares FLOAT scores (the sim_knn_cosine
    discipline: floats never emitted, only ranks/ids) — sound only if every
    comparison the greedy makes is decided by a gap far above cross-engine
    cosine divergence (~1e-15 on the sequential fold vs DuckDB's
    list_cosine_similarity) or by an EXACT tie (duplicate embeddings,
    broken by doc_id). Replay the greedy in Python at every fixture scale
    and pin: the top-20/21 candidate cut, all adjacent rel_rank gaps, and
    each pick's winner-vs-runner-up gap, all >= 1e-9 — or exactly 0 with
    the tie verified STRUCTURAL (bitwise-identical embeddings)."""
    import math
    import os

    import duckdb

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
            na += float(x) * float(x)
            nb += float(y) * float(y)
        return dot / (math.sqrt(na) * math.sqrt(nb))

    for sf_path in _fixture_dirs("embeddings.parquet"):
        sf = os.path.basename(sf_path)
        emb = dict(
            duckdb.sql(
                f"SELECT vec_id, embedding FROM "
                f"'{os.path.join(sf_path, 'embeddings.parquet')}' "
                f"WHERE vec_id < 500"
            ).fetchall()
        )
        q = emb[0]
        rels = {i: cos(v, q) for i, v in emb.items() if i != 0}
        order = sorted(rels, key=lambda i: (-rels[i], i))

        def ok(gap, what, a, b):
            # gap == 0.0 is acceptable ONLY when it is STRUCTURAL — the two
            # docs carry bitwise-identical embeddings, so each engine
            # computes exactly equal scores and the id tiebreak decides
            # identically. A coincidental float tie between distinct
            # vectors would let the engines' slightly different cosines
            # order the pair oppositely, so it must fail here.
            if gap == 0.0:
                assert list(emb[a]) == list(emb[b]), (
                    f"{sf} {what}: exact tie between distinct embeddings "
                    f"{a} and {b}"
                )
            else:
                assert gap >= 1e-9, f"{sf} {what}: gap={gap!r}"

        if len(order) > 20:
            ok(rels[order[19]] - rels[order[20]], "top-20 cut",
               order[19], order[20])
        cand = order[:20]
        for i in range(len(cand) - 1):
            ok(rels[cand[i]] - rels[cand[i + 1]], f"rel_rank adj {i}",
               cand[i], cand[i + 1])
        sel = [cand[0]]
        for step in range(4):
            rem = [c for c in cand if c not in sel]
            scores = {
                d: rels[d] - max(cos(emb[d], emb[s]) for s in sel) for d in rem
            }
            so = sorted(rem, key=lambda d: (-scores[d], d))
            ok(scores[so[0]] - scores[so[1]], f"pick {step + 2}",
               so[0], so[1])
            sel.append(so[0])


def test_quality_classifier_floor_margins():
    """`text_quality_classifier` floors each token's log-odds weight
    `11767 * ln(x/y)` (the only float surface — a vocabulary-sized table).
    Pin the boundary margin >= 0.02 quanta for EVERY reachable (x, y)
    product pair on every fixture scale (multiplier searched over the
    shipped fixtures; measured worst margin 0.0447), so a 1-ulp libm
    divergence cannot cross a floor boundary."""
    import math
    import os

    import duckdb

    for sf_path in _fixture_dirs("documents.parquet"):
        sf = os.path.basename(sf_path)
        con = duckdb.connect()
        docs = os.path.join(sf_path, "documents.parquet")
        pairs = con.sql(
            f"""
            WITH tok AS (
                SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
                FROM '{docs}'
            ),
            c AS (
                SELECT w,
                       count(*) FILTER (WHERE lang = 'en') AS cp,
                       count(*) FILTER (WHERE lang <> 'en') AS cn
                FROM tok WHERE doc_id % 10 < 3 GROUP BY w
            ),
            tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn, count(*) AS v FROM c)
            SELECT (cp + 1) * (tn + v), (cn + 1) * (tp + v) FROM c, tot
            """
        ).fetchall()
        assert pairs
        for x, y in pairs:
            val = 11767.0 * math.log(int(x) / int(y))
            frac = val - math.floor(val)
            assert 0.02 <= frac <= 1 - 0.02, f"{sf} x={x} y={y} frac={frac}"
