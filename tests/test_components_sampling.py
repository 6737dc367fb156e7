"""Connected-components dedup clustering + deterministic sampling +
exact quantiles (operators/components.py, operators/sampling.py)."""

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from page_segmentation_spark.operators import components as CC
from page_segmentation_spark.operators import sampling as SA


def _pairs(spark, edges):
    return spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges], "id_a long, id_b long"
    )


def _nodes(spark, ids):
    return spark.createDataFrame([Row(doc_id=i) for i in ids], "doc_id long")


def _labels_map(df):
    return {r["id"]: r["label"] for r in df.collect()}


def test_cc_basic_components(spark):
    # {1,2,3} via chain, {10,11}, singleton {20}
    nodes = _nodes(spark, [1, 2, 3, 10, 11, 20])
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    got = _labels_map(
        CC.connected_components(nodes, pairs, id_col="doc_id", iters=3)
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_cc_fixed_iters_exact_within_propagation_bound(spark):
    # Path of 7 nodes with the min at one end: every node is within 6
    # hops of the min, so iters=6 must be exact (propagation bound).
    n = 7
    nodes = _nodes(spark, list(range(n)))
    pairs = _pairs(spark, [(i, i + 1) for i in range(n - 1)])
    got = _labels_map(
        CC.connected_components(nodes, pairs, id_col="doc_id", iters=6)
    )
    assert set(got.values()) == {0}
    assert len(got) == n


def test_cc_converged_exact_on_adversarial_chain(spark):
    # Path of 33 nodes whose id sequence is shuffled (min mid-path) —
    # the adversarial layout where fixed iters under-converges; the
    # converged variant must reach the exact fixed point.
    n = 33
    nodes = _nodes(spark, list(range(n)))
    seq = [16, 5, 30, 0, 22, 9, 27, 3, 18, 12, 31, 7, 24, 1, 14, 29, 6,
           20, 11, 32, 2, 25, 8, 17, 13, 28, 4, 21, 10, 26, 15, 23, 19]
    edges = [
        (min(a, b), max(a, b)) for a, b in zip(seq, seq[1:])
    ]
    pairs = _pairs(spark, edges)
    labels, rounds = CC.connected_components_converged(
        nodes, pairs, id_col="doc_id", max_iters=40
    )
    got = _labels_map(labels)
    assert set(got.values()) == {0}
    assert len(got) == n
    assert rounds <= 40


def test_cc_under_iteration_never_merges_components(spark):
    # Safety property: too few rounds may leave a component split but
    # must NEVER join two true components.
    nodes = _nodes(spark, list(range(8)))
    pairs = _pairs(spark, [(0, 1), (1, 2), (2, 3), (5, 6), (6, 7)])
    got = _labels_map(
        CC.connected_components(nodes, pairs, id_col="doc_id", iters=1)
    )
    comp_a = {got[i] for i in (0, 1, 2, 3)}
    comp_b = {got[i] for i in (5, 6, 7)}
    assert comp_a.isdisjoint(comp_b)
    assert got[4] == 4


def test_cc_converged_reaches_fixed_point(spark):
    n = 33
    nodes = _nodes(spark, list(range(n)))
    pairs = _pairs(spark, [(i, i + 1) for i in range(n - 1)])
    labels, rounds = CC.connected_components_converged(
        nodes, pairs, id_col="doc_id", max_iters=20
    )
    got = _labels_map(labels)
    assert set(got.values()) == {0}
    # shortcutting => far fewer rounds than the diameter
    assert rounds <= 8


def test_cc_checked_exact_on_converged_graph(spark):
    # Same fixture as test_cc_basic_components: iters=3 converges, so
    # the checked variant returns identical labels (and no error).
    nodes = _nodes(spark, [1, 2, 3, 10, 11, 20])
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    got = _labels_map(
        CC.connected_components_checked(
            nodes, pairs, id_col="doc_id", iters=3
        )
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_cc_checked_fails_loud_when_under_iterated(spark):
    # The adversarial shuffled path (min mid-chain) under-converges at
    # iters=1; the checked variant must fail the JOB with an explicit
    # raise_error instead of silently returning split components — the
    # driver-gate row uses it so a deepened fixture becomes an obvious
    # error, not a confusing hash mismatch.
    n = 33
    nodes = _nodes(spark, list(range(n)))
    seq = [16, 5, 30, 0, 22, 9, 27, 3, 18, 12, 31, 7, 24, 1, 14, 29, 6,
           20, 11, 32, 2, 25, 8, 17, 13, 28, 4, 21, 10, 26, 15, 23, 19]
    pairs = _pairs(
        spark, [(min(a, b), max(a, b)) for a, b in zip(seq, seq[1:])]
    )
    checked = CC.connected_components_checked(
        nodes, pairs, id_col="doc_id", iters=1
    )
    with pytest.raises(Exception, match="label still moving"):
        checked.collect()


def test_cc_checked_is_action_free_at_construction(spark):
    # The in-plan proof must not run a driver action while the plan is
    # being built (driver-gate policy, test_plan_audits.py).
    from pyspark.sql import DataFrame

    nodes = _nodes(spark, [1, 2, 3])
    pairs = _pairs(spark, [(1, 2)])
    actions = ("collect", "first", "take", "head", "count", "toPandas")
    saved = {a: getattr(DataFrame, a) for a in actions}

    def _boom(name):
        def _f(self, *args, **kwargs):
            raise AssertionError(f"action {name} at construction")
        return _f

    try:
        for a in actions:
            setattr(DataFrame, a, _boom(a))
        CC.connected_components_checked(
            nodes, pairs, id_col="doc_id", iters=2
        )
    finally:
        for a, f in saved.items():
            setattr(DataFrame, a, f)


def test_cc_representatives(spark):
    nodes = _nodes(spark, [1, 2, 3, 10, 11, 20])
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    labels = CC.connected_components(nodes, pairs, id_col="doc_id", iters=3)
    reps = {
        r["component_id"]: (r["cluster_size"], r["n_dropped"])
        for r in CC.representatives(labels).collect()
    }
    assert reps == {1: (3, 2), 10: (2, 1), 20: (1, 0)}


# ---------------------------------------------------------------- sampling

def _h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def docs(spark):
    # skewed strata: a=12, b=4, c=2 rows
    rows = []
    i = 0
    for stratum, n in [("a", 12), ("b", 4), ("c", 2)]:
        for _ in range(n):
            rows.append(Row(doc_id=i, stratum=stratum))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, stratum string")


def test_deterministic_sample_matches_python_twin(spark, docs):
    kept = {
        r["doc_id"]
        for r in SA.deterministic_sample(
            docs, key_col="doc_id", rate=0.5, salt="t1"
        ).collect()
    }
    expect = {
        i for i in range(18) if _h32_py(f"{i}:t1") < 0.5 * 2**32
    }
    assert kept == expect
    # different salt -> different (independent) sample
    kept2 = {
        r["doc_id"]
        for r in SA.deterministic_sample(
            docs, key_col="doc_id", rate=0.5, salt="t2"
        ).collect()
    }
    assert kept2 != kept


def test_temperature_rates(spark, docs):
    rates = {
        r["stratum"]: (r["n_docs"], r["rate"])
        for r in SA.temperature_rates(docs, stratum_col="stratum").collect()
    }
    assert rates["c"] == (2, 1.0)
    assert rates["b"] == (4, math.sqrt(2 / 4))
    assert rates["a"] == (12, math.sqrt(2 / 12))


def test_stratified_sample_rowset_matches_summary(spark, docs):
    kept = SA.stratified_sample(
        docs, stratum_col="stratum", key_col="doc_id", salt="m1"
    )
    by_stratum = {
        r["stratum"]: r["n"]
        for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    summary = {
        r["stratum"]: r["n_kept"]
        for r in SA.stratified_sample_summary(
            docs, stratum_col="stratum", key_col="doc_id", salt="m1"
        ).collect()
    }
    for s in ("a", "b", "c"):
        assert summary.get(s, 0) == by_stratum.get(s, 0)
    # smallest stratum keeps everything (rate 1.0)
    assert summary["c"] == 2


def test_stratified_sample_python_twin(spark, docs):
    kept = {
        r["doc_id"]
        for r in SA.stratified_sample(
            docs, stratum_col="stratum", key_col="doc_id", salt="m1"
        ).collect()
    }
    rates = {"a": math.sqrt(2 / 12), "b": math.sqrt(2 / 4), "c": 1.0}
    strat = lambda i: "a" if i < 12 else ("b" if i < 16 else "c")  # noqa: E731
    expect = {
        i
        for i in range(18)
        if _h32_py(f"{i}:m1") < rates[strat(i)] * 2**32
    }
    assert kept == expect


def test_driver_fixture_converges_within_gated_iters(spark):
    """The gated `dedup_components` row runs fixed iters=4 against an
    EXACT recursive-CTE oracle (queries.py).  Fixed iteration is exact
    only while every fixture component sits within the propagate+shortcut
    horizon — this test recomputes the same fixture pairs and asserts the
    fixed-iters labels equal the converged fixed point, so a fixture or
    threshold change that needs more rounds fails HERE with a clear
    message instead of as a confusing driver-gate hash mismatch."""
    from pyspark.sql import functions as F

    from page_segmentation_spark.operators import dedup as D

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").where(
        F.col("doc_id") < 100
    )
    pairs = D.simhash_neardup_pairs(
        d, "doc_id", "text", max_hamming=8, bits=64
    ).persist()
    fixed = _labels_map(
        CC.connected_components(d, pairs, id_col="doc_id", iters=4)
    )
    converged, rounds = CC.connected_components_converged(
        d, pairs, id_col="doc_id", max_iters=20
    )
    assert fixed == _labels_map(converged), (
        "dedup_components fixture needs more than iters=4 to converge "
        f"(converged in {rounds} rounds) — bump iters in queries.py"
    )


def test_token_budget_sample_exact_prefix(spark):
    from page_segmentation_spark.operators import sampling as SA
    from page_segmentation_spark.operators.sampling import sample_hash_u

    rows = [(i, "g%d" % (i % 2), 100 + (i % 5) * 30) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, g string, toks long")
    kept = SA.token_budget_sample(
        df, group_col="g", tokens_col="toks", key_col="id",
        budget=500, salt="s", mode="exact",
    ).collect()
    # recompute expected prefix per group in hash order
    hashed = df.select(
        "id", "g", "toks", sample_hash_u(F.col("id"), "s").alias("u")
    ).collect()
    for g in ("g0", "g1"):
        seq = sorted(
            ((r["u"], r["id"], r["toks"]) for r in hashed if r["g"] == g)
        )
        want, acc = set(), 0
        for _u, i, t in seq:
            if acc < 500:
                want.add(i)
            acc += t
        got = {r["id"] for r in kept if r["g"] == g}
        assert got == want, g
        kept_toks = sum(t for _u, i, t in seq if i in want)
        assert kept_toks >= 500  # budget reached (group is big enough)


def test_token_budget_sample_rate_mode(spark):
    from page_segmentation_spark.operators import sampling as SA

    rows = [(i, "g", 100) for i in range(200)]  # 20k tokens total
    df = spark.createDataFrame(rows, "id long, g string, toks long")
    kept = SA.token_budget_sample(
        df, group_col="g", tokens_col="toks", key_col="id",
        budget=5000, salt="s", mode="rate",
    )
    n = kept.count()
    # rate = 0.25 -> expected 50 docs; uniform hash concentrates tightly
    assert 30 <= n <= 70
    # determinism under repartition
    n2 = SA.token_budget_sample(
        df.repartition(7), group_col="g", tokens_col="toks",
        key_col="id", budget=5000, salt="s", mode="rate",
    ).count()
    assert n == n2
    # zero windows in the scale path
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # budget >= total keeps everything
    assert SA.token_budget_sample(
        df, group_col="g", tokens_col="toks", key_col="id",
        budget=10**9, salt="s", mode="rate",
    ).count() == 200
