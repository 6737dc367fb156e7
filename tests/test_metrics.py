"""Metric aggregation tests on a 4-node doc with known TP/FP/FN
(FIXTURES.md §7)."""

import math

from page_segmentation_spark import metrics as M


def _df(spark):
    # (pred, label, is_fg): fg rows -> 2 correct, 1 wrong; 1 non-fg wrong
    rows = [
        (1, 1, True),
        (1, 0, True),
        (0, 0, True),
        (2, 1, False),
    ]
    return spark.createDataFrame(rows, "pred int, label int, is_fg boolean")


def test_fgpa(spark):
    r = M.fgpa(_df(spark)).first()
    assert abs(r["fgpa"] - 2 / 3) < 1e-12


def test_total_accuracy(spark):
    r = M.total_accuracy(_df(spark)).first()
    assert abs(r["accuracy"] - 0.5) < 1e-12


def test_count_matches_and_f1(spark):
    r = M.f1_measures(_df(spark), cls=1).first()
    # class 1: tp=1 (row0), fp=1 (row1), fn=1 (row3)
    assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 1)
    assert abs(r["precision"] - 0.5) < 1e-12
    assert abs(r["recall"] - 0.5) < 1e-12
    assert abs(r["f1"] - 0.5) < 1e-12


def test_f1_zero_guards(spark):
    df = spark.createDataFrame(
        [(0, 0, True)], "pred int, label int, is_fg boolean"
    )
    r = M.f1_measures(df, cls=1).first()
    assert r["precision"] == 0.0 and r["recall"] == 0.0 and r["f1"] == 0.0


def test_fg_overlap_per_class(spark):
    rows = M.fg_overlap_per_class(_df(spark), n_classes=2).collect()
    by_cls = {r["cls"]: r for r in rows}
    # class 0 on fg: actual rows {2}, expected {1,2} -> tp=1, fp=0, fn=1
    assert (by_cls[0]["tp"], by_cls[0]["fp"], by_cls[0]["fn"]) == (1, 0, 1)
    assert abs(by_cls[0]["overlap"] - 0.5) < 1e-12
    # class 2 never occurs on fg -> overlap NULL (nan analog)
    assert by_cls[2]["overlap"] is None or math.isnan(by_cls[2]["overlap"])


def test_label_percentage(spark):
    df = spark.createDataFrame([(0,), (0,), (1,), (2,)], "label int")
    pct = {r["label"]: r["pct"] for r in M.label_percentage(df).collect()}
    assert abs(pct[0] - 0.5) < 1e-12 and abs(pct[1] - 0.25) < 1e-12


def test_cc_matching(spark):
    rows = [
        ("u", 1, 1, 1),
        ("u", 1, 1, 1),
        ("u", 1, 0, 1),  # cc 1: ratio 2/3 -> tp at 0.5
        ("u", 2, 0, 1),  # cc 2: ratio 0 -> fp
    ]
    df = spark.createDataFrame(rows, "url string, cc_id int, pred int, label int")
    out = {r["cc_id"]: r for r in M.cc_matching(df, threshold=0.5).collect()}
    assert out[1]["is_tp"] == 1 and out[2]["is_tp"] == 0


def test_run_per_component(spark):
    import pandas as pd

    rows = [("u", 1, 1, 1), ("u", 1, 0, 1), ("u", 2, 1, 1)]
    df = spark.createDataFrame(rows, "url string, cc_id int, pred int, label int")

    def acc(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url": [pdf["url"].iloc[0]],
                "cc_id": [pdf["cc_id"].iloc[0]],
                "acc": [(pdf["pred"] == pdf["label"]).mean()],
            }
        )

    out = {
        r["cc_id"]: r["acc"]
        for r in M.run_per_component(
            df, acc, "url string, cc_id int, acc double"
        ).collect()
    }
    assert abs(out[1] - 0.5) < 1e-12 and out[2] == 1.0


def test_cc_relevance_filter(spark):
    rows = [
        # cc 1: 50% label-1 -> kept by ratio
        ("u", 1, 0, 1), ("u", 1, 0, 0),
        # cc 2: no label-1, but one predicted 1 -> kept by prediction
        ("u", 2, 1, 0), ("u", 2, 0, 0),
        # cc 3: neither -> dropped
        ("u", 3, 0, 0), ("u", 3, 2, 2),
    ]
    df = spark.createDataFrame(
        rows, "url string, cc_id int, pred int, label int"
    )
    out = M.cc_relevance_filter(df, cls=1, ratio_threshold=0.4)
    kept = {r["cc_id"] for r in out.collect()}
    assert kept == {1, 2}
