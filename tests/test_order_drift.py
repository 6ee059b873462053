"""Stable ordering + turn gaps (scale path == window path row-for-row) and
KS/PSI drift: drifted fixture trips thresholds, clean fixture doesn't (F4)."""

import numpy as np
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.datagen import gen_transcripts_pandas
from owl2jsonschema_js_spark.drift import (
    baseline_profile, drift_report, gap_histogram, ks_from_hists,
    length_histogram, collect_hists, psi_from_hists,
)
from owl2jsonschema_js_spark.order import turn_gaps, turn_gaps_window, with_stable_order


def test_turn_gaps_scale_path_equals_window_path(spark, fixture60):
    df = fixture60.to_spark(spark)
    a = {(r["conv_id"], r["turn_idx"]): r["gap_s"]
         for r in turn_gaps(df).collect()}
    b = {(r["conv_id"], r["turn_idx"]): r["gap_s"]
         for r in turn_gaps_window(df).collect()}
    assert a.keys() == b.keys()
    for k in a:
        if b[k] is None:
            assert a[k] is None or np.isnan(a[k])
        else:
            assert abs(a[k] - b[k]) < 1e-6, k


def test_turn_gaps_carry_across_arrow_batches(spark, fixture60):
    """Force Arrow batches small enough that conversations split across
    batches, so the mapInPandas carry-over (first gap of a continuation batch
    = diff against the previous batch's last ts) actually executes. Guards
    the carry write in order.py against pandas copy-on-write discarding it."""
    df = fixture60.to_spark(spark)
    want = {(r["conv_id"], r["turn_idx"]): r["gap_s"]
            for r in turn_gaps_window(df).collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = {(r["conv_id"], r["turn_idx"]): r["gap_s"]
               for r in turn_gaps(df).collect()}
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got.keys() == want.keys()
    n_real = 0
    for k, w in want.items():
        if w is None:
            assert got[k] is None or np.isnan(got[k])
        else:
            n_real += 1
            assert abs(got[k] - w) < 1e-6, k
    assert n_real > 0


def test_stable_order_row_for_row(spark, fixture60):
    """Per-turn text equality under the stable ordering window: ordering the
    same table twice (shuffled input) yields identical (conv, seq, text)."""
    df = fixture60.to_spark(spark)
    ordered1 = with_stable_order(df).select("conv_id", "turn_seq", "text")
    shuffled = df.orderBy(F.rand(seed=1))
    ordered2 = with_stable_order(shuffled).select("conv_id", "turn_seq", "text")
    assert ordered1.exceptAll(ordered2).count() == 0
    assert ordered2.exceptAll(ordered1).count() == 0


def test_ks_psi_primitives():
    p = [10, 20, 30, 40]
    assert ks_from_hists(p, p) == 0.0
    assert psi_from_hists(p, p) < 1e-9
    q = [40, 30, 20, 10]
    assert ks_from_hists(p, q) > 0.2
    assert psi_from_hists(p, q) > 0.2
    assert ks_from_hists([0, 0], [1, 2]) == 0.0  # empty-side guard


def test_drift_detection_end_to_end(spark):
    clean = gen_transcripts_pandas(n_convs=80, seed=42, drifted=False)
    drifted = gen_transcripts_pandas(n_convs=80, seed=43, drifted=True)
    clean2 = gen_transcripts_pandas(n_convs=80, seed=44, drifted=False)

    def prof(fx):
        df = fx.to_spark(spark)
        return baseline_profile(df, turn_gaps(df))

    base, drift_p, clean_p = prof(clean), prof(drifted), prof(clean2)
    rep_drift = drift_report(drift_p, base)
    rep_clean = drift_report(clean_p, base)
    assert rep_drift["drifted"] is True
    # the drifted generator stretches assistant text and doubles gaps
    assert rep_drift["roles"]["assistant"].get("flag") or any(
        v.get("flag") for v in rep_drift["roles"].values())
    assert rep_clean["drifted"] is False


def test_histograms_distributed_shape(spark, fixture60):
    df = fixture60.to_spark(spark)
    lh = collect_hists(length_histogram(df))
    assert set(lh) == {"user", "assistant", "system", "tool", "narrator"}
    total = sum(sum(v) for v in lh.values())
    assert total == df.where(F.col("text").isNotNull()).count()
    gh = collect_hists(gap_histogram(turn_gaps(df)))
    n_convs = df.select("conv_id").distinct().count()
    assert sum(sum(v) for v in gh.values()) == df.count() - n_convs
