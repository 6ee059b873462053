"""Distribution-drift checks: KS statistic + PSI on per-role text-length and
turn-gap distributions vs a checkpointed baseline profile (BASELINE.json:6).

The distributed part is only histogram aggregation (groupBy(role, bin).count()
— partial-agg, skew-immune); KS/PSI themselves run driver-side on the tiny
(roles × 32 bins) result, exactly the compile-once-driver-side posture the
engine uses for constraint specs.

Binning: 32 fixed log2-width bins — bin = min(31, floor(log2(x+1))) — matching
FIXTURES.md F4. KS over binned data is the max |ECDF delta| at bin edges; PSI
uses epsilon-smoothed proportions.
"""

from __future__ import annotations

import json

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BINS = 32


def _log2_bin(col) -> "F.Column":
    return F.least(F.lit(N_BINS - 1),
                   F.floor(F.log2(F.greatest(col, F.lit(0)) + F.lit(1)))).cast("int")


def length_histogram(df: DataFrame, text_col: str = "text", by: str = "role") -> DataFrame:
    """(role, bin, count) over log2 text-length bins. Null texts excluded
    (they're `required`'s concern)."""
    return (
        df.where(F.col(text_col).isNotNull())
        .groupBy(F.col(by).alias("role"), _log2_bin(F.length(text_col)).alias("bin"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def gap_histogram(gaps: DataFrame, by: str = "role") -> DataFrame:
    """(role, bin, count) over log2 turn-gap-second bins; input from
    order.turn_gaps (first turns have null gap -> excluded)."""
    return (
        gaps.where(F.col("gap_s").isNotNull())
        .groupBy(F.col(by).alias("role"), _log2_bin(F.col("gap_s")).alias("bin"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def collect_hists(hist_df: DataFrame) -> dict[str, list[int]]:
    """{role: [32 counts]} — the checkpointable profile payload (F4)."""
    out: dict[str, np.ndarray] = {}
    for r in hist_df.collect():
        arr = out.setdefault(r["role"], np.zeros(N_BINS, dtype=np.int64))
        arr[int(r["bin"])] += int(r["count"])
    return {k: v.tolist() for k, v in out.items()}


# ------------------------------------------------------------------ driver-side
def ks_from_hists(p_counts, q_counts) -> float:
    p = np.asarray(p_counts, dtype=np.float64)
    q = np.asarray(q_counts, dtype=np.float64)
    if p.sum() == 0 or q.sum() == 0:
        return 0.0
    pc = np.cumsum(p) / p.sum()
    qc = np.cumsum(q) / q.sum()
    return float(np.max(np.abs(pc - qc)))


def psi_from_hists(p_counts, q_counts, smooth: float = 0.5) -> float:
    """PSI with add-half (Laplace) smoothing: a bin occupied on one side and
    empty on the other must not explode — with raw eps flooring a single
    17-vs-0 bin reads as PSI≈0.5 on same-distribution samples."""
    p = np.asarray(p_counts, dtype=np.float64)
    q = np.asarray(q_counts, dtype=np.float64)
    if p.sum() == 0 or q.sum() == 0:
        return 0.0
    p = (p + smooth) / (p.sum() + smooth * len(p))
    q = (q + smooth) / (q.sum() + smooth * len(q))
    return float(np.sum((p - q) * np.log(p / q)))


def baseline_profile(df: DataFrame, gaps: DataFrame) -> dict:
    """Build the checkpointable baseline profile (FIXTURES.md F4)."""
    return {
        "len_hist": collect_hists(length_histogram(df)),
        "gap_hist": collect_hists(gap_histogram(gaps)),
        "n_bins": N_BINS,
    }


def drift_report(
    current: dict,
    baseline: dict,
    ks_threshold: float = 0.15,
    psi_threshold: float = 0.20,
    min_count: int = 50,
) -> dict:
    """Per-role KS + PSI on length and gap histograms vs the baseline profile;
    `drifted` flags any metric past its threshold. Roles with fewer than
    ``min_count`` samples on either side are reported but never flagged —
    single-digit cells make PSI pure noise (a stray invalid role with one row
    must not read as distribution drift)."""
    report: dict = {"roles": {}, "drifted": False}
    for kind in ("len_hist", "gap_hist"):
        cur, base = current.get(kind, {}), baseline.get(kind, {})
        for role in sorted(set(cur) | set(base)):
            c = cur.get(role, [0] * N_BINS)
            b = base.get(role, [0] * N_BINS)
            if sum(c) < min_count or sum(b) < min_count:
                continue
            ks = ks_from_hists(c, b)
            psi = psi_from_hists(c, b)
            entry = report["roles"].setdefault(role, {})
            entry[f"ks_{kind[:3]}"] = round(ks, 6)
            entry[f"psi_{kind[:3]}"] = round(psi, 6)
            if ks > ks_threshold or psi > psi_threshold:
                report["drifted"] = True
                entry["flag"] = True
    return report


def dump_profile(profile: dict) -> str:
    """Canonical serialization (sorted keys — the reference's deterministic
    serializer posture, /root/reference/lib/pretty-json.js:36-38)."""
    return json.dumps(profile, sort_keys=True, indent=1)
