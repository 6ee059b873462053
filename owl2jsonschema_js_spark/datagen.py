"""Deterministic synthetic transcripts (FIXTURES.md F1/F2).

Two generators:

 * :func:`gen_transcripts_pandas` — exact fixture for tests: seeded numpy, one
   hot conversation (~30% of rows), every injected violation logged into a
   sidecar so `detected == injected` can be asserted exactly (SURVEY.md §5.2.4).
 * :func:`gen_transcripts_spark` — Spark-native generator for benchmarks: every
   column is a pure deterministic function of `spark.range(n)`'s id, so it
   scales to arbitrary row counts with no driver memory and no shuffle
   (conceptually to the 10^12-turn target) and needs no data files.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOOLS = [f"tool_{i}" for i in range(20)]
TOOL_KINDS = ["search", "code", "browse", "other"]
ROLES = ["user", "assistant", "system", "tool"]
_WORDS = (
    "the a of query spark table scan join filter group sort merge window "
    "agg hash row column batch stream data key value order part line fast slow small"
).split()
_BASE_TS = datetime(2025, 1, 1, 0, 0, 0)


@dataclass
class TranscriptFixture:
    pdf: pd.DataFrame
    tool_catalog: pd.DataFrame
    expected: list[dict] = field(default_factory=list)  # {rule_id, conv_id, turn_idx}

    def expected_counts(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for v in self.expected:
            out[v["rule_id"]] = out.get(v["rule_id"], 0) + 1
        return out

    def to_spark(self, spark: SparkSession) -> DataFrame:
        sdf = spark.createDataFrame(self.pdf)
        return sdf.withColumn("turn_idx", F.col("turn_idx").cast("int"))

    def catalog_spark(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.tool_catalog)


def _text(rng: np.random.Generator, role: str) -> str:
    # per-role length: user shorter than assistant (drift fixture input)
    mean = {"user": 8, "assistant": 24, "system": 12, "tool": 10}[role]
    n = max(1, int(rng.lognormal(np.log(mean), 0.5)))
    # plain-str join: numpy str_ scalars break non-Arrow createDataFrame inference
    return " ".join(str(w) for w in rng.choice(_WORDS, size=n))


def gen_transcripts_pandas(
    n_convs: int = 60,
    seed: int = 42,
    hot_frac: float = 0.30,
    drifted: bool = False,
) -> TranscriptFixture:
    """Seeded generator with exact injected-violation bookkeeping.

    Violation injections live in *dedicated* conversations (the last 5 ids) so
    expected counts stay independent and exact:
      conv[n-1]: duplicated (conv_id, turn_idx)      -> table.unique (2 rows)
      conv[n-2]: removed middle turn                 -> table.contiguity (1 group)
      conv[n-3]: one role='narrator'                 -> role.enum (1 row)
      conv[n-4]: one text=None                       -> text.required (1 row)
      conv[n-5]: one dangling tool ref 'tool_999'    -> table.referential (1 row)
    Conversation 0 is the hot one (~hot_frac of all rows). A few conversations
    get out-of-order ts (ordering fixture, not a violation).
    """
    rng = np.random.default_rng(seed)
    rows: list[dict] = []
    expected: list[dict] = []

    base_len = 12
    hot_len = int(n_convs * base_len * hot_frac / max(1e-9, (1 - hot_frac)))

    gap_scale = 60.0 * (2.0 if drifted else 1.0)
    text_stretch = 1.5 if drifted else 1.0

    for k in range(n_convs):
        conv = f"conv_{k:08d}"
        length = hot_len if k == 0 else max(2, int(rng.poisson(base_len)))
        ts = _BASE_TS + timedelta(seconds=float(rng.integers(0, 86400)))
        for i in range(length):
            role = ROLES[i % 4]
            txt = _text(rng, role)
            if drifted and role == "assistant":
                txt = " ".join([txt] * max(1, int(text_stretch)))
            tool = str(rng.choice(TOOLS)) if role == "tool" else None
            ts = ts + timedelta(seconds=float(rng.exponential(gap_scale)) + 1.0)
            rows.append(dict(conv_id=conv, turn_idx=i, role=role, text=txt, tool=tool, ts=ts))

    by_conv: dict[str, list[dict]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)

    def conv_name(j: int) -> str:
        return f"conv_{j:08d}"

    # table.unique: duplicate one interior turn
    c = conv_name(n_convs - 1)
    dup = dict(by_conv[c][1])
    by_conv[c].append(dup)
    expected += [
        {"rule_id": "table.unique", "conv_id": c, "turn_idx": dup["turn_idx"]},
        {"rule_id": "table.unique", "conv_id": c, "turn_idx": dup["turn_idx"]},
    ]
    # table.contiguity: remove a middle turn
    c = conv_name(n_convs - 2)
    del by_conv[c][1]
    expected.append({"rule_id": "table.contiguity", "conv_id": c, "turn_idx": None})
    # role.enum
    c = conv_name(n_convs - 3)
    by_conv[c][1]["role"] = "narrator"
    expected.append({"rule_id": "role.enum", "conv_id": c, "turn_idx": 1})
    # text.required
    c = conv_name(n_convs - 4)
    by_conv[c][1]["text"] = None
    expected.append({"rule_id": "text.required", "conv_id": c, "turn_idx": 1})
    # table.referential
    c = conv_name(n_convs - 5)
    by_conv[c][1]["tool"] = "tool_999"
    by_conv[c][1]["role"] = "tool"
    expected.append({"rule_id": "table.referential", "conv_id": c, "turn_idx": 1})
    # out-of-order ts inside a couple of conversations (ordering fixture)
    for j in (1, 2):
        turns = by_conv[conv_name(j)]
        if len(turns) >= 4:
            turns[2]["ts"], turns[3]["ts"] = turns[3]["ts"], turns[2]["ts"]

    flat = [r for turns in by_conv.values() for r in turns]
    pdf = pd.DataFrame(flat)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    catalog = pd.DataFrame({"tool": TOOLS, "kind": [TOOL_KINDS[i % 4] for i in range(len(TOOLS))]})
    return TranscriptFixture(pdf=pdf, tool_catalog=catalog, expected=expected)


# --------------------------------------------------------------------- spark
LCG_MOD = 2147483647  # 2^31 - 1 (MINSTD modulus)
LCG_MUL = 48271


def lcg_offset(salt: str, seed: int) -> int:
    """Per-salt additive constant for the SQL-reproducible hash lane."""
    s = sum((i + 1) * ord(c) for i, c in enumerate(salt))
    return (seed * 1_000_003 + s * 7919) % LCG_MOD


def gen_transcripts_spark(
    spark: SparkSession,
    n_rows: int,
    n_convs: int = 10_000,
    hot_frac: float = 0.30,
    seed: int = 42,
    violations_per_mille: int = 2,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """Scale generator: transcripts as pure column expressions over
    ``spark.range`` — no shuffle, no driver data, embarrassingly parallel.

    Row-id layout: the first ``hot`` rows belong to conversation 0 (the hot
    conversation); the rest round-robin over conversations 1..n_convs-1 with
    contiguous turn_idx, so group constraints hold by construction. Violations
    are then injected by deterministic hash conditions at ~violations_per_mille.

    ``hash_mode``: 'xxhash' (default) draws injection decisions from
    xxhash64; 'lcg' uses a MINSTD linear-congruential lane
    (``(rid*48271 + offset) % (2^31-1) % 1000``, plain 64-bit-safe integer
    arithmetic) so an independent SQL engine can reproduce the injected
    violation COUNTS exactly — the oracle lane for grading the full
    validation path. Word selection inside text stays on xxhash64 either way
    (content is never count-relevant)."""
    hot = int(n_rows * hot_frac)
    rest = n_convs - 1
    df = spark.range(n_rows).withColumnRenamed("id", "rid")
    is_hot = F.col("rid") < hot
    conv_num = F.when(is_hot, F.lit(0)).otherwise((F.col("rid") - hot) % rest + 1)
    turn = F.when(is_hot, F.col("rid")).otherwise(F.floor((F.col("rid") - hot) / rest))
    if hash_mode == "lcg":
        h = lambda salt: F.pmod(
            F.pmod(F.col("rid") * F.lit(LCG_MUL) + F.lit(lcg_offset(salt, seed)),
                   F.lit(LCG_MOD)),
            F.lit(1000))
    elif hash_mode == "xxhash":
        h = lambda salt: F.pmod(F.xxhash64(F.col("rid"), F.lit(seed), F.lit(salt)), F.lit(1000))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")

    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), (turn % 4 + 1).cast("int"))
    words = F.array(*[F.lit(w) for w in _WORDS])
    n_words = (h("len") % 28 + 3).cast("int")
    text = F.array_join(
        F.transform(F.sequence(F.lit(1), n_words),
                    lambda i: F.element_at(words, (F.pmod(F.xxhash64(F.col("rid"), i), F.lit(len(_WORDS))) + 1).cast("int"))),
        " ")
    tool = F.when(role == "tool",
                  F.concat(F.lit("tool_"), (h("tool") % 20).cast("string")))
    ts = F.timestamp_seconds(
        F.lit(int(_BASE_TS.timestamp()))
        + conv_num * 7 + turn * 60 + (h("jit") % 59)
    )

    v = violations_per_mille
    role = F.when(h("v_role") < v, F.lit("narrator")).otherwise(role)
    text = F.when(h("v_text") < v, F.lit(None).cast("string")).otherwise(text)
    tool = F.when((role == "tool") & (h("v_tool") < v * 10), F.lit("tool_999")).otherwise(tool)

    return df.select(
        F.format_string("conv_%08d", conv_num.cast("int")).alias("conv_id"),
        turn.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def tool_catalog_spark(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(t, TOOL_KINDS[i % 4]) for i, t in enumerate(TOOLS)], "tool string, kind string")
