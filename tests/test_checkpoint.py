"""Resume tests (SURVEY.md §5.2.5): kill-after-K-partitions then relaunch ->
manifest byte-equal to the uninterrupted run's."""

import pytest

from owl2jsonschema_js_spark.checkpoint import Manifest, ResumableValidator, parquet_snapshot_id
from owl2jsonschema_js_spark.compile import compile_spec
from owl2jsonschema_js_spark.docs import transcript_constraints
from owl2jsonschema_js_spark.spec import ConstraintSpec


def _setup(spark, fixture60):
    df = fixture60.to_spark(spark)
    catalog = fixture60.catalog_spark(spark)
    spec = ConstraintSpec.parse(transcript_constraints())
    plan = compile_spec(spec, df.schema)
    return df, catalog, plan


def test_kill_resume_converges(spark, fixture60, tmp_path):
    df, catalog, plan = _setup(spark, fixture60)
    snap = "snapA"

    # uninterrupted run
    m_full = Manifest(str(tmp_path / "full.json"))
    ResumableValidator(plan, m_full, snap, n_parts=8).run(df, catalog=catalog)

    # killed after 2 partitions, then resumed
    m_resume = Manifest(str(tmp_path / "resume.json"))
    with pytest.raises(RuntimeError, match="injected failure"):
        ResumableValidator(plan, m_resume, snap, n_parts=8).run(
            df, catalog=catalog, fail_after_parts=2)
    m_resume = Manifest.load(str(tmp_path / "resume.json"))
    assert 0 < len(m_resume.entries) < len(m_full.entries)
    ResumableValidator(plan, m_resume, snap, n_parts=8).run(df, catalog=catalog)

    assert m_resume.canonical() == m_full.canonical()


def test_resume_skips_completed_partitions(spark, fixture60, tmp_path):
    df, catalog, plan = _setup(spark, fixture60)
    m = Manifest(str(tmp_path / "m.json"))
    rv = ResumableValidator(plan, m, "snapB", n_parts=8)
    first = rv.run(df, catalog=catalog)
    assert len(first) > 0
    # second launch: nothing pending -> no new verdicts computed
    second = rv.run(df, catalog=catalog)
    assert second == {}
    # new constraint version or snapshot -> full revalidation
    assert m.completed_parts("snapB", plan.spec.version) == set(first)
    assert m.completed_parts("snapOTHER", plan.spec.version) == set()


def test_manifest_lineage_fields(spark, fixture60, tmp_path):
    df, catalog, plan = _setup(spark, fixture60)
    m = Manifest(str(tmp_path / "m.json"))
    ResumableValidator(plan, m, "snapC", n_parts=4).run(df, catalog=catalog)
    for key, e in m.entries.items():
        lin = e["lineage"]
        assert lin["snapshot_id"] == "snapC"
        assert lin["constraint_version"] == plan.spec.version
        assert key == Manifest.key("snapC", lin["partition"], plan.spec.version)
        assert "n_rows" in e["metrics"]
        assert "pass" in e["verdict"]


def test_parquet_snapshot_id_changes_with_content(tmp_path):
    d = tmp_path / "t"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"xx")
    s1 = parquet_snapshot_id(str(d))
    (d / "b.parquet").write_bytes(b"yy")
    s2 = parquet_snapshot_id(str(d))
    assert s1 != s2 and len(s1) == 16


def test_parquet_snapshot_id_refuses_remote_uris(tmp_path):
    """A constant hash for every unstat-able remote path would make resume
    skip-lists match across datasets — refuse instead."""
    import pytest

    from owl2jsonschema_js_spark.checkpoint import parquet_snapshot_id

    with pytest.raises(ValueError, match="snapshot id"):
        parquet_snapshot_id("s3a://bucket/transcripts")
    p = tmp_path / "x.parquet"
    p.write_bytes(b"123")
    assert parquet_snapshot_id(f"file://{p}") == parquet_snapshot_id(str(p))


def test_manifest_key_refuses_pipe_components():
    """completed_parts re-parses keys with split('|', 2): a '|' inside a
    caller-supplied snapshot id or partition value would shift the parse and
    mis-attribute done-ness across snapshots — refused, never collided."""
    m = Manifest("unused.json")
    with pytest.raises(ValueError, match=r"\|"):
        m.record("snap|shot", "0", "v1", verdict={})
    with pytest.raises(ValueError, match=r"\|"):
        Manifest.key("s", "part|x", "v1")


def test_parquet_snapshot_id_sees_nested_file_changes(tmp_path):
    """Partitioned layouts nest files under part=... dirs, and overwriting a
    child file in place does not touch the parent directory entry — the
    snapshot id must hash the tree recursively or resume serves stale
    verdicts over changed data."""
    import os
    import time

    root = tmp_path / "table"
    part = root / "part=0"
    part.mkdir(parents=True)
    f = part / "data.parquet"
    f.write_bytes(b"aaaa")
    before = parquet_snapshot_id(str(root))
    assert parquet_snapshot_id(str(root)) == before  # deterministic
    time.sleep(0.01)  # ensure mtime_ns moves
    f.write_bytes(b"bbbb")  # same name, same size, nested one level down
    assert parquet_snapshot_id(str(root)) != before


def test_resume_keeps_null_partition_rows(spark, tmp_path):
    """Three-valued logic trap: isin() is NULL for NULL parts, so a bare
    ~isin resume filter would silently DROP NULL-part rows from every
    resumed run. They must stay pending (conservatively re-validated)."""
    doc = {"type": "object",
           "properties": {"role": {"enum": ["user", "assistant"]}}}
    plan = compile_spec(ConstraintSpec.parse(doc), spark.createDataFrame(
        [("c", 0, "user", "p0")],
        "conv_id string, turn_idx int, role string, part string").schema)
    rows = [("c1", 0, "user", "p0"), ("c2", 0, "narrator", None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, part string")

    m = Manifest(str(tmp_path / "m.json"))
    rv = ResumableValidator(plan, m, "snapN")
    verdicts = rv.run(df)  # first pass sees both parts (p0 and the NULL one)
    assert set(verdicts) == {"p0", "None"}
    # resume with p0 done: the NULL-part row must still be (re)validated,
    # and its violation still detected — not silently skipped
    verdicts2 = ResumableValidator(plan, Manifest.load(m.path), "snapN").run(df)
    assert set(verdicts2) == {"None"}
    assert verdicts2["None"]["rules"] == {"role.enum": 1}
