"""Per-partition checkpoint manifest: resumable validation runs with lineage.

North rule (BASELINE.json:6,14): "resumable from a per-partition checkpoint
manifest carrying lineage (snapshot-id, partition spec, constraint version)
and metrics". Entries are keyed (snapshot_id | partition | constraint_version);
a relaunch anti-joins pending partitions and re-validates only those; writes
are idempotent per partition so kill/resume converges to a manifest byte-equal
to an uninterrupted run's (canonical sorted-keys JSON, atomic tmp+rename —
mirroring the reference's deterministic serializer, lib/pretty-json.js:36-38).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.compile import RulePlan
from owl2jsonschema_js_spark.runner import ValidationRunner


@dataclass
class Manifest:
    path: str
    entries: dict[str, dict] = field(default_factory=dict)
    meta: dict = field(default_factory=dict)

    @staticmethod
    def key(snapshot_id: str, part: str, version: str) -> str:
        # completed_parts() re-parses with split('|', 2): a '|' inside the
        # (caller-supplied) snapshot id or a partition value would shift the
        # parse and mis-attribute done-ness across snapshots — refuse it
        # rather than silently collide
        if "|" in str(snapshot_id) or "|" in str(part):
            raise ValueError(
                f"manifest key components must not contain '|': "
                f"snapshot_id={snapshot_id!r}, part={part!r}")
        return f"{snapshot_id}|{part}|{version}"

    @classmethod
    def load(cls, path: str) -> "Manifest":
        if os.path.exists(path):
            with open(path) as f:
                blob = json.load(f)
            return cls(path=path, entries=blob.get("entries", {}), meta=blob.get("meta", {}))
        return cls(path=path)

    def completed_parts(self, snapshot_id: str, version: str) -> set[str]:
        out = set()
        for k, v in self.entries.items():
            snap, part, ver = k.split("|", 2)
            if snap == snapshot_id and ver == version and v.get("status") == "done":
                out.add(part)
        return out

    def record(self, snapshot_id: str, part: str, version: str,
               verdict: dict, metrics: dict | None = None) -> None:
        self.entries[self.key(snapshot_id, part, version)] = {
            "status": "done",
            "verdict": verdict,
            "metrics": metrics or {},
            "lineage": {
                "snapshot_id": snapshot_id,
                "partition": part,
                "constraint_version": version,
            },
        }

    def write(self) -> None:
        blob = json.dumps({"meta": self.meta, "entries": self.entries},
                          sort_keys=True, indent=1)
        d = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(blob)
        os.replace(tmp, self.path)

    def canonical(self) -> str:
        return json.dumps({"meta": self.meta, "entries": self.entries}, sort_keys=True)


class ResumableValidator:
    """Orchestrates validate-with-resume over a partitioned table.

    PARTITION-ALIGNMENT CONTRACT: resume skips completed partitions, so the
    partition column must be GROUP-ALIGNED — every conversation (group key)
    lives in exactly one partition. The derived default (hash of conv_id,
    ValidationRunner._with_partition) guarantees this by construction; a
    storage-provided partition spec must partition by conversation or
    coarser. A spec that splits conversations (e.g. by event day) would make
    a resumed run see only the pending slice of a straddling conversation —
    truncated cardinality/contiguity aggregates and missed cross-partition
    duplicates, verdicts diverging from an uninterrupted run's."""

    def __init__(self, plan: RulePlan, manifest: Manifest, snapshot_id: str,
                 part_col: str = "part", n_parts: int = 16,
                 key_cols: tuple[str, str] = ("conv_id", "turn_idx")):
        self.plan = plan
        self.manifest = manifest
        self.snapshot_id = snapshot_id
        self.runner = ValidationRunner(plan, part_col=part_col,
                                       key_cols=key_cols, n_parts=n_parts)
        self.part_col = part_col

    def run(self, df: DataFrame, catalog: DataFrame | None = None,
            fail_after_parts: int | None = None) -> dict:
        """Validate pending partitions; record each into the manifest.

        ``fail_after_parts`` simulates a mid-run crash for resume tests
        (SURVEY.md §5.2.5): only the first K partition verdicts are recorded
        before raising.

        Partition-pruning note: the pending-partition filter is a plain
        `~part.isin(done)` predicate — on a partitioned source (Iceberg/
        parquet partition dirs) Catalyst turns it into partition pruning, so
        resumed runs do not rescan completed partitions.
        """
        version = self.plan.spec.version
        df = self.runner._with_partition(df)
        done = self.manifest.completed_parts(self.snapshot_id, version)
        pending = df
        if done:
            # null-safe: isin() is NULL for NULL parts (three-valued logic),
            # and a bare ~isin would silently DROP those rows from every
            # resumed run — coalesce keeps them pending (conservative:
            # re-validated each resume, never skipped)
            pending = df.where(~F.coalesce(
                df[self.part_col].cast("string").isin(*done), F.lit(False)))

        result = self.runner.run(pending, catalog=catalog)
        # C20/C21: schema metadata (title/translations/links) rides the
        # manifest keyed by constraint version — normalized provenance for the
        # schema_id column on violation rows (lib/index.js:442,957-999).
        self.manifest.meta.setdefault("specs", {})[version] = result.spec_meta
        verdicts = result.collect_verdicts()
        result.unpersist()

        recorded = 0
        for part in sorted(verdicts):
            if fail_after_parts is not None and recorded >= fail_after_parts:
                self.manifest.write()
                raise RuntimeError(f"injected failure after {recorded} partitions")
            v = verdicts[part]
            self.manifest.record(
                self.snapshot_id, part, version,
                verdict={"pass": v["pass"], "rules": dict(sorted(v["rules"].items()))},
                metrics={"n_rows": v["n_rows"]},
            )
            recorded += 1
        self.manifest.write()
        return verdicts


    def evolve(self, df: DataFrame, old_plan: RulePlan,
               catalog: DataFrame | None = None) -> dict:
        """Upgrade this snapshot's manifest entries from ``old_plan``'s
        constraint version to this validator's version by revalidating ONLY
        the rule delta (evolve.py): partitions complete under the old version
        re-run just the added/changed rules (and table rules iff those
        changed), old per-rule counts carry over, and the merged verdicts are
        recorded under the new version. Partitions with no old-version entry
        fall back to a full validation. At 10^12 rows this turns a
        constraint-doc edit into a delta-columns scan instead of a 100 TB
        re-pass — verdicts identical to a from-scratch run (tests)."""
        from owl2jsonschema_js_spark.evolve import delta_plan, merge_verdicts

        new_version = self.plan.spec.version
        old_version = old_plan.spec.version
        df = self.runner._with_partition(df)
        old_done = self.manifest.completed_parts(self.snapshot_id, old_version)

        old_verdicts: dict = {}
        for part in old_done:
            e = self.manifest.entries[Manifest.key(self.snapshot_id, part, old_version)]
            old_verdicts[part] = {
                "n_rows": e["metrics"]["n_rows"],
                "pass": e["verdict"]["pass"],
                "rules": dict(e["verdict"]["rules"]),
            }

        sub, diff = delta_plan(old_plan, self.plan)
        # null-safe part filters: a NULL part makes isin() NULL, so a bare
        # isin/~isin pair would route NULL-part rows into NEITHER covered nor
        # uncovered — never validated under the new version, silently.
        # Coalesce(False) sends them to uncovered (full new-version run).
        in_done = F.coalesce(
            df[self.part_col].cast("string").isin(*old_done), F.lit(False)) \
            if old_done else F.lit(False)
        covered = df.where(in_done)
        if diff.is_noop or not (sub.row_rules or diff.table_changed):
            delta_verdicts = {p: {"n_rows": v["n_rows"], "rules": {}}
                              for p, v in old_verdicts.items()}
        else:
            res = ValidationRunner(sub, part_col=self.part_col,
                                   n_parts=self.runner.n_parts).run(covered, catalog=catalog)
            delta_verdicts = res.collect_verdicts()
            res.unpersist()
        merged = merge_verdicts(old_verdicts, delta_verdicts, diff)

        # partitions never validated under the old version fall back to a full
        # new-version run (empty set -> run() over an empty frame, a no-op;
        # partition pruning keeps the filtered scan cheap either way)
        uncovered = df.where(~in_done)
        merged.update(self.run(uncovered, catalog=catalog))

        self.manifest.meta.setdefault("specs", {})[new_version] = self.plan.spec.meta()
        for part in sorted(merged):
            v = merged[part]
            self.manifest.record(
                self.snapshot_id, part, new_version,
                verdict={"pass": v["pass"], "rules": dict(sorted(v["rules"].items()))},
                metrics={"n_rows": v["n_rows"]},
            )
        self.manifest.write()
        return merged


def parquet_snapshot_id(path: str) -> str:
    """Stand-in snapshot id for plain-parquet fixtures (no Iceberg runtime jar
    in this sandbox — SURVEY.md §7 milestone-0 note): content hash of the file
    listing (name, size, mtime). With Iceberg available, use the table's real
    snapshot-id (spark.read.option('snapshot-id', ...)) instead.

    Paths this process cannot stat (hdfs://, s3a://, ...) are REFUSED rather
    than hashed to a constant: every remote table sharing one snapshot id
    would make the resume skip-list match across datasets and silently skip
    validation — pass an explicit snapshot id (or use Iceberg's) for remote
    storage."""
    import hashlib

    if path.startswith("file://"):
        path = path[len("file://"):]
    if "://" in path:
        raise ValueError(
            f"cannot derive a content snapshot id for URI path {path!r} "
            "locally — supply ResumableValidator's snapshot_id explicitly "
            "(e.g. the Iceberg snapshot) for remote tables")
    h = hashlib.sha256()
    if os.path.isdir(path):
        # RECURSIVE walk: partitioned layouts nest files under part=... dirs,
        # and a directory entry's size/mtime does not change when a child
        # FILE is overwritten in place — a top-level listing would hash the
        # same id over changed data and resume would serve stale verdicts.
        # Hash every file's relative path + size + mtime in sorted order.
        for dirpath, dirnames, filenames in os.walk(path):
            dirnames.sort()
            for name in sorted(filenames):
                full = os.path.join(dirpath, name)
                st = os.stat(full)
                rel = os.path.relpath(full, path)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
    elif os.path.exists(path):
        st = os.stat(path)
        h.update(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]
