"""dds.appendOnly (Delta's delta.appendOnly): the DML/overwrite
freeze for audit-log / event-stream tables.  Frozen tables refuse
overwrite, create_or_replace, DELETE, UPDATE, replace_where,
row-modifying MERGE and RESTORE pointedly; appends, insert-only
merges, compaction, vacuum and metadata commits stay allowed; UNSET
re-enables; malformed values fail at SET/create time."""

import pytest

from dagster_delta_spark import (
    DeltaSparkTable,
    MergeConfig,
    MergeType,
    WriteMode,
)


def _df(spark, lo=0, hi=5):
    return spark.range(lo, hi).withColumnRenamed("id", "a")


def _frozen(spark, tmp_path, name="t"):
    t = DeltaSparkTable(spark, str(tmp_path / name))
    t.write(_df(spark), WriteMode.error,
            table_configuration={"dds.appendOnly": "true"})
    return t


def test_refusals(spark, tmp_path):
    t = _frozen(spark, tmp_path)
    for op in [
        lambda: t.write(_df(spark), WriteMode.overwrite),
        lambda: t.write(_df(spark), WriteMode.overwrite,
                        partition_dnf=[]),
        lambda: t.delete("a = 1"),
        lambda: t.delete("a = 1", use_dv=True),
        lambda: t.update({"a": "a + 1"}, "a = 1"),
        lambda: t.replace_where(_df(spark, 0, 1), "a = 0"),
        lambda: t.restore(0),
        lambda: t.merge(_df(spark, 0, 2),
                        MergeConfig(MergeType.upsert,
                                    predicate="s.a = t.a")),
        lambda: t.merge(_df(spark, 0, 2),
                        MergeConfig(MergeType.update_only,
                                    predicate="s.a = t.a")),
    ]:
        with pytest.raises(ValueError, match="append-only"):
            op()
    assert t.read().count() == 5  # nothing slipped through


def test_create_or_replace_refuses(spark, tmp_path):
    t = _frozen(spark, tmp_path)
    with pytest.raises(ValueError, match="append-only"):
        t.write(_df(spark), WriteMode.create_or_replace)


def test_allowed_operations(spark, tmp_path):
    t = _frozen(spark, tmp_path)
    t.write(_df(spark, 5, 8), WriteMode.append)
    t.merge(_df(spark, 6, 10),
            MergeConfig(MergeType.deduplicate_insert,
                        predicate="s.a = t.a"))
    assert t.read().count() == 10  # 0..9, inserts only
    t.optimize(target_file_size=1 << 20)  # compaction keeps all rows
    t.zorder(["a"], num_files=1)
    t.vacuum(retention_ms=0)
    t.set_properties({"owner": "audit"})  # metadata commits fine
    assert sorted(r["a"] for r in t.read().collect()) == list(range(10))


def test_unset_reenables_and_set_freezes_later(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark), WriteMode.error)
    t.delete("a = 0")  # unfrozen: fine
    t.set_properties({"dds.appendOnly": "true"})
    with pytest.raises(ValueError, match="append-only"):
        t.delete("a = 1")
    t.unset_properties(["dds.appendOnly"])
    t.delete("a = 1")
    assert sorted(r["a"] for r in t.read().collect()) == [2, 3, 4]


def test_malformed_value_fails_at_set_and_create(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark), WriteMode.error)
    with pytest.raises(ValueError, match="dds.appendOnly"):
        t.set_properties({"dds.appendOnly": "ture"})
    t2 = DeltaSparkTable(spark, str(tmp_path / "t2"))
    with pytest.raises(ValueError, match="dds.appendOnly"):
        t2.write(_df(spark), WriteMode.error,
                 table_configuration={"dds.appendOnly": "yes"})
    assert not t2.exists()


def _race_freeze(spark, t, monkeypatch):
    """Patch tablelog.commit so the FIRST non-SET commit loses its
    version to a rival that freezes the table — the TOCTOU window the
    per-retry re-check closes."""
    import dagster_delta_spark.tablelog as tl

    real_commit = tl.commit
    state = {"fired": False}

    def racing_commit(uri, version, actions, snapshot_after=None):
        ops = [a["commitInfo"]["operation"] for a in actions
               if "commitInfo" in a]
        if not state["fired"] and "SET TBLPROPERTIES" not in ops:
            state["fired"] = True
            DeltaSparkTable(spark, t.table_uri).set_properties(
                {"dds.appendOnly": "true"})
            raise tl.VersionConflictError("rival froze the table")
        return real_commit(uri, version, actions, snapshot_after)

    monkeypatch.setattr(tl, "commit", racing_commit)


def test_freeze_racing_delete_refuses(spark, tmp_path, monkeypatch):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark), WriteMode.error)
    _race_freeze(spark, t, monkeypatch)
    with pytest.raises(ValueError, match="append-only"):
        t.delete("a = 1")
    assert t.read().count() == 5


def test_freeze_racing_overwrite_refuses(spark, tmp_path, monkeypatch):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark), WriteMode.error)
    _race_freeze(spark, t, monkeypatch)
    with pytest.raises(ValueError, match="append-only"):
        t.write(_df(spark), WriteMode.overwrite)
    assert t.read().count() == 5


def test_restore_to_frozen_version_refreezes(spark, tmp_path):
    """RESTORE re-publishes the target's metadata INCLUDING
    configuration — restoring an unfrozen table to a version where
    dds.appendOnly was set re-freezes it (and restore FROM a frozen
    head refuses outright, checked above)."""
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark), WriteMode.error)                      # v0
    t.set_properties({"dds.appendOnly": "true"})              # v1 frozen
    frozen_v = t.version()
    t.unset_properties(["dds.appendOnly"])                    # v2 thawed
    t.delete("a = 0")                                         # v3 (allowed)
    t.restore(frozen_v)                                       # re-freeze
    assert t.read().count() == 5  # v1 contents back
    with pytest.raises(ValueError, match="append-only"):
        t.delete("a = 1")


def test_freeze_fuzz_model(spark, tmp_path):
    """Random {append, freeze, thaw, delete, update, overwrite,
    restore} sequences against a tiny model tracking (rows, frozen):
    frozen tables refuse every mutation and keep exact state; restore
    carries the target's frozen flag."""
    import random

    rnd = random.Random(77)
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 3), WriteMode.error)
    rows = {0, 1, 2}
    frozen = False
    hist = [(set(rows), frozen)]  # per committed version
    nxt = 100
    for step in range(40):
        op = rnd.choice(["append", "freeze", "thaw", "delete",
                         "update", "overwrite", "restore"])
        if op == "append":
            t.write(_df(spark, nxt, nxt + 2), WriteMode.append)
            rows |= {nxt, nxt + 1}
            nxt += 2
            hist.append((set(rows), frozen))
        elif op == "freeze":
            if frozen:
                continue
            t.set_properties({"dds.appendOnly": "true"})
            frozen = True
            hist.append((set(rows), frozen))
        elif op == "thaw":
            if not frozen:
                continue
            t.unset_properties(["dds.appendOnly"])
            frozen = False
            hist.append((set(rows), frozen))
        elif op == "restore":
            r = rnd.randrange(len(hist))
            if frozen:
                with pytest.raises(ValueError, match="append-only"):
                    t.restore(r)
            else:
                before = t.version()
                t.restore(r)
                if t.version() != before:
                    rows, frozen = set(hist[r][0]), hist[r][1]
                    hist.append((set(rows), frozen))
        else:
            if not rows:
                continue
            victim = min(rows)
            if op == "delete":
                act = lambda: t.delete(f"a = {victim}")
            elif op == "update":
                act = lambda: t.update({"a": "a"}, f"a = {victim}")
            else:
                act = lambda: t.write(_df(spark, 0, 1),
                                      WriteMode.overwrite)
            if frozen:
                with pytest.raises(ValueError, match="append-only"):
                    act()
            else:
                before = t.version()
                act()
                if op == "delete":
                    rows.discard(victim)
                elif op == "overwrite":
                    rows = {0}
                if t.version() != before:
                    hist.append((set(rows), frozen))
        got = {r["a"] for r in t.read().collect()}
        assert got == rows, f"step {step} {op}: {got} != {rows}"
