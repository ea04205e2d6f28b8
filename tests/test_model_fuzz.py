"""Model-based fuzz: random operation sequences on a DeltaSparkTable
are mirrored against a plain-pandas model; state must match after
every step, and time travel must reproduce every historical state."""

import random

import pandas as pd

from dagster_delta_spark import (
    DeltaSparkTable,
    MergeConfig,
    MergeType,
    WriteMode,
)
from dagster_delta_spark.tablelog import LogTruncatedError

KEYS = list(range(20))


def _mk_df(spark, rnd):
    rows = [(k, rnd.randint(0, 1000)) for k in rnd.sample(KEYS, rnd.randint(1, 10))]
    return (
        spark.createDataFrame(rows, "k bigint, v bigint"),
        pd.DataFrame(rows, columns=["k", "v"]),
    )


def _table_state(t, vname="v"):
    return sorted((r["k"], r[vname]) for r in t.read().collect())


def _model_state(m):
    return sorted(map(tuple, m[["k", "v"]].itertuples(index=False)))


def _apply_model(model, op, pdf):
    if op == "append":
        return pd.concat([model, pdf], ignore_index=True)
    if op == "overwrite":
        return pdf.copy()
    if op == "upsert":
        # update matched (all duplicate target rows take source value),
        # insert unmatched sources
        src = pdf.drop_duplicates("k", keep="last")  # single source per key
        merged = model.merge(src, on="k", how="left", suffixes=("", "_s"))
        merged["v"] = merged["v_s"].fillna(merged["v"]).astype("int64")
        merged = merged[["k", "v"]]
        inserts = src[~src["k"].isin(model["k"])][["k", "v"]]
        return pd.concat([merged, inserts], ignore_index=True)
    if op == "delete_unmatched":
        src = pdf.drop_duplicates("k", keep="last")
        kept = model[model["k"].isin(src["k"])].merge(src, on="k",
                                                      suffixes=("", "_s"))
        kept["v"] = kept["v_s"].astype("int64")
        return kept[["k", "v"]]
    if op == "update_only":
        # matched rows take the source value; unmatched sources dropped
        src = pdf.drop_duplicates("k", keep="last")
        merged = model.merge(src, on="k", how="left", suffixes=("", "_s"))
        merged["v"] = merged["v_s"].fillna(merged["v"]).astype("int64")
        return merged[["k", "v"]]
    if op == "dedup_insert":
        # insert unmatched sources only; matched targets untouched
        src = pdf.drop_duplicates("k", keep="last")
        inserts = src[~src["k"].isin(model["k"])][["k", "v"]]
        return pd.concat([model, inserts], ignore_index=True)
    raise AssertionError(op)


def test_random_op_sequences_match_model(spark, tmp_path):
    import os

    # soak knobs: DDS_FUZZ_TRIALS=10 DDS_FUZZ_STEPS=20 deepens the
    # sweep without touching the (reproducible) default seed
    trials = int(os.environ.get("DDS_FUZZ_TRIALS", "3"))
    steps = int(os.environ.get("DDS_FUZZ_STEPS", "12"))
    rnd = random.Random(1234)
    for trial in range(trials):
        t = DeltaSparkTable(spark, str(tmp_path / f"t{trial}"))
        model = pd.DataFrame(columns=["k", "v"]).astype("int64")
        states = []
        hist = []  # (model copy, vname) per committed version — the
        # RESTORE op's oracle
        vname = "v"

        def _snap():
            states.append(_model_state(model))
            hist.append((model.copy(), vname))

        boundary = 0  # r11: log-cleanup truncation floor
        sdf, pdf = _mk_df(spark, rnd)
        # r10: a bloom index on the (never-renamed) key column rides
        # through every op — each staged rewrite rebuilds bitmaps, and
        # a point read through the probe must agree with the model.
        # r12: trial % 3 == 1 STARTS from a convert_to_table'd plain
        # parquet directory (one version-0 commit over in-place files)
        # so CONVERT-then-DML/CDC/restore/vacuum interleavings get the
        # full sweep, not just the targeted integration tests.
        # r13: trial % 3 == 2 starts from a convert_from_delta'd
        # REAL-format Delta log (replayed adds; bloom set post-convert
        # via set_properties — engine-namespace keys can't arrive
        # through a foreign log) so converted-Delta tables take the
        # same sweep.
        snapped = False
        if trial % 3 == 2:
            import os as _os

            import __spark_entry__ as entry
            from dagster_delta_spark import (
                convert_from_delta,
                delta_interop,
            )
        if trial % 3 == 2 and len(pdf) >= 2 and rnd.random() < 0.5:
            # r15: HISTORY-REPLAY start — a two-commit Delta JSON
            # history converts with preserve_history, so the trial's
            # time-travel oracle spans PRE-convert versions too (v0 =
            # first slice, v1 = full, v2 = bloom set_properties)
            _os.makedirs(t.table_uri, exist_ok=True)
            half = len(pdf) // 2
            pdf1 = pdf.iloc[:half].reset_index(drop=True)
            pdf2 = pdf.iloc[half:].reset_index(drop=True)
            entry._stage_landing_file(
                spark.createDataFrame(pdf1), t.table_uri,
                "f0.parquet")
            entry._stage_landing_file(
                spark.createDataFrame(pdf2), t.table_uri,
                "f1.parquet")
            entry._write_delta_commit(t.table_uri, 0, [
                entry._delta_protocol_action(),
                entry._delta_meta_action(sdf.schema.json()),
                entry._delta_add_action(t.table_uri, "f0.parquet",
                                        len(pdf1))])
            entry._write_delta_commit(t.table_uri, 1, [
                entry._delta_add_action(t.table_uri, "f1.parquet",
                                        len(pdf2))])
            res = convert_from_delta(spark, t.table_uri,
                                     preserve_history=True)
            assert res["history_preserved"] and res["version"] == 1
            t.set_properties({"dds.bloomFilterColumns": '{"k": {}}'})
            model = _apply_model(model, "overwrite", pdf1)
            _snap()  # v0: first slice
            model = pd.concat([model, pdf2], ignore_index=True)
            _snap()  # v1: full contents
            _snap()  # v2: set_properties, contents unchanged
            snapped = True
        elif trial % 3 == 2:
            # r14: the Delta-start fixture carries a real inline
            # DELETION VECTOR masking the file's first two rows
            # (staged sorted so positions are value-predictable) —
            # the whole op sequence then runs over imported-DV state
            _os.makedirs(t.table_uri, exist_ok=True)
            entry._stage_landing_file(
                sdf.repartition(1).sortWithinPartitions("k", "v"),
                t.table_uri, "f0.parquet")
            dv = delta_interop.inline_dv_descriptor([0, 1])
            entry._write_delta_commit(t.table_uri, 0, [
                {"protocol": {"minReaderVersion": 3,
                              "minWriterVersion": 7,
                              "readerFeatures": ["deletionVectors"],
                              "writerFeatures": ["deletionVectors"]}},
                entry._delta_meta_action(sdf.schema.json()),
                entry._delta_add_action(t.table_uri, "f0.parquet",
                                        len(pdf), deletionVector=dv),
            ])
            convert_from_delta(spark, t.table_uri)
            t.set_properties({"dds.bloomFilterColumns": '{"k": {}}'})
            pdf = (pdf.sort_values(["k", "v"], kind="stable")
                   .iloc[2:].reset_index(drop=True))
        elif trial % 3 == 1:
            from dagster_delta_spark import convert_to_table

            sdf.coalesce(2).write.parquet(t.table_uri)
            convert_to_table(spark, t.table_uri, table_configuration={
                "dds.bloomFilterColumns": '{"k": {}}'})
        else:
            t.write(sdf, WriteMode.overwrite, table_configuration={
                "dds.bloomFilterColumns": '{"k": {}}'})
        if not snapped:
            model = _apply_model(model, "overwrite", pdf)
            _snap()
            if trial % 3 == 2:
                # the delta start commits TWICE (convert v0 + the
                # bloom set_properties v1) — hist indexes by version,
                # so record the identical-contents v1 too or every
                # later restore would rewind one version off
                _snap()

        # >= 12 steps so trials cross the checkpoint interval (10
        # commits) and time travel exercises the parquet checkpoint +
        # JSON tail; optimize is a no-op on state but commits a version.
        # vname tracks the value column's CURRENT logical name — the
        # rename op (metadata-only column mapping) interleaves with
        # every other operation; the pandas model always holds "v",
        # and the table boundary translates both ways.
        vname = "v"
        for _step in range(steps):
            op = rnd.choice(["append", "overwrite", "upsert",
                             "delete_unmatched", "update_only",
                             "dedup_insert", "optimize", "zorder",
                             "delete_dv", "delete_rw", "row_update",
                             "row_update_dv", "rename", "restore",
                             "replace_where", "copy_into",
                             "log_cleanup", "auto_ingest",
                             "append_only_freeze",
                             "future_writer_fork"])
            if op == "append_only_freeze":
                # r14: SET dds.appendOnly interleaves with everything
                # — while frozen a random forbidden op refuses with
                # state AND version untouched, appends still land,
                # UNSET re-enables (each property commit is a version
                # the restore oracle must replay, hence the _snaps)
                t.set_properties({"dds.appendOnly": "true"})
                _snap()
                sdf, pdf = _mk_df(spark, rnd)
                sdf = sdf.withColumnRenamed("v", vname)
                vbefore = t.version()
                forbidden = rnd.choice([
                    lambda: t.write(sdf, WriteMode.overwrite),
                    lambda: t.delete(f"{vname} >= 0"),
                    lambda: t.delete(f"{vname} >= 0", use_dv=True),
                    lambda: t.update({vname: f"{vname} + 1"},
                                     f"{vname} >= 0"),
                    lambda: t.restore(max(boundary, vbefore - 1)),
                ])
                try:
                    forbidden()
                except ValueError as e:
                    assert "append-only" in str(e), e
                else:
                    raise AssertionError(
                        f"trial {trial} step {_step}: forbidden op "
                        "succeeded on a frozen table")
                assert t.version() == vbefore
                assert _table_state(t, vname) == _model_state(model)
                t.write(sdf, WriteMode.append)  # appends stay legal
                model = _apply_model(model, "append", pdf)
                _snap()
                t.unset_properties(["dds.appendOnly"])
                _snap()
                assert _table_state(t, vname) == _model_state(model), (
                    f"trial {trial} step {_step} append_only_freeze"
                )
                continue
            if op == "future_writer_fork":
                # r14: the protocol gate under arbitrary prior state —
                # a zero-copy FORK of the live table upgrades to a
                # future writer version: reads still serve the full
                # state, every mutation refuses pre-staging, and the
                # original table is untouched
                from dagster_delta_spark import tablelog as tl

                fork = t.clone(str(
                    tmp_path / f"fw{trial}_{t.version()}_{_step}"))
                tl.commit(fork.table_uri, fork.version() + 1, [
                    tl.Protocol(1, 99, [], ["futureMagic"]).to_action(),
                    tl.CommitInfo("UPGRADE").to_action()])
                assert _table_state(fork, vname) == _model_state(model)
                sdf, pdf = _mk_df(spark, rnd)
                sdf = sdf.withColumnRenamed("v", vname)
                for mut in (
                    lambda: fork.write(sdf, WriteMode.append),
                    lambda: fork.idempotent_append(sdf, "fz", 1),
                    lambda: fork.delete(f"{vname} >= 0", use_dv=True),
                ):
                    try:
                        mut()
                    except tl.UnsupportedProtocolError:
                        pass
                    else:
                        raise AssertionError(
                            f"trial {trial} step {_step}: mutation "
                            "landed on a future-writer fork")
                assert _table_state(t, vname) == _model_state(model), (
                    f"trial {trial} step {_step} future_writer_fork"
                )
                continue
            if op == "log_cleanup":
                # r11: log retention interleaves with everything —
                # state and every version >= the boundary must be
                # unaffected; versions below it raise (checked in the
                # restore op and the final time-travel sweep)
                res = t.cleanup_metadata(retention_ms=0)
                if res["boundary_version"] is not None:
                    boundary = max(boundary, res["boundary_version"])
                assert _table_state(t, vname) == _model_state(model), (
                    f"trial {trial} step {_step} log_cleanup"
                )
                continue
            if op == "auto_ingest":
                # r12: Auto Loader-lite drain interleaves with every
                # other op — the file-source checkpoint survives
                # renames/restores (processed landing files never
                # re-emit, so a rewound table never double-ingests),
                # and the drained batch is a plain model append
                import os as _os

                import __spark_entry__ as entry
                from dagster_delta_spark.streaming import (
                    auto_ingest_once,
                )
                sdf, pdf = _mk_df(spark, rnd)
                sdf = sdf.withColumnRenamed("v", vname)
                ailand = str(tmp_path / f"ailand{trial}")
                _os.makedirs(ailand, exist_ok=True)
                n_prev = len([f for f in _os.listdir(ailand)
                              if f.endswith(".parquet")])
                entry._stage_landing_file(
                    sdf, ailand, f"file{n_prev}.parquet")
                res = auto_ingest_once(
                    spark, ailand, t.table_uri,
                    str(tmp_path / f"aick{trial}"), f"fuzz-ai{trial}",
                    schema=sdf.schema)
                assert res["rows_ingested"] == len(pdf), res
                model = _apply_model(model, "append", pdf)
                _snap()
                assert _table_state(t, vname) == _model_state(model), (
                    f"trial {trial} step {_step} auto_ingest"
                )
                continue
            if op == "copy_into":
                # r11: file-level exactly-once ingest — every earlier
                # landing file skips via the ledger (survives renames,
                # restores and checkpoints), only the fresh file loads
                import os as _os

                import __spark_entry__ as entry
                sdf, pdf = _mk_df(spark, rnd)
                sdf = sdf.withColumnRenamed("v", vname)
                land = str(tmp_path / f"land{trial}")
                _os.makedirs(land, exist_ok=True)
                n_prev = len([f for f in _os.listdir(land)
                              if f.endswith(".parquet")])
                entry._stage_landing_file(
                    sdf, land, f"file{n_prev}.parquet")
                res = t.copy_into(land)
                assert res["files_loaded"] == 1, res
                assert res["files_skipped"] == n_prev, res
                model = _apply_model(model, "append", pdf)
                _snap()
                assert _table_state(t, vname) == _model_state(model), (
                    f"trial {trial} step {_step} copy_into"
                )
                continue
            if op == "restore":
                r = rnd.randrange(0, len(states))
                if r < boundary:
                    # the target's commit files are gone — restore
                    # must fail pointedly, state untouched
                    try:
                        t.restore(r)
                    except LogTruncatedError:
                        pass
                    else:
                        raise AssertionError(
                            f"restore({r}) below boundary {boundary} "
                            "succeeded")
                    assert _table_state(t, vname) == _model_state(model)
                    continue
                before = t.version()
                t.restore(r)
                if t.version() != before:  # restore-to-head is a no-op
                    model, vname = hist[r][0].copy(), hist[r][1]
                    _snap()
                    # r14: restoring INTO an append_only_freeze window
                    # RE-FREEZES the table (restore re-publishes the
                    # target's configuration — the pinned r13
                    # semantics); thaw so the rest of the sequence
                    # keeps exercising DML
                    if (t.snapshot().metadata.configuration.get(
                            "dds.appendOnly") == "true"):
                        t.unset_properties(["dds.appendOnly"])
                        _snap()
                assert _table_state(t, vname) == _model_state(model), (
                    f"trial {trial} step {_step} restore -> {r}"
                )
                continue
            if op == "rename":
                new = f"v_{t.version() + 1}"
                t.rename_column(vname, new)
                vname = new
                _snap()
                assert _table_state(t, vname) == _model_state(model), (
                    f"trial {trial} step {_step} rename -> {new}"
                )
                continue
            if op == "optimize":
                before = t.version()
                t.optimize(target_file_size=1 << 20)
                if t.version() != before:  # no-op compactions don't commit
                    _snap()
                assert _table_state(t, vname) == _model_state(model), (
                    f"trial {trial} step {_step} optimize"
                )
                continue
            if op == "zorder":
                # r9: the space-filling-curve rewrite is a compaction
                # for every consumer — state, time travel, and the
                # restore oracle must all see through it
                before = t.version()
                t.zorder(["k", vname], num_files=2)
                if t.version() != before:  # empty table -> no commit
                    _snap()
                assert _table_state(t, vname) == _model_state(model), (
                    f"trial {trial} step {_step} zorder"
                )
                continue
            if op in ("delete_dv", "delete_rw"):
                # row-level DELETE, merge-on-read (deletion vector)
                # and rewrite flavors — interleaved with merges,
                # compactions, checkpoints and time travel below
                x = rnd.randint(0, 1000)
                before = t.version()
                t.delete(f"{vname} >= {x}", use_dv=(op == "delete_dv"))
                model = model[model["v"] < x].reset_index(drop=True)
                if t.version() != before:  # no matches -> no commit
                    _snap()
                assert _table_state(t, vname) == _model_state(model), (
                    f"trial {trial} step {_step} {op} v>={x}"
                )
                continue
            if op == "replace_where":
                # r10: atomic slice swap on the (never-renamed) key
                # column, both copy-rewrite and DV flavors — model is
                # drop-matching + append-replacement
                x = rnd.randint(0, 20)
                sdf, pdf = _mk_df(spark, rnd)
                sdf = sdf.withColumnRenamed("v", vname)
                repl_s = sdf.where(f"k < {x}")
                repl_p = pdf[pdf["k"] < x]
                before = t.version()
                t.replace_where(repl_s, f"k < {x}",
                                use_dv=rnd.random() < 0.5)
                model = pd.concat(
                    [model[model["k"] >= x], repl_p],
                    ignore_index=True)
                if t.version() != before:
                    _snap()
                assert _table_state(t, vname) == _model_state(model), (
                    f"trial {trial} step {_step} replace_where k<{x}"
                )
                continue
            if op in ("row_update", "row_update_dv"):
                x = rnd.randint(0, 1000)
                before = t.version()
                t.update({vname: f"{vname} + 7"}, f"{vname} >= {x}",
                         use_dv=(op == "row_update_dv"))
                model = model.copy()
                model.loc[model["v"] >= x, "v"] += 7
                if t.version() != before:
                    _snap()
                assert _table_state(t, vname) == _model_state(model), (
                    f"trial {trial} step {_step} row_update v>={x}"
                )
                continue
            sdf, pdf = _mk_df(spark, rnd)
            sdf = sdf.withColumnRenamed("v", vname)
            if op == "append":
                t.write(sdf, WriteMode.append)
            elif op == "overwrite":
                t.write(sdf, WriteMode.overwrite)
            else:
                mt = {"upsert": MergeType.upsert,
                      "delete_unmatched": MergeType.replace_delete_unmatched,
                      "update_only": MergeType.update_only,
                      "dedup_insert": MergeType.deduplicate_insert}[op]
                src = sdf.dropDuplicates(["k"])
                t.merge(src, MergeConfig(mt, predicate="s.k = t.k"))
                pdf = pdf.drop_duplicates("k", keep="first")
            model = _apply_model(model, op, pdf)
            _snap()
            assert _table_state(t, vname) == _model_state(model), (
                f"trial {trial} step {_step} op {op}"
            )

        # time travel reproduces every historical state — positional
        # values, because each version reads under its OWN logical
        # column name (pre-rename versions keep the old name)
        for version, want in enumerate(states):
            if version < boundary:
                # log retention removed this version's commit files —
                # time travel must raise the pointed error, never
                # return wrong data
                try:
                    t.read(version=version)
                except LogTruncatedError:
                    continue
                raise AssertionError(
                    f"trial {trial} version {version} below cleanup "
                    f"boundary {boundary} still readable")
            df = t.read(version=version)
            kcol, vcol = df.columns
            got = sorted((r[kcol], r[vcol]) for r in df.collect())
            assert got == want, f"trial {trial} version {version}"

        # bloom-probed point reads agree with the model on present AND
        # absent keys (soundness: a bitmap may only skip definite
        # misses, whatever op sequence produced the files)
        for key in (rnd.choice(KEYS), 10**6):
            got = sorted(r["k"] for r in t.read(
                dnf=[("k", "=", key)]).collect())
            want = sorted(
                int(k) for k in model["k"] if int(k) == key)
            assert got == want, f"trial {trial} bloom probe k={key}"

        # vacuum current-version-unreferenced files; live state intact
        t.vacuum(retention_ms=0)
        assert _table_state(t, vname) == _model_state(model), (
            f"trial {trial} vacuum")

        # r15: EXPORT ROUND-TRIP AUDIT — whatever state the op
        # sequence produced (DV masks, colmap renames, appendOnly,
        # truncated logs, bloom machinery keys), the final snapshot
        # must export as a real Delta log and re-convert
        # bit-identically; half the trials checkpoint the export and
        # half of THOSE replay through the checkpoint alone (JSON
        # deleted) — the aged-foreign-log shape.
        import os as _os
        import shutil as _shutil

        from dagster_delta_spark import (
            convert_from_delta,
            export_delta_log,
        )
        from dagster_delta_spark.tablelog import LOG_DIR as _LOG_DIR

        foreign = _os.path.join(t.table_uri, "_delta_log")
        if _os.path.isdir(foreign):
            # inert leftover of the delta-start fixture (our log is
            # the table after convert); export refuses to clobber it
            _shutil.rmtree(foreign)
        res = export_delta_log(
            spark, t.table_uri,
            checkpoint_threshold=0 if rnd.random() < 0.5 else 10**6)
        rt = t.table_uri.rstrip("/") + "-export-rt"
        _shutil.copytree(t.table_uri, rt,
                         ignore=_shutil.ignore_patterns(_LOG_DIR))
        if res["checkpointed"] and rnd.random() < 0.5:
            _os.remove(_os.path.join(rt, "_delta_log",
                                     "0" * 20 + ".json"))
        convert_from_delta(spark, rt)
        back = DeltaSparkTable(spark, rt)
        assert _table_state(back, vname) == _model_state(model), (
            f"trial {trial} export round trip")
        _shutil.rmtree(rt, ignore_errors=True)


# -- predicate-compiler properties (hypothesis) ------------------------------


from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from dagster_delta_spark import TablePartitionDimension, TimeWindow
from dagster_delta_spark.plans.predicates import partition_dimensions_to_dnf
from pyspark.sql.types import StructField, StructType, TimestampType

_TS_SCHEMA = StructType([StructField("ts", TimestampType())])
_EPOCH = datetime(2020, 1, 1)


def _windows(spans):
    return [
        TimeWindow(_EPOCH + timedelta(days=s), _EPOCH + timedelta(days=e))
        for s, e in spans
    ]


@st.composite
def _span_lists(draw):
    n = draw(st.integers(1, 6))
    out = []
    for _ in range(n):
        s = draw(st.integers(0, 30))
        e = draw(st.integers(s + 1, s + 10))
        out.append((s, e))
    return out


@given(_span_lists())
@settings(max_examples=200, deadline=None)
def test_read_range_covers_every_window(spans):
    """Input DNF is always [min(start), max(end)) over the windows."""
    dnf = partition_dimensions_to_dnf(
        [TablePartitionDimension("ts", _windows(spans))],
        _TS_SCHEMA, input_dnf=True,
    )
    lo = _EPOCH + timedelta(days=min(s for s, _ in spans))
    hi = _EPOCH + timedelta(days=max(e for _, e in spans))
    assert dnf == [("ts", ">=", lo), ("ts", "<", hi)]


@given(_span_lists())
@settings(max_examples=200, deadline=None)
def test_write_scope_raises_iff_union_has_gap(spans):
    """The write path rejects exactly the window sets whose union is
    not one contiguous interval (an overwrite scoped past a gap would
    delete the gap's partitions)."""
    days = set()
    for s, e in spans:
        days.update(range(s, e))
    union_contiguous = days == set(range(min(days), max(days) + 1))
    dims = [TablePartitionDimension("ts", _windows(spans))]
    if union_contiguous:
        dnf = partition_dimensions_to_dnf(dims, _TS_SCHEMA, input_dnf=False)
        assert dnf[0][1] == ">=" and dnf[1][1] == "<"
    else:
        import pytest

        with pytest.raises(ValueError, match="non-contiguous"):
            partition_dimensions_to_dnf(dims, _TS_SCHEMA, input_dnf=False)


def test_read_changes_matches_append_model(spark, tmp_path):
    """Random append/optimize sequences: the incremental feed must
    reproduce exactly the appended batches (tagged with their commit
    version), resume correctly from every checkpoint version, and
    never re-emit compacted rows."""
    rnd = random.Random(99)
    for trial in range(2):
        t = DeltaSparkTable(spark, str(tmp_path / f"c{trial}"))
        batches = {}
        sdf, pdf = _mk_df(spark, rnd)
        t.write(sdf, WriteMode.error)
        batches[t.version()] = sorted(map(tuple, pdf.itertuples(index=False)))
        for _ in range(12):
            if rnd.random() < 0.25:
                t.optimize(target_file_size=1 << 20)
                continue
            sdf, pdf = _mk_df(spark, rnd)
            t.write(sdf, WriteMode.append)
            batches[t.version()] = sorted(
                map(tuple, pdf.itertuples(index=False))
            )
        feed = [(r["k"], r["v"], r["_commit_version"])
                for r in t.read_changes(-1).collect()]
        assert sorted((k, v) for k, v, _ in feed) == _table_state(t)
        byv = {}
        for k, v, cv in feed:
            byv.setdefault(cv, []).append((k, v))
        assert {cv: sorted(rows) for cv, rows in byv.items()} == batches
        for start in sorted(batches):
            got = sorted(
                (r["k"], r["v"], r["_commit_version"])
                for r in t.read_changes(start).collect()
            )
            want = sorted(
                (k, v, cv)
                for cv in batches if cv > start for k, v in batches[cv]
            )
            assert got == want, f"trial {trial} resume from {start}"


def test_scoped_optimize_interleaves_dml_cdc_rollup(spark, tmp_path):
    """r13: OPTIMIZE ... WHERE (partition-scoped bin-pack AND scoped
    cluster_by) interleaved with appends and merge-on-read
    DELETE/UPDATE on a PARTITIONED table — the interleaving class the
    r10 ledger-wipe bug taught.  Invariants per step: table state
    matches the pandas model, a scoped pass never touches
    out-of-scope partitions' files, and a CDC-maintained rollup
    folding after EVERY step (compactions skipped, DV DML signed)
    equals a fresh recompute; at the end the row-level CDC feed
    replays the whole history into exactly the final state."""
    from dagster_delta_spark.operators.incremental import (
        maintain_rollup,
        rollup_vs_recompute,
    )

    measures = {"n": "count(*)", "sv": "sum(v)"}
    rnd = random.Random(4242)
    for trial in range(2):
        t = DeltaSparkTable(spark, str(tmp_path / f"so{trial}"))
        rollup = DeltaSparkTable(spark, str(tmp_path / f"so{trial}r"))

        def mk():
            rows = [(k, rnd.randint(0, 1000), k % 3)
                    for k in rnd.sample(KEYS, rnd.randint(1, 10))]
            return (
                spark.createDataFrame(rows, "k bigint, v bigint, p bigint"),
                pd.DataFrame(rows, columns=["k", "v", "p"]),
            )

        sdf, model = mk()
        t.write(sdf, WriteMode.error, partition_columns=["p"])
        maintain_rollup(t, rollup, ["p"], measures, count_col="n")

        def out_files(scope):
            return {
                a.path for a in t.snapshot().files
                if a.partition_values.get("p") != str(scope)
            }

        for _step in range(14):
            op = rnd.choice(["append", "append", "delete_dv",
                             "update_dv", "opt_scoped",
                             "opt_cluster_scoped", "opt_full"])
            if op == "append":
                sdf, pdf = mk()
                t.write(sdf, WriteMode.append)
                model = pd.concat([model, pdf], ignore_index=True)
            elif op == "delete_dv":
                x = rnd.randint(0, 1000)
                t.delete(f"v >= {x}", use_dv=True)
                model = model[model["v"] < x].reset_index(drop=True)
            elif op == "update_dv":
                x = rnd.randint(0, 1000)
                t.update({"v": "v + 7"}, f"v < {x}", use_dv=True)
                model.loc[model["v"] < x, "v"] += 7
            else:
                scope = rnd.randrange(3)
                before = out_files(scope)
                dnf = None if op == "opt_full" else [("p", "=", scope)]
                cluster = ["k"] if op == "opt_cluster_scoped" else None
                t.optimize(target_file_size=1 << 20,
                           cluster_by=cluster, partition_dnf=dnf)
                if dnf is not None:
                    assert out_files(scope) == before, (
                        f"trial {trial} step {_step} {op} touched "
                        f"out-of-scope partitions")
            got = sorted((r["k"], r["v"], r["p"])
                         for r in t.read().collect())
            want = sorted(map(tuple,
                              model[["k", "v", "p"]]
                              .itertuples(index=False)))
            assert got == want, f"trial {trial} step {_step} {op}"
            maintain_rollup(t, rollup, ["p"], measures, count_col="n")
            assert rollup_vs_recompute(
                t, rollup, ["p"], measures).count() == 0, (
                f"trial {trial} step {_step} {op} rollup drift")
        # the row-level feed sees through every scoped compaction:
        # inserts + postimages minus deletes + preimages == state
        feed = t.read_changes(-1, row_level=True).collect()
        net = {}
        for r in feed:
            key = (r["k"], r["v"], r["p"])
            d = 1 if r["_change_type"] in ("insert",
                                           "update_postimage") else -1
            net[key] = net.get(key, 0) + d
        replayed = sorted(
            k for k, c in net.items() for _ in range(c) if c > 0)
        assert replayed == want, f"trial {trial} CDC replay mismatch"
