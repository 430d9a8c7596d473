"""Model-based property test for the transaction-log table family:
a random sequence of append / merge / merge-with-tombstones / delete /
overwrite / optimize (full or bin-packed) / restore / cleanup_log
commits must leave the table equal to a pure-Python dict model after
EVERY commit, every retained historical version must time-travel to the
model's snapshot at that version (by NUMBER and by its recorded
TIMESTAMP), and versions expired by log retention must drop out of the
readable set without perturbing anything else.

Appends draw from disjoint key blocks (one clustered file per commit,
the layout merge's file pruning is designed for), merges upsert
keep-latest per key with update-wins ties, deletes purge a key range
(metadata drops + boundary rewrites decided by footer stats), and
overwrites replace the table. The model is the serial execution of the
same ops on a dict — exactly the serializable history the optimistic
commit loop promises."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from metadata_driven_data_pipeline_spark.sinks import txlog


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, v, s) for k, v, s in rows], "k int, v string, seq int"
    ).coalesce(1)


def _table_rows(spark, root, version=None):
    df = txlog.read_table(spark, root, version=version)
    return {(r["k"], r["v"], r["seq"]) for r in df.collect()}


_op = st.sampled_from(
    [
        "append",
        "merge",
        "merge_delete",
        "delete",
        "overwrite",
        "optimize",
        "restore",
        "cleanup",
    ]
)


@st.composite
def _op_sequences(draw):
    n = draw(st.integers(min_value=3, max_value=6))
    ops = ["append"]  # bootstrap the table
    ops += [draw(_op) for _ in range(n - 1)]
    return ops


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_op_sequences(), data=st.data())
def test_random_commit_sequences_match_dict_model(spark, tmp_path, ops, data):
    import uuid

    root = str(tmp_path / f"t-{uuid.uuid4().hex[:8]}")
    model: dict[int, tuple[str, int]] = {}
    history: dict[int, dict] = {}  # committed version -> model snapshot
    block = 0
    seq = 0

    for op in ops:
        seq += 1
        if op == "append":
            n = data.draw(st.integers(min_value=1, max_value=5), label="n_app")
            keys = [block * 100 + i for i in range(n)]
            block += 1
            rows = [(k, f"a{k}", seq) for k in keys]
            rep = txlog.append(spark, _df(spark, rows), root)
            for k, v, s in rows:
                model[k] = (v, s)
        elif op == "merge":
            if not model:
                continue
            pool = sorted(model)
            upd_keys = data.draw(
                st.lists(st.sampled_from(pool), min_size=1, max_size=4, unique=True),
                label="merge_keys",
            )
            new_key = block * 100
            block += 1
            rows = [(k, f"m{k}s{seq}", seq) for k in upd_keys]
            rows.append((new_key, f"m{new_key}s{seq}", seq))
            rep = txlog.merge(spark, _df(spark, rows), root, ["k"], "seq")
            for k, v, s in rows:
                cur = model.get(k)
                if cur is None or s >= cur[1]:  # update wins order ties
                    model[k] = (v, s)
        elif op == "merge_delete":
            if not model:
                continue
            pool = sorted(model)
            del_keys = data.draw(
                st.lists(st.sampled_from(pool), min_size=1, max_size=3, unique=True),
                label="tomb_keys",
            )
            absent = block * 100
            block += 1
            # tombstones for live keys + one for an absent key (no-op)
            rows = [(k, "DEL", seq) for k in del_keys] + [(absent, "DEL", seq)]
            rep = txlog.merge(
                spark, _df(spark, rows), root, ["k"], "seq",
                when_matched_delete="v = 'DEL'",
            )
            for k in del_keys:
                cur = model.get(k)
                if cur is None or seq >= cur[1]:  # tombstone wins keep-latest
                    model.pop(k, None)
        elif op == "delete":
            if not model:
                continue
            lo = data.draw(
                st.integers(min_value=0, max_value=max(model)), label="dlo"
            )
            hi = lo + data.draw(st.integers(min_value=1, max_value=150), label="dw")
            rep = txlog.delete(
                spark, root, [("k", ">=", lo), ("k", "<", hi)]
            )
            expect_deleted = [k for k in model if lo <= k < hi]
            assert rep["rows_deleted"] == len(expect_deleted)
            for k in expect_deleted:
                del model[k]
            if rep.get("skipped"):
                # no-op delete claims no version; skip snapshot bookkeeping
                assert not expect_deleted
                continue
        elif op == "overwrite":
            n = data.draw(st.integers(min_value=0, max_value=4), label="n_ow")
            keys = [block * 100 + i for i in range(n)]
            block += 1
            rows = [(k, f"o{k}", seq) for k in keys]
            rep = txlog.overwrite(spark, _df(spark, rows), root)
            model = {k: (v, s) for k, v, s in rows}
        elif op == "optimize":
            if not history:
                continue
            small = data.draw(
                st.sampled_from([None, 1000, 1 << 20]), label="binpack"
            )
            rep = txlog.optimize(
                spark, root, target_bytes=1 << 30, small_file_bytes=small
            )
            # compaction (full or bin-packed) is content-preserving
            if rep.get("skipped"):  # <2 qualifying files: commit-free no-op
                got = _table_rows(spark, root)
                assert got == {(k, v, s) for k, (v, s) in model.items()}
                continue
        elif op == "cleanup":
            if not history:
                continue
            rep = txlog.cleanup_log(root, keep_versions=2)
            hz = rep.get("horizon")
            if hz is not None:
                # versions below the horizon are no longer readable
                for v in [v for v in history if v < hz]:
                    del history[v]
            got = _table_rows(spark, root)  # current read unaffected
            assert got == {(k, v, s) for k, (v, s) in model.items()}
            continue  # no new version claimed
        else:  # restore
            if not history:
                continue
            target = data.draw(
                st.sampled_from(sorted(history)), label="restore_v"
            )
            rep = txlog.restore(spark, root, target)
            model = dict(history[target])

        version = rep["version"]
        history[version] = dict(model)
        got = _table_rows(spark, root)
        want = {(k, v, s) for k, (v, s) in model.items()}
        assert got == want, f"divergence after {op} at v{version}"

    # time travel: every RETAINED version still reads as its snapshot,
    # by version number and by its recorded (monotonized) timestamp
    stamps = {h["version"]: h["ts"] for h in txlog.history(root)}
    for version, snap in history.items():
        got = _table_rows(spark, root, version=version)
        want = {(k, v, s) for k, (v, s) in snap.items()}
        assert got == want, f"time travel divergence at v{version}"
        if version in stamps:
            df = txlog.read_table(spark, root, timestamp=stamps[version])
            got_ts = {(r["k"], r["v"], r["seq"]) for r in df.collect()}
            assert got_ts == want, f"AS-OF divergence at v{version}"
