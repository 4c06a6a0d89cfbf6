"""Property-based check of the engine's central invariant (SURVEY §2.8):
for ANY sequence of DML (insert / update / delete), after FLUSH

  1. an aggregate MV equals a from-scratch recompute of its query,
  2. replaying the MV's changelog (Insert/UpdateInsert add a row,
     Delete/UpdateDelete remove one) reconstructs exactly the MV,
  3. changelog epochs are monotonically non-decreasing.

Hypothesis drives randomized op sequences; a pure-Python model of the
table provides the expected aggregate. Examples are capped (Spark
round-trips are ~seconds each) but each example exercises the full
insert→refresh→diff→changelog pipeline end to end.
"""

from __future__ import annotations

import itertools
from collections import Counter

import pandas as pd
import pytest
# Long-running sweep: excluded from the default fast lane (pyproject addopts
# -m "not slow"); the full suite runs it via -m "slow or not slow".
pytestmark = pytest.mark.slow


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

KEYS = ["a", "b", "c", "d"]

_insert = st.tuples(
    st.just("insert"),
    st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(0, 9)), min_size=1, max_size=3
    ),
)
_update = st.tuples(st.just("update"), st.sampled_from(KEYS), st.integers(10, 19))
_delete = st.tuples(st.just("delete"), st.sampled_from(KEYS))

_ops_seq = st.lists(st.one_of(_insert, _update, _delete), min_size=1, max_size=5)

_ids = itertools.count()


def _expected_agg(rows: list[tuple[str, int]]) -> Counter:
    agg: dict[str, list[int]] = {}
    for k, v in rows:
        agg.setdefault(k, [0, 0])
        agg[k][0] += v
        agg[k][1] += 1
    return Counter((k, total, n) for k, (total, n) in agg.items())


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=_ops_seq)
def test_mv_matches_model_and_changelog_replay(rw, ops):
    tag = f"t_prop_{next(_ids)}"
    model: list[tuple[str, int]] = []
    # Subscribe BEFORE any data: the changelog captures changes from
    # the subscription's creation point (the demo.py:50 contract), so
    # replay-from-empty reconstructs the MV only when the MV was empty
    # at subscription time.
    rw.execute(f"CREATE TABLE {tag} (p STRING, v BIGINT)")
    rw.mv(stmt=f"SELECT p, sum(v) AS total, count(*) AS n FROM {tag} GROUP BY p",
          name=f"{tag}_mv")
    st_mv = rw.engine.mvs[f"public.{tag}_mv"]
    assert st_mv.inc is not None
    rw.execute(
        f"CREATE SUBSCRIPTION IF NOT EXISTS public.{tag}_sub FROM public.{tag}_mv "
        "WITH (retention = '86400s')"
    )
    rw.execute(f"DECLARE {tag}_cur subscription cursor for public.{tag}_sub SINCE 0")
    try:
        for op in ops:
            if op[0] == "insert":
                rows = op[1]
                rw.insert(
                    data=pd.DataFrame(
                        {"p": [k for k, _ in rows], "v": [v for _, v in rows]}
                    ),
                    table_name=tag,
                    force_flush=True,
                )
                model.extend(rows)
            elif op[0] == "update":
                _, key, val = op
                rw.execute(f"UPDATE {tag} SET v = {val} WHERE p = '{key}'")
                model = [(k, val if k == key else v) for k, v in model]
            else:
                _, key = op
                rw.execute(f"DELETE FROM {tag} WHERE p = '{key}'")
                model = [(k, v) for k, v in model if k != key]
        rw.execute("FLUSH")
        # Retraction capability: ARBITRARY DML (updates/deletes
        # included) keeps the MV on the incremental fast path.
        assert st_mv.inc is not None, (
            "DML sequence must not demote the retraction-capable agg MV"
        )

        mv_rows = Counter(
            (r[0], r[1], r[2]) for r in rw.fetch(f"SELECT p, total, n FROM {tag}_mv")
        )
        # 1. MV == from-scratch recompute == Python model
        recomputed = Counter(
            (r[0], r[1], r[2])
            for r in rw.fetch(
                f"SELECT p, sum(v) AS total, count(*) AS n FROM {tag} GROUP BY p"
            )
        )
        assert mv_rows == recomputed == _expected_agg(model)

        # 2. changelog replay reconstructs the MV; 3. epochs monotonic
        _, ch = rw.engine.fetch_cursor(f"{tag}_cur", 100000)
        replayed: Counter = Counter()
        last_epoch = -1
        for row in ch:
            *vals, op_name, epoch = row
            assert epoch >= last_epoch
            last_epoch = epoch
            key = tuple(vals)
            if op_name in ("Insert", "UpdateInsert"):
                replayed[key] += 1
            else:
                assert op_name in ("Delete", "UpdateDelete"), op_name
                replayed[key] -= 1
                if replayed[key] == 0:
                    del replayed[key]
        assert replayed == mv_rows
    finally:
        rw.engine.drop_subscription(f"{tag}_sub")
        rw.execute(f"DROP MATERIALIZED VIEW IF EXISTS {tag}_mv")
        rw.execute(f"DROP TABLE IF EXISTS {tag}")


_insert_only_seq = st.lists(_insert, min_size=1, max_size=6)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=_insert_only_seq)
def test_incremental_fast_path_matches_model(rw, ops):
    """Same invariants as above, restricted to insert-only sequences —
    which keeps the MV on the incremental delta-merge fast path the
    whole time (asserted). The fast path must produce the exact same
    result and changelog-replay behavior the snapshot-diff path
    would."""
    tag = f"t_pinc_{next(_ids)}"
    model: list[tuple[str, int]] = []
    rw.execute(f"CREATE TABLE {tag} (p STRING, v BIGINT)")
    rw.mv(stmt=f"SELECT p, sum(v) AS total, count(*) AS n FROM {tag} GROUP BY p",
          name=f"{tag}_mv")
    st_mv = rw.engine.mvs[f"public.{tag}_mv"]
    assert st_mv.inc is not None, "insert-only simple agg must be incremental"
    rw.execute(
        f"CREATE SUBSCRIPTION IF NOT EXISTS public.{tag}_sub FROM public.{tag}_mv "
        "WITH (retention = '86400s')"
    )
    rw.execute(f"DECLARE {tag}_cur subscription cursor for public.{tag}_sub SINCE 0")
    try:
        for _, rows in ops:
            rw.insert(
                data=pd.DataFrame(
                    {"p": [k for k, _ in rows], "v": [v for _, v in rows]}
                ),
                table_name=tag,
                force_flush=True,
            )
            model.extend(rows)
        rw.execute("FLUSH")
        assert st_mv.inc is not None, "fast path must survive insert-only DML"

        mv_rows = Counter(
            (r[0], r[1], r[2]) for r in rw.fetch(f"SELECT p, total, n FROM {tag}_mv")
        )
        assert mv_rows == _expected_agg(model)

        _, ch = rw.engine.fetch_cursor(f"{tag}_cur", 100000)
        replayed: Counter = Counter()
        last_epoch = -1
        for row in ch:
            *vals, op_name, epoch = row
            assert epoch >= last_epoch
            last_epoch = epoch
            key = tuple(vals)
            if op_name in ("Insert", "UpdateInsert"):
                replayed[key] += 1
            else:
                assert op_name == "UpdateDelete", (
                    f"append-only MV must never emit {op_name}"
                )
                replayed[key] -= 1
                if replayed[key] == 0:
                    del replayed[key]
        assert replayed == mv_rows
    finally:
        rw.engine.drop_subscription(f"{tag}_sub")
        rw.execute(f"DROP MATERIALIZED VIEW IF EXISTS {tag}_mv")
        rw.execute(f"DROP TABLE IF EXISTS {tag}")


# ---------------------------------------------------------------------------
# Join+agg retraction property: random DML on BOTH sides of a star join
# ---------------------------------------------------------------------------

_UIDS = [1, 2, 3]
_REGIONS = ["na", "eu", "ap"]

_jfact_ins = st.tuples(
    st.just("fact_ins"),
    st.lists(
        st.tuples(st.sampled_from(_UIDS), st.integers(0, 9)),
        min_size=1, max_size=3,
    ),
)
_jdim_ins = st.tuples(
    st.just("dim_ins"), st.sampled_from(_UIDS), st.sampled_from(_REGIONS)
)
_jfact_upd = st.tuples(
    st.just("fact_upd"), st.sampled_from(_UIDS), st.integers(10, 19)
)
_jfact_del = st.tuples(st.just("fact_del"), st.sampled_from(_UIDS))
_jdim_del = st.tuples(st.just("dim_del"), st.sampled_from(_REGIONS))
# Same-flush insert/delete/re-insert of ONE row value: ins-count (2)
# exceeds post-batch count (1), so pre-batch reconstruction must be
# (table + Δdel) − Δins — the other order leaves a phantom row.
_jchurn = st.tuples(
    st.just("churn"), st.sampled_from(_UIDS), st.integers(0, 9)
)

_join_ops_seq = st.lists(
    st.one_of(_jfact_ins, _jdim_ins, _jfact_upd, _jfact_del, _jdim_del,
              _jchurn),
    min_size=1, max_size=4,
)


def _expected_joinagg(
    fact: list[tuple[int, int]], dim: list[tuple[int, str]]
) -> Counter:
    agg: dict[str, list] = {}
    for fuid, qty in fact:
        for duid, region in dim:  # bag join: every matching pair counts
            if fuid == duid:
                a = agg.setdefault(region, [0, 0, None])
                a[0] += qty
                a[1] += 1
                a[2] = qty if a[2] is None else max(a[2], qty)
    return Counter((k, t, n, hi) for k, (t, n, hi) in agg.items())


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=_join_ops_seq)
def test_joinagg_fast_path_matches_model_under_dml(rw, ops):
    """Retraction-capable join+agg IVM (engine._joinagg_retract): for
    ANY DML sequence on fact OR dim — including dim deletes that empty
    groups and duplicate dim keys that fan out the bag join — the MV
    stays on the composed fast path, equals a from-scratch recompute
    AND the Python bag-join model, and its changelog replays to the
    MV state with monotonic epochs."""
    tag = f"t_pja_{next(_ids)}"
    fact: list[tuple[int, int]] = []
    dim: list[tuple[int, str]] = []
    rw.execute(f"CREATE TABLE {tag}_f (uid BIGINT, qty BIGINT)")
    rw.execute(f"CREATE TABLE {tag}_d (uid BIGINT, region STRING)")
    rw.mv(
        stmt=(
            f"SELECT d.region AS region, sum(f.qty) AS total, "
            f"count(*) AS n, max(f.qty) AS hi "
            f"FROM {tag}_f f JOIN {tag}_d d ON f.uid = d.uid "
            f"GROUP BY d.region"
        ),
        name=f"{tag}_mv",
    )
    st_mv = rw.engine.mvs[f"public.{tag}_mv"]
    assert st_mv.inc_joinagg is not None
    rw.execute(
        f"CREATE SUBSCRIPTION IF NOT EXISTS public.{tag}_sub FROM public.{tag}_mv "
        "WITH (retention = '86400s')"
    )
    rw.execute(f"DECLARE {tag}_cur subscription cursor for public.{tag}_sub SINCE 0")
    try:
        for op in ops:
            if op[0] == "fact_ins":
                rows = op[1]
                rw.insert(
                    data=pd.DataFrame(
                        {"uid": [u for u, _ in rows], "qty": [q for _, q in rows]}
                    ),
                    table_name=f"{tag}_f",
                    force_flush=True,
                )
                fact.extend(rows)
            elif op[0] == "dim_ins":
                _, uid, region = op
                rw.insert(
                    data=pd.DataFrame({"uid": [uid], "region": [region]}),
                    table_name=f"{tag}_d",
                    force_flush=True,
                )
                dim.append((uid, region))
            elif op[0] == "fact_upd":
                _, uid, qty = op
                rw.execute(f"UPDATE {tag}_f SET qty = {qty} WHERE uid = {uid}")
                fact = [(u, qty if u == uid else q) for u, q in fact]
            elif op[0] == "fact_del":
                _, uid = op
                rw.execute(f"DELETE FROM {tag}_f WHERE uid = {uid}")
                fact = [(u, q) for u, q in fact if u != uid]
            elif op[0] == "churn":
                # insert/delete/re-insert the SAME row within one
                # flush window (no intermediate FLUSH)
                _, uid, qty = op
                row = pd.DataFrame({"uid": [uid], "qty": [qty]})
                rw.insert(data=row, table_name=f"{tag}_f",
                          force_flush=False)
                rw.execute(
                    f"DELETE FROM {tag}_f WHERE uid = {uid} AND qty = {qty}"
                )
                rw.insert(data=row, table_name=f"{tag}_f",
                          force_flush=False)
                fact = [r for r in fact if r != (uid, qty)]
                fact.append((uid, qty))
            else:
                _, region = op
                rw.execute(f"DELETE FROM {tag}_d WHERE region = '{region}'")
                dim = [(u, r) for u, r in dim if r != region]
        rw.execute("FLUSH")
        assert st_mv.inc_joinagg is not None, (
            "DML sequence must not demote the retraction-capable join+agg MV"
        )

        mv_rows = Counter(tuple(r) for r in rw.fetch(f"SELECT * FROM {tag}_mv"))
        recomputed = Counter(
            tuple(r)
            for r in rw.fetch(
                f"SELECT d.region AS region, sum(f.qty) AS total, "
                f"count(*) AS n, max(f.qty) AS hi "
                f"FROM {tag}_f f JOIN {tag}_d d ON f.uid = d.uid "
                f"GROUP BY d.region"
            )
        )
        assert mv_rows == recomputed == _expected_joinagg(fact, dim)

        _, ch = rw.engine.fetch_cursor(f"{tag}_cur", 100000)
        replayed: Counter = Counter()
        last_epoch = -1
        for row in ch:
            *vals, op_name, epoch = row
            assert epoch >= last_epoch
            last_epoch = epoch
            key = tuple(vals)
            if op_name in ("Insert", "UpdateInsert"):
                replayed[key] += 1
            else:
                assert op_name in ("Delete", "UpdateDelete"), op_name
                replayed[key] -= 1
                if replayed[key] == 0:
                    del replayed[key]
        assert replayed == mv_rows
    finally:
        rw.engine.drop_subscription(f"{tag}_sub")
        rw.execute(f"DROP MATERIALIZED VIEW IF EXISTS {tag}_mv")
        rw.execute(f"DROP TABLE IF EXISTS {tag}_f")
        rw.execute(f"DROP TABLE IF EXISTS {tag}_d")


def _expected_leftjoin(
    fact: list[tuple[int, int]], dim: list[tuple[int, str]]
) -> Counter:
    out: Counter = Counter()
    for fuid, qty in fact:
        matches = [r for u, r in dim if u == fuid]
        if matches:
            for r in matches:  # bag join fan-out
                out[(fuid, r, qty)] += 1
        else:
            out[(fuid, None, qty)] += 1  # LEFT pad
    return out


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=_join_ops_seq)
def test_plain_join_fast_path_matches_model_under_dml(rw, ops):
    """Retraction-capable plain-join IVM (engine._join_retract_refresh)
    on a LEFT join: for ANY DML sequence on fact OR dim — including
    dim deletes that resurrect pads and duplicate dim keys that fan
    out — the MV stays on the fast path, equals a from-scratch
    recompute AND the Python bag-join model, and its changelog replays
    to the MV state with monotonic epochs."""
    tag = f"t_pjj_{next(_ids)}"
    fact: list[tuple[int, int]] = []
    dim: list[tuple[int, str]] = []
    rw.execute(f"CREATE TABLE {tag}_f (uid BIGINT, qty BIGINT)")
    rw.execute(f"CREATE TABLE {tag}_d (uid BIGINT, region STRING)")
    rw.mv(
        stmt=(
            f"SELECT f.uid AS uid, d.region AS region, f.qty AS qty "
            f"FROM {tag}_f f LEFT JOIN {tag}_d d ON f.uid = d.uid"
        ),
        name=f"{tag}_mv",
    )
    st_mv = rw.engine.mvs[f"public.{tag}_mv"]
    assert st_mv.inc_join is not None
    rw.execute(
        f"CREATE SUBSCRIPTION IF NOT EXISTS public.{tag}_sub FROM public.{tag}_mv "
        "WITH (retention = '86400s')"
    )
    rw.execute(f"DECLARE {tag}_cur subscription cursor for public.{tag}_sub SINCE 0")
    try:
        for op in ops:
            if op[0] == "fact_ins":
                rows = op[1]
                rw.insert(
                    data=pd.DataFrame(
                        {"uid": [u for u, _ in rows], "qty": [q for _, q in rows]}
                    ),
                    table_name=f"{tag}_f",
                    force_flush=True,
                )
                fact.extend(rows)
            elif op[0] == "dim_ins":
                _, uid, region = op
                rw.insert(
                    data=pd.DataFrame({"uid": [uid], "region": [region]}),
                    table_name=f"{tag}_d",
                    force_flush=True,
                )
                dim.append((uid, region))
            elif op[0] == "fact_upd":
                _, uid, qty = op
                rw.execute(f"UPDATE {tag}_f SET qty = {qty} WHERE uid = {uid}")
                fact = [(u, qty if u == uid else q) for u, q in fact]
            elif op[0] == "fact_del":
                _, uid = op
                rw.execute(f"DELETE FROM {tag}_f WHERE uid = {uid}")
                fact = [(u, q) for u, q in fact if u != uid]
            elif op[0] == "churn":
                # insert/delete/re-insert the SAME row within one
                # flush window (no intermediate FLUSH)
                _, uid, qty = op
                row = pd.DataFrame({"uid": [uid], "qty": [qty]})
                rw.insert(data=row, table_name=f"{tag}_f",
                          force_flush=False)
                rw.execute(
                    f"DELETE FROM {tag}_f WHERE uid = {uid} AND qty = {qty}"
                )
                rw.insert(data=row, table_name=f"{tag}_f",
                          force_flush=False)
                fact = [r for r in fact if r != (uid, qty)]
                fact.append((uid, qty))
            else:
                _, region = op
                rw.execute(f"DELETE FROM {tag}_d WHERE region = '{region}'")
                dim = [(u, r) for u, r in dim if r != region]
        rw.execute("FLUSH")
        assert st_mv.inc_join is not None, (
            "DML sequence must not demote the retraction-capable join MV"
        )

        mv_rows = Counter(tuple(r) for r in rw.fetch(f"SELECT * FROM {tag}_mv"))
        recomputed = Counter(
            tuple(r)
            for r in rw.fetch(
                f"SELECT f.uid AS uid, d.region AS region, f.qty AS qty "
                f"FROM {tag}_f f LEFT JOIN {tag}_d d ON f.uid = d.uid"
            )
        )
        assert mv_rows == recomputed == _expected_leftjoin(fact, dim)

        _, ch = rw.engine.fetch_cursor(f"{tag}_cur", 100000)
        replayed: Counter = Counter()
        last_epoch = -1
        for row in ch:
            *vals, op_name, epoch = row
            assert epoch >= last_epoch
            last_epoch = epoch
            key = tuple(vals)
            if op_name in ("Insert", "UpdateInsert"):
                replayed[key] += 1
            else:
                assert op_name in ("Delete", "UpdateDelete"), op_name
                replayed[key] -= 1
                if replayed[key] == 0:
                    del replayed[key]
        assert replayed == mv_rows
    finally:
        rw.engine.drop_subscription(f"{tag}_sub")
        rw.execute(f"DROP MATERIALIZED VIEW IF EXISTS {tag}_mv")
        rw.execute(f"DROP TABLE IF EXISTS {tag}_f")
        rw.execute(f"DROP TABLE IF EXISTS {tag}_d")


# ---------------------------------------------------------------------------
# 3-way star join+agg retraction property: DML on fact and both dims
# ---------------------------------------------------------------------------

_PIDS = [10, 11]
_CATS = ["x", "y"]

_s3fact_ins = st.tuples(
    st.just("fact_ins"), st.sampled_from(_UIDS), st.sampled_from(_PIDS),
    st.integers(0, 9),
)
_s3dimu_ins = st.tuples(
    st.just("dimu_ins"), st.sampled_from(_UIDS), st.sampled_from(_REGIONS)
)
_s3dimp_ins = st.tuples(
    st.just("dimp_ins"), st.sampled_from(_PIDS), st.sampled_from(_CATS)
)
_s3fact_del = st.tuples(st.just("fact_del"), st.sampled_from(_UIDS))
_s3dimu_del = st.tuples(st.just("dimu_del"), st.sampled_from(_REGIONS))
_s3dimp_del = st.tuples(st.just("dimp_del"), st.sampled_from(_CATS))
_s3churn = st.tuples(
    st.just("churn"), st.sampled_from(_UIDS), st.sampled_from(_PIDS),
    st.integers(0, 9),
)

_star3_ops_seq = st.lists(
    st.one_of(_s3fact_ins, _s3dimu_ins, _s3dimp_ins,
              _s3fact_del, _s3dimu_del, _s3dimp_del, _s3churn),
    min_size=2, max_size=4,
)


def _expected_star3(fact, dimu, dimp) -> Counter:
    agg: dict = {}
    for fuid, fpid, qty in fact:
        for duid, region in dimu:
            if duid != fuid:
                continue
            for dpid, cat in dimp:
                if dpid != fpid:
                    continue
                a = agg.setdefault((region, cat), [0, 0])
                a[0] += qty
                a[1] += 1
    return Counter((r, c, t, n) for (r, c), (t, n) in agg.items())


@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=_star3_ops_seq)
def test_star3_fast_path_matches_model_under_dml(rw, ops):
    """3-way star join+agg IVM under random DML on the fact and BOTH
    dimensions: stays on the fast path, equals recompute AND the
    Python bag-join model, changelog replays to the MV state."""
    tag = f"t_ps3_{next(_ids)}"
    fact: list = []
    dimu: list = []
    dimp: list = []
    rw.execute(f"CREATE TABLE {tag}_f (uid BIGINT, pid BIGINT, qty BIGINT)")
    rw.execute(f"CREATE TABLE {tag}_u (uid BIGINT, region STRING)")
    rw.execute(f"CREATE TABLE {tag}_p (pid BIGINT, cat STRING)")
    rw.mv(
        stmt=(
            f"SELECT u.region AS region, p.cat AS cat, sum(f.qty) AS total, "
            f"count(*) AS n "
            f"FROM {tag}_f f JOIN {tag}_u u ON f.uid = u.uid "
            f"JOIN {tag}_p p ON f.pid = p.pid "
            f"GROUP BY u.region, p.cat"
        ),
        name=f"{tag}_mv",
    )
    st_mv = rw.engine.mvs[f"public.{tag}_mv"]
    assert st_mv.inc_joinagg is not None
    rw.execute(
        f"CREATE SUBSCRIPTION IF NOT EXISTS public.{tag}_sub FROM public.{tag}_mv "
        "WITH (retention = '86400s')"
    )
    rw.execute(f"DECLARE {tag}_cur subscription cursor for public.{tag}_sub SINCE 0")
    try:
        for op in ops:
            if op[0] == "fact_ins":
                _, uid, pid, qty = op
                rw.insert(
                    data=pd.DataFrame({"uid": [uid], "pid": [pid], "qty": [qty]}),
                    table_name=f"{tag}_f", force_flush=True,
                )
                fact.append((uid, pid, qty))
            elif op[0] == "dimu_ins":
                _, uid, region = op
                rw.insert(
                    data=pd.DataFrame({"uid": [uid], "region": [region]}),
                    table_name=f"{tag}_u", force_flush=True,
                )
                dimu.append((uid, region))
            elif op[0] == "dimp_ins":
                _, pid, cat = op
                rw.insert(
                    data=pd.DataFrame({"pid": [pid], "cat": [cat]}),
                    table_name=f"{tag}_p", force_flush=True,
                )
                dimp.append((pid, cat))
            elif op[0] == "fact_del":
                _, uid = op
                rw.execute(f"DELETE FROM {tag}_f WHERE uid = {uid}")
                fact = [r for r in fact if r[0] != uid]
            elif op[0] == "dimu_del":
                _, region = op
                rw.execute(f"DELETE FROM {tag}_u WHERE region = '{region}'")
                dimu = [r for r in dimu if r[1] != region]
            elif op[0] == "churn":
                # same-flush insert/delete/re-insert of one fact row
                _, uid, pid, qty = op
                row = pd.DataFrame(
                    {"uid": [uid], "pid": [pid], "qty": [qty]}
                )
                rw.insert(data=row, table_name=f"{tag}_f",
                          force_flush=False)
                rw.execute(
                    f"DELETE FROM {tag}_f WHERE uid = {uid} "
                    f"AND pid = {pid} AND qty = {qty}"
                )
                rw.insert(data=row, table_name=f"{tag}_f",
                          force_flush=False)
                fact = [r for r in fact if r != (uid, pid, qty)]
                fact.append((uid, pid, qty))
            else:
                _, cat = op
                rw.execute(f"DELETE FROM {tag}_p WHERE cat = '{cat}'")
                dimp = [r for r in dimp if r[1] != cat]
        rw.execute("FLUSH")
        assert st_mv.inc_joinagg is not None, (
            "DML sequence must not demote the 3-way star MV"
        )

        mv_rows = Counter(tuple(r) for r in rw.fetch(f"SELECT * FROM {tag}_mv"))
        recomputed = Counter(
            tuple(r)
            for r in rw.fetch(
                f"SELECT u.region AS region, p.cat AS cat, sum(f.qty) AS total, "
                f"count(*) AS n "
                f"FROM {tag}_f f JOIN {tag}_u u ON f.uid = u.uid "
                f"JOIN {tag}_p p ON f.pid = p.pid "
                f"GROUP BY u.region, p.cat"
            )
        )
        assert mv_rows == recomputed == _expected_star3(fact, dimu, dimp)

        _, ch = rw.engine.fetch_cursor(f"{tag}_cur", 100000)
        replayed: Counter = Counter()
        last_epoch = -1
        for row in ch:
            *vals, op_name, epoch = row
            assert epoch >= last_epoch
            last_epoch = epoch
            key = tuple(vals)
            if op_name in ("Insert", "UpdateInsert"):
                replayed[key] += 1
            else:
                assert op_name in ("Delete", "UpdateDelete"), op_name
                replayed[key] -= 1
                if replayed[key] == 0:
                    del replayed[key]
        assert replayed == mv_rows
    finally:
        rw.engine.drop_subscription(f"{tag}_sub")
        rw.execute(f"DROP MATERIALIZED VIEW IF EXISTS {tag}_mv")
        for t in (f"{tag}_f", f"{tag}_u", f"{tag}_p"):
            rw.execute(f"DROP TABLE IF EXISTS {t}")


# --- upsert-log compaction property (round 5) -------------------------

_up_op = st.one_of(
    st.tuples(st.just("upsert"), st.integers(0, 3), st.integers(0, 30)),
    st.tuples(st.just("delete"), st.integers(0, 3)),
    st.tuples(st.just("flush"),),
)
_up_seq = st.lists(_up_op, min_size=3, max_size=10)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=_up_seq)
def test_upsert_compaction_matches_model(rw, ops):
    """With compaction forced on EVERY flush (threshold 1), an upsert
    table under random upserts/deletes/flushes must always equal the
    version-resolution model: per key, the highest version wins (ties
    to the latest write), and a tombstone at the winning version hides
    the key — including after its log was compacted away and the key
    is re-inserted with a lower version."""
    t = f"t_prop_upc_{next(_ids)}"
    eng = rw.engine
    eng.UPSERT_COMPACT_BATCHES = 1  # instance attr shadows class
    try:
        rw.execute(
            f"CREATE TABLE {t} (k INT PRIMARY KEY, v VARCHAR, ver BIGINT) "
            f"ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(ver)"
        )
        # model: k -> (ver, seq, value_or_None)  (seq breaks version ties)
        model: dict[int, tuple[int, int, str | None]] = {}
        seq = 0
        for op in ops:
            if op[0] == "upsert":
                _, k, ver = op
                seq += 1
                val = f"v{seq}"
                rw.execute(
                    f"INSERT INTO {t} (k, v, ver) VALUES ({k}, '{val}', {ver})"
                )
                cur = model.get(k)
                if cur is None or (ver, seq) >= (cur[0], cur[1]):
                    model[k] = (ver, seq, val)
            elif op[0] == "delete":
                _, k = op
                cur = model.get(k)
                rw.execute(f"DELETE FROM {t} WHERE k = {k}")
                if cur is not None and cur[2] is not None:
                    seq += 1
                    # tombstone carries the current winning version
                    model[k] = (cur[0], seq, None)
            else:
                rw.execute("FLUSH")
        rw.execute("FLUSH")
        got = sorted(rw.fetch(f"SELECT k, v, ver FROM {t}"))
        want = sorted(
            (k, val, ver)
            for k, (ver, _s, val) in model.items()
            if val is not None
        )
        assert got == want, (got, want, ops)
        # compaction really ran: after the final FLUSH the log holds
        # at most one (winner or tombstone) row per touched key
        log = eng.log_name(f"public.{t}")
        n_log = rw.engine.spark.table(log).count()
        assert n_log <= len(model), (n_log, model)
    finally:
        del eng.UPSERT_COMPACT_BATCHES
        rw.execute(f"DROP TABLE IF EXISTS {t}")


# -- grouped Top-N fast path under arbitrary DML -------------------------

_topn_insert = st.tuples(
    st.just("insert"),
    st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(0, 9)),
        min_size=1,
        max_size=3,
    ),
)
_topn_update = st.tuples(st.just("update"), st.sampled_from(KEYS),
                         st.integers(10, 19))
_topn_delete = st.tuples(st.just("delete"), st.sampled_from(KEYS),
                         st.integers(0, 9))
_topn_ops_seq = st.lists(
    st.one_of(_topn_insert, _topn_update, _topn_delete),
    min_size=1,
    max_size=5,
)


def _expected_topn(rows: list[tuple[str, int, int]], k: int = 2) -> Counter:
    """Model of the grouped Top-N: per partition, rows sorted by
    (v DESC, id) — a total order, so the expected set is unique."""
    out: Counter = Counter()
    by_p: dict[str, list[tuple[str, int, int]]] = {}
    for r in rows:
        by_p.setdefault(r[0], []).append(r)
    for p, prows in by_p.items():
        ranked = sorted(prows, key=lambda r: (-r[1], r[2]))[:k]
        for i, r in enumerate(ranked, start=1):
            out[(r[0], r[1], r[2], i)] += 1
    return out


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=_topn_ops_seq)
def test_topn_fast_path_matches_model_under_dml(rw, ops):
    """For ANY DML sequence, a grouped Top-N MV on the incremental
    fast path equals the from-scratch recompute AND the pure-Python
    model, the fast path survives every step (retraction capable),
    and changelog replay reconstructs the MV. The ORDER BY carries a
    unique id tiebreaker so the expected top-k is a total order."""
    tag = f"t_topn_prop_{next(_ids)}"
    stmt = (
        f"SELECT * FROM (SELECT *, ROW_NUMBER() OVER "
        f"(PARTITION BY p ORDER BY v DESC, id) AS rnk FROM {tag}) "
        f"WHERE rnk <= 2"
    )
    model: list[tuple[str, int, int]] = []
    ids = itertools.count(1)
    rw.execute(f"CREATE TABLE {tag} (p STRING, v BIGINT, id BIGINT)")
    rw.mv(stmt=stmt, name=f"{tag}_mv")
    st_mv = rw.engine.mvs[f"public.{tag}_mv"]
    assert st_mv.inc_topn is not None, "top-n fast path not taken"
    rw.execute(
        f"CREATE SUBSCRIPTION IF NOT EXISTS public.{tag}_sub FROM "
        f"public.{tag}_mv WITH (retention = '86400s')"
    )
    rw.execute(
        f"DECLARE {tag}_cur subscription cursor for public.{tag}_sub SINCE 0"
    )
    try:
        for op in ops:
            if op[0] == "insert":
                rows = [(p, v, next(ids)) for p, v in op[1]]
                rw.insert(
                    data=pd.DataFrame(
                        {"p": [r[0] for r in rows],
                         "v": [r[1] for r in rows],
                         "id": [r[2] for r in rows]}
                    ),
                    table_name=tag,
                    force_flush=True,
                )
                model.extend(rows)
            elif op[0] == "update":
                _, key, val = op
                rw.execute(f"UPDATE {tag} SET v = {val} WHERE p = '{key}'")
                model = [
                    (p, val if p == key else v, i) for p, v, i in model
                ]
            else:
                _, key, thr = op
                rw.execute(
                    f"DELETE FROM {tag} WHERE p = '{key}' AND v >= {thr}"
                )
                model = [
                    (p, v, i)
                    for p, v, i in model
                    if not (p == key and v >= thr)
                ]
        rw.execute("FLUSH")
        assert st_mv.inc_topn is not None, (
            "DML sequence must not demote the retraction-capable top-n MV"
        )

        mv_rows = Counter(
            tuple(r) for r in rw.fetch(f"SELECT p, v, id, rnk FROM {tag}_mv")
        )
        recomputed = Counter(tuple(r) for r in rw.fetch(stmt))
        assert mv_rows == recomputed == _expected_topn(model), ops

        _, ch = rw.engine.fetch_cursor(f"{tag}_cur", 100000)
        replayed: Counter = Counter()
        last_epoch = -1
        for row in ch:
            *vals, op_name, epoch = row
            assert epoch >= last_epoch
            last_epoch = epoch
            key = tuple(vals)
            if op_name in ("Insert", "UpdateInsert"):
                replayed[key] += 1
            else:
                assert op_name in ("Delete", "UpdateDelete"), op_name
                replayed[key] -= 1
                if replayed[key] == 0:
                    del replayed[key]
        assert replayed == mv_rows, ops
    finally:
        rw.engine.drop_subscription(f"{tag}_sub")
        rw.execute(f"DROP MATERIALIZED VIEW IF EXISTS {tag}_mv")
        rw.execute(f"DROP TABLE IF EXISTS {tag}")


# -- round 11: windowed (tumble) MV under random DML -----------------------

_TS_KEYS = list(range(4))  # four 15s windows' offsets

_w_insert = st.tuples(
    st.just("insert"),
    st.lists(
        st.tuples(st.sampled_from(_TS_KEYS), st.integers(0, 9)),
        min_size=1, max_size=3,
    ),
)
_w_update = st.tuples(st.just("update"), st.sampled_from(_TS_KEYS),
                      st.integers(10, 19))
_w_delete = st.tuples(st.just("delete"), st.sampled_from(_TS_KEYS))
_w_ops_seq = st.lists(st.one_of(_w_insert, _w_update, _w_delete),
                      min_size=1, max_size=5)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_w_ops_seq)
def test_tumble_mv_fast_path_matches_model(rw, ops):
    """Round 11: arbitrary DML on a tumble MV stays on the Spark
    incremental path (derive template + touched-window re-agg) and
    matches a per-window model at every step. Window w covers
    [w*15s, (w+1)*15s); each op targets one window's rows."""
    import pandas as pd

    tag = f"t_wprop_{next(_ids)}"
    base = pd.Timestamp("2024-01-01 00:00:00")

    def ts_of(w: int, j: int) -> pd.Timestamp:
        return base + pd.Timedelta(seconds=w * 15 + (j % 15))

    model: list[tuple[int, int]] = []  # (window, v)
    rw.execute(f"CREATE TABLE {tag} (ts TIMESTAMP, v BIGINT)")
    rw.mv(
        stmt=(
            f"SELECT window_start, window_end, sum(v) AS s, count(*) AS n "
            f"FROM tumble({tag}, ts, interval '15 seconds') "
            f"GROUP BY window_start, window_end"
        ),
        name=f"{tag}_mv",
    )
    st_mv = rw.engine.mvs[f"public.{tag}_mv"]
    assert st_mv.inc is not None and st_mv.inc["derive_tpl"]
    try:
        j = 0
        for op in ops:
            if op[0] == "insert":
                rows = op[1]
                rw.insert(
                    data=pd.DataFrame({
                        "ts": [ts_of(w, j + i) for i, (w, _) in enumerate(rows)],
                        "v": [v for _, v in rows],
                    }),
                    table_name=tag,
                    force_flush=True,
                )
                model.extend(rows)
                j += len(rows)
            elif op[0] == "update":
                _, w, val = op
                lo, hi = w * 15, (w + 1) * 15
                rw.execute(
                    f"UPDATE {tag} SET v = {val} WHERE "
                    f"ts >= TIMESTAMP '2024-01-01 00:00:00' + INTERVAL {lo} SECOND AND "
                    f"ts < TIMESTAMP '2024-01-01 00:00:00' + INTERVAL {hi} SECOND"
                )
                model = [(k, val if k == w else v) for k, v in model]
            else:
                _, w = op
                lo, hi = w * 15, (w + 1) * 15
                rw.execute(
                    f"DELETE FROM {tag} WHERE "
                    f"ts >= TIMESTAMP '2024-01-01 00:00:00' + INTERVAL {lo} SECOND AND "
                    f"ts < TIMESTAMP '2024-01-01 00:00:00' + INTERVAL {hi} SECOND"
                )
                model = [(k, v) for k, v in model if k != w]
            rw.execute("FLUSH")
        assert st_mv.inc is not None, (
            "DML sequence must not demote the windowed MV"
        )
        agg: dict[int, list[int]] = {}
        for w, v in model:
            agg.setdefault(w, [0, 0])
            agg[w][0] += v
            agg[w][1] += 1
        want = Counter(
            (str(base + pd.Timedelta(seconds=w * 15)),
             str(base + pd.Timedelta(seconds=(w + 1) * 15)), s, n)
            for w, (s, n) in agg.items()
        )
        got = Counter(
            (str(r[0]), str(r[1]), r[2], r[3])
            for r in rw.fetch(f"SELECT window_start, window_end, s, n FROM {tag}_mv")
        )
        assert got == want
    finally:
        rw.execute(f"DROP MATERIALIZED VIEW IF EXISTS {tag}_mv")
        rw.execute(f"DROP TABLE IF EXISTS {tag}")


# -- round 12: session-window MV under random DML ---------------------------

_S_GAP_MIN = 4

_s_insert = st.tuples(
    st.just("insert"),
    st.lists(
        st.tuples(st.sampled_from([1, 2]), st.integers(0, 29),
                  st.integers(0, 9)),
        min_size=1, max_size=3,
    ),
)
_s_delete = st.tuples(st.just("delete"), st.sampled_from([1, 2]),
                      st.integers(0, 29))
_s_ops_seq = st.lists(st.one_of(_s_insert, _s_delete),
                      min_size=1, max_size=5)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_s_ops_seq)
def test_session_mv_fast_path_matches_model(rw, ops):
    """Round 12: arbitrary DML on a session-window MV stays on the
    touched-span incremental path and matches a per-key gap-chained
    model at every step — merges, splits, and whole-session deletes
    fall out of random op sequences. Spark chains rows at distance
    <= gap (exact-equality merges), so the model splits on > gap."""
    import pandas as pd

    tag = f"t_sprop_{next(_ids)}"
    base = pd.Timestamp("2024-01-01 00:00:00")
    model: list[tuple[int, int, int]] = []  # (uid, minute, v)
    rw.execute(f"CREATE TABLE {tag} (ts TIMESTAMP, uid BIGINT, v BIGINT)")
    rw.mv(
        stmt=(
            f"SELECT uid, session_window.start AS s_start, "
            f"session_window.end AS s_end, count(*) AS n, sum(v) AS sv "
            f"FROM {tag} "
            f"GROUP BY session_window(ts, '{_S_GAP_MIN} minutes'), uid"
        ),
        name=f"{tag}_mv",
    )
    st_mv = rw.engine.mvs[f"public.{tag}_mv"]
    assert st_mv.inc_session is not None
    try:
        for op in ops:
            if op[0] == "insert":
                rows = op[1]
                rw.insert(
                    data=pd.DataFrame({
                        "ts": [base + pd.Timedelta(minutes=m)
                               for _, m, _ in rows],
                        "uid": [u for u, _, _ in rows],
                        "v": [v for _, _, v in rows],
                    }),
                    table_name=tag,
                    force_flush=True,
                )
                model.extend(rows)
            else:
                _, u, m = op
                rw.execute(
                    f"DELETE FROM {tag} WHERE uid = {u} AND ts = "
                    f"TIMESTAMP '2024-01-01 00:00:00' + INTERVAL {m} MINUTE"
                )
                model = [r for r in model if not (r[0] == u and r[1] == m)]
                rw.execute("FLUSH")
        assert st_mv.inc_session is not None, (
            "DML sequence must not demote the session MV"
        )
        want = Counter()
        for u in {r[0] for r in model}:
            pts = sorted((m, v) for uu, m, v in model if uu == u)

            def sess_row(chunk):
                mins_ = [m for m, _ in chunk]
                return (
                    u,
                    str(base + pd.Timedelta(minutes=min(mins_))),
                    str(base + pd.Timedelta(minutes=max(mins_) + _S_GAP_MIN)),
                    len(chunk),
                    sum(v for _, v in chunk),
                )

            cur: list[tuple[int, int]] = []
            for m, v in pts:
                if cur and m - cur[-1][0] > _S_GAP_MIN:
                    want[sess_row(cur)] += 1
                    cur = []
                cur.append((m, v))
            if cur:
                want[sess_row(cur)] += 1
        got = Counter(
            (r[0], str(r[1]), str(r[2]), r[3], r[4])
            for r in rw.fetch(
                f"SELECT uid, s_start, s_end, n, sv FROM {tag}_mv"
            )
        )
        assert got == want
    finally:
        rw.execute(f"DROP MATERIALIZED VIEW IF EXISTS {tag}_mv")
        rw.execute(f"DROP TABLE IF EXISTS {tag}")
