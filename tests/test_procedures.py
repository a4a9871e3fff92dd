"""Crash-recoverable stepped procedures (procedure2/ProcedureExecutor
.java + master/procedure/*): persist-before-proceed, idempotent
resume on a new session, reverse rollback on failure."""

import shutil
import tempfile

import pytest

from hbase_spark.admin import Admin
from hbase_spark.procedures import (
    CreateTableProcedure,
    DeleteTableProcedure,
    SimulatedCrash,
    Step,
    StepProcedure,
    TruncateTableProcedure,
    register_procedure,
)
from hbase_spark.shell import shell_count, shell_put


@pytest.fixture()
def catalog_dir():
    d = tempfile.mkdtemp(prefix="hb_proc_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def catalog(spark, catalog_dir):
    return Admin(spark, catalog_dir)


def _seed(catalog, name="t", rows=6):
    catalog.create_table(name, ["f"])
    t = catalog.table(name)
    for i in range(rows):
        t = shell_put(t, f"r{i}", "f:q", f"v{i}", ts=10, seq=i)
    catalog.flush(name, t, num_regions=2)


@register_procedure
class _TwoMarkerProc(StepProcedure):
    """Test procedure: two steps writing catalog markers, counting
    executions in ctx (so resume-vs-rerun is observable), with an
    injectable crash/failure point via class attributes."""

    TYPE = "TEST_TWO_MARKER"
    CRASH_AT: str | None = None
    FAIL_AT: str | None = None
    CRASH_ROLLBACK_AT: str | None = None

    def steps(self, admin):
        def run(step_name):
            def execute(a, ctx):
                if type(self).CRASH_AT == step_name:
                    raise SimulatedCrash(step_name)
                if type(self).FAIL_AT == step_name:
                    raise ValueError(f"injected failure in {step_name}")
                ctx[f"{step_name}_runs"] = ctx.get(f"{step_name}_runs", 0) + 1
                a._write_json(
                    f"{a.catalog_dir}/marker-{step_name}.json",
                    {"step": step_name},
                )
            return execute

        def undo(step_name):
            def rollback(a, ctx):
                if type(self).CRASH_ROLLBACK_AT == step_name:
                    raise SimulatedCrash(f"rollback {step_name}")
                ctx[f"{step_name}_undone"] = True
            return rollback

        return [Step("A", run("A"), undo("A")),
                Step("B", run("B"), undo("B"))]


@pytest.fixture(autouse=True)
def _reset_injections():
    yield
    _TwoMarkerProc.CRASH_AT = None
    _TwoMarkerProc.FAIL_AT = None
    _TwoMarkerProc.CRASH_ROLLBACK_AT = None


def _entry(admin, pid):
    return next(p for p in admin.list_procedures() if p["pid"] == pid)


def test_success_path_persists_steps_and_succeeds(catalog):
    pid = catalog.submit_procedure(_TwoMarkerProc(table=None))
    e = _entry(catalog, pid)
    assert e["state"] == "SUCCESS"
    assert e["steps_done"] == ["A", "B"]
    assert e["ctx"]["A_runs"] == e["ctx"]["B_runs"] == 1


def test_crash_then_recover_resumes_without_rerunning(catalog, spark,
                                                      catalog_dir):
    _TwoMarkerProc.CRASH_AT = "B"
    with pytest.raises(SimulatedCrash):
        catalog.submit_procedure(_TwoMarkerProc(table=None))
    # the crash left the entry RUNNABLE with step A persisted —
    # exactly what a new master finds in the procedure store
    pid = catalog.list_procedures(completed=False)[-1]["pid"]
    e = _entry(catalog, pid)
    assert e["state"] == "RUNNABLE" and e["steps_done"] == ["A"]
    _TwoMarkerProc.CRASH_AT = None
    fresh = Admin(spark, catalog_dir)  # the new master
    summary = fresh.recover_procedures()
    assert summary == [
        {"pid": pid, "type": "TEST_TWO_MARKER", "action": "resumed"}
    ]
    e = _entry(fresh, pid)
    assert e["state"] == "SUCCESS"
    # idempotent resume: A was NOT rerun, B ran exactly once
    assert e["ctx"]["A_runs"] == 1 and e["ctx"]["B_runs"] == 1


def test_failure_rolls_back_in_reverse_and_journals(catalog):
    _TwoMarkerProc.FAIL_AT = "B"
    with pytest.raises(ValueError, match="injected failure"):
        catalog.submit_procedure(_TwoMarkerProc(table=None))
    e = catalog.list_procedures()[-1]
    assert e["state"] == "ROLLEDBACK"
    assert e["steps_done"] == []  # rollback journaled per transition
    assert e["ctx"].get("A_undone") is True
    assert "B_undone" not in e["ctx"]  # B never completed


def test_crash_during_recovery_recovers_again(catalog, spark, catalog_dir):
    _TwoMarkerProc.CRASH_AT = "B"
    with pytest.raises(SimulatedCrash):
        catalog.submit_procedure(_TwoMarkerProc(table=None))
    # first recovery attempt ALSO crashes at B
    with pytest.raises(SimulatedCrash):
        Admin(spark, catalog_dir).recover_procedures()
    _TwoMarkerProc.CRASH_AT = None
    final = Admin(spark, catalog_dir)
    final.recover_procedures()
    e = final.list_procedures()[-1]
    assert e["state"] == "SUCCESS" and e["ctx"]["A_runs"] == 1


def test_crash_mid_rollback_surfaces_and_recovers(catalog, spark,
                                                  catalog_dir):
    """A crash DURING rollback leaves FAILED_ROLLINGBACK — it must
    show in the incomplete-procedures view (hbck's stuck scan), be
    bypassable without force, and recovery must resume the ROLLBACK
    (not roll forward)."""
    _TwoMarkerProc.FAIL_AT = "B"
    _TwoMarkerProc.CRASH_ROLLBACK_AT = "A"
    with pytest.raises(SimulatedCrash):
        catalog.submit_procedure(_TwoMarkerProc(table="x"))
    wedged = catalog.list_procedures(completed=False)
    assert wedged and wedged[-1]["state"] == "FAILED_ROLLINGBACK"
    pid = wedged[-1]["pid"]
    # the table lock is still held and visible
    assert any(lk["proc_pid"] == pid for lk in catalog.list_locks())
    # recovery resumes the rollback, not the forward path
    _TwoMarkerProc.CRASH_ROLLBACK_AT = None
    _TwoMarkerProc.FAIL_AT = None
    fresh = Admin(spark, catalog_dir)
    summary = fresh.recover_procedures()
    assert {"pid": pid, "type": "TEST_TWO_MARKER",
            "action": "rolled_back"} in summary
    e = next(p for p in fresh.list_procedures() if p["pid"] == pid)
    assert e["state"] == "ROLLEDBACK" and e["ctx"].get("A_undone") is True


def test_wedged_rollback_is_bypassable_without_force(catalog):
    _TwoMarkerProc.FAIL_AT = "B"
    _TwoMarkerProc.CRASH_ROLLBACK_AT = "A"
    with pytest.raises(SimulatedCrash):
        catalog.submit_procedure(_TwoMarkerProc(table="y"))
    pid = catalog.list_procedures(completed=False)[-1]["pid"]
    assert catalog.bypass_procedure(pid) is True  # no force needed


def test_truncate_crash_between_steps_leaves_table_intact(
    catalog, spark, catalog_dir
):
    """The flagship crash window: after the new empty layout exists but
    before the descriptor repoints, the table must still read its OLD
    data; recovery completes the truncate."""
    _seed(catalog)
    assert shell_count(catalog.table("t")) == 6

    class _CrashingTruncate(TruncateTableProcedure):
        def steps(self, admin):
            steps = super().steps(admin)
            orig = steps[1].execute

            def boom(a, ctx):
                raise SimulatedCrash("before ADD_TO_META")

            steps[1] = Step(steps[1].name, boom, steps[1].rollback)
            self._orig = orig
            return steps

    with pytest.raises(SimulatedCrash):
        catalog.submit_procedure(_CrashingTruncate(table="t"))
    # crash window: old data still fully readable
    assert shell_count(catalog.table("t")) == 6
    fresh = Admin(spark, catalog_dir)
    summary = fresh.recover_procedures()
    assert summary[-1]["action"] == "resumed"
    assert shell_count(fresh.table("t")) == 0
    assert fresh._read_desc("t")["families"]  # schema kept


def test_truncate_and_delete_still_behave_via_procedures(catalog):
    _seed(catalog, "u")
    catalog.truncate_table("u")
    assert shell_count(catalog.table("u")) == 0
    types = [p["type"] for p in catalog.list_procedures()]
    assert "TRUNCATE_TABLE" in types
    with pytest.raises(RuntimeError, match="disabled"):
        catalog.delete_table("u")
    catalog.disable_table("u")
    catalog.delete_table("u")
    assert not catalog.table_exists("u")
    assert [p["type"] for p in catalog.list_procedures()].count(
        "DELETE_TABLE"
    ) >= 1  # the failed attempt rolled back, the good one succeeded
    states = [
        p["state"] for p in catalog.list_procedures()
        if p["type"] == "DELETE_TABLE"
    ]
    assert states == ["ROLLEDBACK", "SUCCESS"]


def test_delete_table_unassigns_topology(catalog):
    catalog.register_regionservers(["rs1.example.com,16020,1"])
    _seed(catalog, "d")
    region = catalog._region_inventory("d")[0]
    catalog.move(region, "rs1.example.com,16020,1")
    catalog.disable_table("d")
    catalog.delete_table("d")
    t = catalog._read_topology()
    assert not any(k.startswith("d/") for k in t["assignments"])


def test_create_table_procedure_roundtrip(catalog):
    pid = catalog.submit_procedure(
        CreateTableProcedure(table="c", families=["f"], splits=["m"])
    )
    assert _entry(catalog, pid)["state"] == "SUCCESS"
    assert catalog.table_exists("c")
    assert catalog._read_desc("c")["split_points"] == ["m"]
    # duplicate create fails in PRE_OPERATION and rolls back cleanly
    with pytest.raises(ValueError, match="already exists"):
        catalog.submit_procedure(
            CreateTableProcedure(table="c", families=["f"])
        )
    assert catalog.table_exists("c")


def test_plain_journal_entries_left_for_bypass(catalog):
    # a context-manager journal entry wedged RUNNABLE (crashed session)
    procs = catalog._read_procs()
    procs.append({
        "pid": 999, "type": "OLD_STYLE", "table": "x",
        "lock": "EXCLUSIVE", "state": "RUNNABLE",
        "submitted_ts": 0.0, "completed_ts": None,
    })
    catalog._write_procs(procs)
    summary = catalog.recover_procedures()
    assert {"pid": 999, "type": "OLD_STYLE",
            "action": "left_for_bypass"} in summary
    assert catalog.bypass_procedure(999) is True


def test_truncate_drops_the_mob_store(catalog):
    """Truncate must clear mob_dir too — scans union the MOB side
    store back in, so leaving it would resurrect every
    over-threshold value (pre-existing bug, caught in review)."""
    from hbase_spark.table import FamilyDescriptor

    catalog.create_table("mt", {"f": FamilyDescriptor(mob_threshold=4)})
    t = catalog.table("mt")
    t = shell_put(t, "r1", "f:q", "tiny", ts=10, seq=1)
    t = shell_put(t, "r2", "f:q", "a-value-over-the-mob-threshold",
                  ts=10, seq=2)
    catalog.flush("mt", t)
    assert catalog._read_desc("mt")["mob_dir"]
    assert shell_count(catalog.table("mt")) == 2
    catalog.truncate_table("mt")
    assert shell_count(catalog.table("mt")) == 0
    assert catalog._read_desc("mt")["mob_dir"] is None


def test_recover_isolates_per_procedure_failures(catalog, spark,
                                                 catalog_dir):
    """One procedure failing to resume must not block the rest — the
    reference executor keeps loading the store (per-procedure
    isolation)."""
    _seed(catalog, "iso")
    catalog.disable_table("iso")

    class _CrashingDelete2(DeleteTableProcedure):
        def steps(self, admin):
            steps = super().steps(admin)
            steps[1] = Step(steps[1].name,
                            lambda a, c: (_ for _ in ()).throw(
                                SimulatedCrash("x")),
                            steps[1].rollback)
            return steps

    with pytest.raises(SimulatedCrash):
        catalog.submit_procedure(_CrashingDelete2(table="iso"))
    # sabotage the resume: re-enable the table so DeleteTableProcedure's
    # remaining step... actually the PRE check already ran; instead
    # corrupt the args so reconstruction fails mid-drive
    _TwoMarkerProc.CRASH_AT = "B"
    with pytest.raises(SimulatedCrash):
        catalog.submit_procedure(_TwoMarkerProc(table=None))
    _TwoMarkerProc.CRASH_AT = None
    _TwoMarkerProc.FAIL_AT = "B"  # the resumed run FAILS (rolls back)
    fresh = Admin(spark, catalog_dir)
    summary = fresh.recover_procedures()
    _TwoMarkerProc.FAIL_AT = None
    # the failing marker proc is reported failed; the delete proc
    # still resumed to completion — no abort-on-first-failure
    actions = {s["type"]: s["action"] for s in summary}
    assert actions["DELETE_TABLE"] == "resumed"
    assert actions["TEST_TWO_MARKER"].startswith("failed: ValueError")
    assert not fresh.table_exists("iso")


def test_delete_table_procedure_crash_recovery(catalog, spark, catalog_dir):
    _seed(catalog, "e")
    catalog.disable_table("e")

    class _CrashingDelete(DeleteTableProcedure):
        def steps(self, admin):
            steps = super().steps(admin)

            def boom(a, ctx):
                raise SimulatedCrash("before REMOVE_FROM_META")

            steps[1] = Step(steps[1].name, boom, steps[1].rollback)
            return steps

    with pytest.raises(SimulatedCrash):
        catalog.submit_procedure(_CrashingDelete(table="e"))
    assert catalog.table_exists("e")  # not yet removed
    fresh = Admin(spark, catalog_dir)
    fresh.recover_procedures()
    assert not fresh.table_exists("e")


# -- chaos sweep: crash before EVERY step of every registered procedure
# (the ChaosMonkey posture of hbase-it, SURVEY.md §5.1, applied to the
# procedure store: the single-step drills above sample the crash
# windows; this closes the class — any step boundary, same convergence)


def _crashing(base, k):
    class _Chaos(base):
        def steps(self, admin):
            steps = super().steps(admin)

            def boom(a, ctx):
                raise SimulatedCrash(f"before {steps[k].name}")

            steps[k] = Step(steps[k].name, boom, steps[k].rollback)
            return steps

    return _Chaos


@pytest.mark.parametrize("k", [0, 1])
def test_chaos_truncate_crash_at_any_step_recovers(
    catalog, spark, catalog_dir, k
):
    _seed(catalog, "ct")
    with pytest.raises(SimulatedCrash):
        catalog.submit_procedure(_crashing(TruncateTableProcedure, k)(table="ct"))
    # every pre-completion crash window leaves the OLD data readable
    assert shell_count(catalog.table("ct")) == 6
    fresh = Admin(spark, catalog_dir)
    assert fresh.recover_procedures()[-1]["action"] == "resumed"
    assert shell_count(fresh.table("ct")) == 0
    assert fresh._read_desc("ct")["families"]  # schema kept
    assert fresh.recover_procedures() == []  # converged: nothing pending


@pytest.mark.parametrize("k", [0, 1])
def test_chaos_create_crash_at_any_step_recovers(
    catalog, spark, catalog_dir, k
):
    with pytest.raises(SimulatedCrash):
        catalog.submit_procedure(_crashing(CreateTableProcedure, k)(
            table="cc", families=["f"]))
    fresh = Admin(spark, catalog_dir)
    assert fresh.recover_procedures()[-1]["action"] == "resumed"
    # converged to the success end state: enabled, empty, writable
    assert fresh.table_exists("cc")
    t = fresh.table("cc")
    assert shell_count(t) == 0
    fresh.flush("cc", shell_put(t, "r0", "f:q", "v", ts=10, seq=1),
                num_regions=1)
    assert shell_count(fresh.table("cc")) == 1
    assert fresh.recover_procedures() == []


@pytest.mark.parametrize("k", [0, 1])
def test_chaos_delete_crash_at_any_step_recovers(
    catalog, spark, catalog_dir, k
):
    _seed(catalog, "cd")
    catalog.disable_table("cd")
    with pytest.raises(SimulatedCrash):
        catalog.submit_procedure(_crashing(DeleteTableProcedure, k)(table="cd"))
    fresh = Admin(spark, catalog_dir)
    assert fresh.recover_procedures()[-1]["action"] == "resumed"
    assert not fresh.table_exists("cd")
    assert fresh.recover_procedures() == []
