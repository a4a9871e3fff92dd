"""Crash-recoverable stepped procedures (Procedure-v2 analog).

Reference: ``procedure2/ProcedureExecutor.java`` + the master DDL
procedures under ``master/procedure/`` (TruncateTableProcedure,
CreateTableProcedure, DeleteTableProcedure, ...).  The framework's
core contract — the part that makes master DDL crash-safe — is:

1. **persist-before-proceed**: every completed state transition is
   written to the procedure store BEFORE the next one runs, so the
   store always knows exactly how far a procedure got;
2. **idempotent resume**: a new master loads the store and re-drives
   every unfinished procedure from its last persisted state (the
   reference replays the procedure WAL on ``ProcedureExecutor.load``);
3. **reverse rollback**: a step that FAILS (as opposed to the process
   dying) triggers rollback of the completed steps in reverse order
   (StateMachineProcedure.rollbackState), journaled the same way so a
   crash mid-rollback also resumes.

This module implements that contract over the existing procedure
journal (``Admin._procedure`` entries share the pid space, the lock
view, ``bypass_procedure`` and hbck's stuck-procedure report): a
stepped entry additionally records its registered class, its
JSON-serializable args, the names of completed steps, and a mutable
``ctx`` dict that steps use to pass state forward — everything a new
session needs to reconstruct and resume the procedure.

Recovery is explicit (``Admin.recover_procedures()``): the new-master
takeover step.  The operator alternative for a wedged procedure
remains ``bypass_procedure`` (HBCK2), which abandons instead of
resuming — the same two escape hatches the reference has.

Scale note: the journal is a bounded catalog file (one row per master
operation), never data-sized; steps do their heavy lifting through
Spark jobs, so the executor itself is pure driver-side metadata.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable


class SimulatedCrash(BaseException):
    """Test hook modeling process death: the executor re-raises it
    WITHOUT journaling a failure (a real crash runs no handlers
    either), leaving the entry RUNNABLE with its persisted progress —
    exactly the state a new master finds in the procedure store."""


@dataclass
class Step:
    """One state of a StateMachineProcedure: an idempotent-on-replay
    execute and an optional compensating rollback."""

    name: str
    execute: Callable[[object, dict], None]
    rollback: Callable[[object, dict], None] | None = None


PROCEDURE_REGISTRY: dict[str, type] = {}


def register_procedure(cls: type) -> type:
    """Register a StepProcedure class so recovery can reconstruct it
    from the journal (the reference serializes procedure class + state
    into the store; here: class name + JSON args)."""
    PROCEDURE_REGISTRY[cls.TYPE] = cls
    return cls


class StepProcedure:
    """Base: subclasses set ``TYPE``, accept JSON-serializable kwargs
    (persisted verbatim for recovery) and implement ``steps(admin)``."""

    TYPE = "STEP_PROCEDURE"
    LOCK = "EXCLUSIVE"

    def __init__(self, **args):
        self.args = args

    @property
    def table(self) -> str | None:
        return self.args.get("table")

    def steps(self, admin) -> list[Step]:  # pragma: no cover - abstract
        raise NotImplementedError


class ProcedureExecutor:
    """Drive stepped procedures against one Admin's journal."""

    def __init__(self, admin):
        self.admin = admin

    # -- journal helpers ------------------------------------------------------

    def _entry(self, pid: int) -> dict:
        for p in self.admin._read_procs():
            if p["pid"] == pid:
                return p
        raise ValueError(f"no procedure {pid}")

    def _update(self, pid: int, **fields) -> None:
        procs = self.admin._read_procs()
        for p in procs:
            if p["pid"] == pid:
                p.update(fields)
        self.admin._write_procs(procs)

    # -- lifecycle -------------------------------------------------------------

    def submit(self, proc: StepProcedure) -> int:
        """Journal the procedure and drive it to completion.  Returns
        the pid.  The entry is written BEFORE the first step runs, so
        a crash at any point leaves a resumable record."""
        import time

        procs = self.admin._read_procs()
        pid = 1 + max((p["pid"] for p in procs), default=0)
        entry = {
            "pid": pid, "type": proc.TYPE, "table": proc.table,
            "lock": proc.LOCK, "state": "RUNNABLE",
            "submitted_ts": time.time(), "completed_ts": None,
            "proc_class": proc.TYPE, "args": proc.args,
            "steps_done": [], "ctx": {},
        }
        self.admin._write_procs(procs + [entry])
        self._drive(pid, proc)
        return pid

    def _drive(self, pid: int, proc: StepProcedure) -> None:
        """Run the not-yet-persisted steps in order, persisting each
        completed transition before the next starts."""
        entry = self._entry(pid)
        done = list(entry["steps_done"])
        ctx = dict(entry["ctx"])
        steps = proc.steps(self.admin)
        for step in steps:
            if step.name in done:
                continue  # persisted as complete: resume skips it
            try:
                step.execute(self.admin, ctx)
            except SimulatedCrash:
                raise  # process death: journal stays RUNNABLE as-is
            except BaseException:
                self._rollback(pid, proc, done, ctx)
                raise
            done.append(step.name)
            self._update(pid, steps_done=done, ctx=ctx)
        self.admin._finish_procedure(pid, "SUCCESS")

    def _rollback(self, pid: int, proc: StepProcedure,
                  done: list[str], ctx: dict) -> None:
        """Reverse-order rollback of the completed steps, journaled per
        transition so a crash mid-rollback resumes the rollback."""
        self._update(pid, state="FAILED_ROLLINGBACK")
        by_name = {s.name: s for s in proc.steps(self.admin)}
        for name in reversed(done):
            step = by_name.get(name)
            if step is not None and step.rollback is not None:
                step.rollback(self.admin, ctx)
            done.remove(name)
            self._update(pid, steps_done=done, ctx=ctx)
        self.admin._finish_procedure(pid, "ROLLEDBACK")

    def recover(self) -> list[dict]:
        """New-master takeover (ProcedureExecutor.load + restore-locks):
        re-drive every unfinished stepped procedure from its last
        persisted state — rollforward for RUNNABLE entries, resumed
        rollback for FAILED_ROLLINGBACK ones.  Plain contextmanager
        journal entries (no proc_class) have no persisted steps to
        resume; they stay for ``bypass_procedure``.  Returns a summary
        row per procedure handled."""
        out = []
        for p in list(self.admin._read_procs()):
            if p["state"] not in ("RUNNABLE", "FAILED_ROLLINGBACK"):
                continue
            cls = PROCEDURE_REGISTRY.get(p.get("proc_class") or "")
            if cls is None:
                out.append({"pid": p["pid"], "type": p["type"],
                            "action": "left_for_bypass"})
                continue
            proc = cls(**p["args"])
            # per-procedure failure isolation (the reference executor
            # keeps loading the store when one procedure's resume
            # fails) — except SimulatedCrash, which models THIS
            # process dying and must propagate
            try:
                if p["state"] == "FAILED_ROLLINGBACK":
                    self._rollback(p["pid"], proc, list(p["steps_done"]),
                                   dict(p["ctx"]))
                    out.append({"pid": p["pid"], "type": p["type"],
                                "action": "rolled_back"})
                else:
                    self._drive(p["pid"], proc)
                    out.append({"pid": p["pid"], "type": p["type"],
                                "action": "resumed"})
            except SimulatedCrash:
                raise
            except BaseException as e:  # noqa: BLE001 — isolation boundary
                out.append({"pid": p["pid"], "type": p["type"],
                            "action": f"failed: {type(e).__name__}: {e}"})
        return out


# -- concrete DDL procedures (master/procedure/*.java) --------------------------


@register_procedure
class TruncateTableProcedure(StepProcedure):
    """master/procedure/TruncateTableProcedure.java: write the new
    empty layout FIRST, repoint the descriptor LAST — a crash between
    the two leaves the table fully intact (old layout still live, the
    orphan empty dir reclaimed by the cleaner chore), and recovery
    completes the repoint.  Same state order as the reference
    (TRUNCATE_TABLE_CREATE_FS_LAYOUT before TRUNCATE_TABLE_ADD_TO_META).
    """

    TYPE = "TRUNCATE_TABLE"

    def steps(self, admin) -> list[Step]:
        from hbase_spark.admin import _table_path
        from hbase_spark.model import cell_schema

        name = self.args["table"]

        def create_fs_layout(a, ctx):
            desc = a._read_desc(name)
            v = desc.get("version", 0) + 1
            data_dir = f"{_table_path(name)}/cells-v{v}"
            empty = a.spark.createDataFrame([], schema=cell_schema())
            empty.write.mode("overwrite").parquet(
                f"{a.catalog_dir}/{data_dir}"
            )
            ctx["version"] = v
            ctx["data_dir"] = data_dir

        def add_to_meta(a, ctx):
            desc = a._read_desc(name)
            ctx["old_data_dir"] = desc.get("data_dir")
            ctx["old_mob_dir"] = desc.get("mob_dir")
            desc["version"] = ctx["version"]
            desc["data_dir"] = ctx["data_dir"]
            # the MOB side-store is table data too: truncate drops it
            # (scans union mob_dir back in — leaving it would
            # resurrect every over-threshold value)
            desc["mob_dir"] = None
            a._write_desc(name, desc)
            if desc.get("sft") == "FILE":
                # commit the (now empty) store-file list atomically
                # with the repoint, like flush and _rewrite_regions
                a._write_sft_manifest(name, desc)

        def undo_meta(a, ctx):
            desc = a._read_desc(name)
            desc["data_dir"] = ctx["old_data_dir"]
            desc["mob_dir"] = ctx["old_mob_dir"]
            a._write_desc(name, desc)

        return [
            # the orphan empty dir needs no rollback: immutable version
            # dirs are reclaimed by cleaner_chore, the archive discipline
            Step("CREATE_FS_LAYOUT", create_fs_layout),
            Step("ADD_TO_META", add_to_meta, undo_meta),
        ]


@register_procedure
class CreateTableProcedure(StepProcedure):
    """master/procedure/CreateTableProcedure.java: layout before
    descriptor — until ADD_TO_META persists, the table does not exist
    and a crash leaves only an unreferenced dir."""

    TYPE = "CREATE_TABLE"

    def steps(self, admin) -> list[Step]:
        name = self.args["table"]
        families = self.args["families"]
        splits = self.args.get("splits")

        def create_fs_layout(a, ctx):
            from hbase_spark.admin import _table_path
            from hbase_spark.model import cell_schema

            # CREATE_TABLE_PRE_OPERATION: existence check up front
            if a.table_exists(name):
                raise ValueError(f"table {name!r} already exists")
            data_dir = f"{_table_path(name)}/cells-v0"
            empty = a.spark.createDataFrame([], schema=cell_schema())
            empty.write.mode("overwrite").parquet(
                f"{a.catalog_dir}/{data_dir}"
            )
            ctx["data_dir"] = data_dir

        def add_to_meta(a, ctx):
            from hbase_spark.admin import _fam_dict
            from hbase_spark.table import FamilyDescriptor

            fams = {f: FamilyDescriptor() for f in families}
            desc = {
                "enabled": True, "version": 0,
                "data_dir": ctx["data_dir"],
                "families": {f: _fam_dict(d) for f, d in fams.items()},
            }
            if splits is not None:
                desc["split_points"] = sorted(splits)
            a._write_desc(name, desc)

        def undo_meta(a, ctx):
            a._write_desc(
                name, {"enabled": False, "deleted": True, "families": {}}
            )

        return [
            Step("CREATE_FS_LAYOUT", create_fs_layout),
            Step("ADD_TO_META", add_to_meta, undo_meta),
        ]


@register_procedure
class DeleteTableProcedure(StepProcedure):
    """master/procedure/DeleteTableProcedure.java: unassign first,
    tombstone the descriptor last — recovery after a crash between the
    two finishes the delete rather than leaving a half-dead table."""

    TYPE = "DELETE_TABLE"

    def steps(self, admin) -> list[Step]:
        name = self.args["table"]

        def unassign_regions(a, ctx):
            # DELETE_TABLE_PRE_OPERATION: the disabled check up front,
            # before any state is touched
            if a._read_desc(name)["enabled"]:
                raise RuntimeError(
                    f"table {name!r} must be disabled before delete"
                )
            t = a._read_topology()
            prefix = f"{name}/"
            ctx["dropped_assignments"] = {
                k: v for k, v in t["assignments"].items()
                if k.startswith(prefix)
            }
            for k in list(t["assignments"]):
                if k.startswith(prefix):
                    del t["assignments"][k]
            for k in list(t["rit"]):
                if k.startswith(prefix):
                    del t["rit"][k]
            a._write_topology(t)

        def undo_unassign(a, ctx):
            t = a._read_topology()
            t["assignments"].update(ctx.get("dropped_assignments", {}))
            a._write_topology(t)

        def remove_from_meta(a, ctx):
            a._write_desc(
                name, {"enabled": False, "deleted": True, "families": {}}
            )

        return [
            Step("UNASSIGN_REGIONS", unassign_regions, undo_unassign),
            Step("REMOVE_FROM_META", remove_from_meta),
        ]
