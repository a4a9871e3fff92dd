"""Master-level observer hooks (coprocessor/MasterObserver.java:73,
185 default hooks).

The Admin catalog is this engine's master analog, so MasterObserver
hooks become pre/post callbacks around Admin's DDL, snapshot, quota
and replication-peer operations.  ``pre_*`` hooks may veto (raise) or
rewrite arguments — the AccessController pattern
(security/access/AccessController.java implements MasterObserver for
exactly this); ``post_*`` hooks are notifications.

Hook-to-reference mapping (MasterObserver.java):
  pre/post_create_table   — preCreateTable:96 / postCompletedCreateTableAction
  pre/post_delete_table   — preDeleteTable:140 / postDeleteTable
  pre/post_disable_table  — preDisableTable / postDisableTable
  pre/post_enable_table   — preEnableTable / postEnableTable
  pre/post_truncate_table — preTruncateTable / postTruncateTable
  pre/post_modify_table   — preModifyTable / postModifyTable
  pre/post_snapshot       — preSnapshot:765 / postSnapshot
  pre/post_clone_snapshot — preCloneSnapshot / postCloneSnapshot
  pre/post_restore_snapshot — preRestoreSnapshot / postRestoreSnapshot
  pre/post_delete_snapshot — preDeleteSnapshot / postDeleteSnapshot
  pre/post_create_namespace — preCreateNamespace / postCreateNamespace
  pre/post_delete_namespace — preDeleteNamespace / postDeleteNamespace
  pre/post_set_quota      — preSetUserQuota:1066 family / postSet*Quota
  pre/post_add_peer       — preAddReplicationPeer:1494 / postAddReplicationPeer
  pre/post_remove_peer    — preRemoveReplicationPeer / postRemoveReplicationPeer
  pre/post_split_region   — preSplitRegion:575 / postCompletedSplitRegionAction
  pre/post_merge_region   — preMergeRegions:1193 / postMergeRegions
  pre/post_set_switch     — preSetSplitOrMergeEnabled:555
  pre/post_flush          — preTableFlush:1031 / postTableFlush
  pre/post_add_rsgroup    — preAddRSGroup:1271 / postAddRSGroup
  pre/post_remove_rsgroup — preRemoveRSGroup:1289 / postRemoveRSGroup
  pre/post_move_servers_rsgroup — preMoveServers:1232 / postMoveServers
  pre/post_move_tables_rsgroup  — preMoveTables:1252 / postMoveTables
  pre/post_remove_servers_rsgroup — preRemoveServers:1327 / postRemoveServers
  pre/post_balance_rsgroup — preBalanceRSGroup:1307 / postBalanceRSGroup
"""

from __future__ import annotations

from typing import Callable

# DDL/admin operations interceptable at the master. Each maps to the
# Admin method of the same name (create_table, snapshot, set_space_quota,
# ...); see the module docstring for reference hook citations.
MASTER_OPS = (
    "create_table",
    "delete_table",
    "disable_table",
    "enable_table",
    "truncate_table",
    "alter",
    "snapshot",
    "clone_snapshot",
    "restore_snapshot",
    "delete_snapshot",
    "create_namespace",
    "delete_namespace",
    "set_space_quota",
    "set_throttle_quota",
    "add_peer",
    "remove_peer",
    "split_region",
    "merge_region",
    "set_switch",
    "flush",
    "add_rsgroup",
    "remove_rsgroup",
    "move_servers_rsgroup",
    "move_tables_rsgroup",
    "remove_servers_rsgroup",
    "balance_rsgroup",
)


class MasterObserver:
    """Any subset of pre_<op>/post_<op> callables for ops in MASTER_OPS.

    ``pre_<op>(args: tuple, kwargs: dict) -> (args, kwargs) | None`` —
    may rewrite the call (return new (args, kwargs)) or veto (raise);
    returning None keeps the original arguments.
    ``post_<op>(args: tuple, kwargs: dict) -> None`` — notification
    after the operation commits.
    """

    def __init__(self, **hooks: Callable):
        for name, fn in hooks.items():
            kind, _, op = name.partition("_")
            if kind not in ("pre", "post") or op not in MASTER_OPS:
                raise ValueError(f"unknown master hook {name!r}")
            setattr(self, name, fn)

    def __getattr__(self, name: str):
        kind, _, op = name.partition("_")
        if kind in ("pre", "post") and op in MASTER_OPS:
            return None
        raise AttributeError(name)


class ObservedAdmin:
    """An Admin with a MasterObserver chain around its DDL surface —
    the master coprocessor-host analog.  Non-intercepted methods and
    attributes pass through untouched."""

    def __init__(self, admin, observers: list[MasterObserver]):
        self._admin = admin
        self._observers = list(observers)

    def __getattr__(self, name: str):
        target = getattr(self._admin, name)
        if name not in MASTER_OPS:
            return target

        def wrapped(*args, **kwargs):
            for ob in self._observers:
                pre = getattr(ob, f"pre_{name}")
                if pre is not None:
                    res = pre(args, kwargs)
                    if res is not None:
                        args, kwargs = res
            out = target(*args, **kwargs)
            for ob in self._observers:
                post = getattr(ob, f"post_{name}")
                if post is not None:
                    post(args, kwargs)
            return out

        return wrapped


def table_name_guard(forbidden_prefix: str) -> MasterObserver:
    """AccessController-style veto: reject DDL touching tables whose
    name starts with ``forbidden_prefix`` (the reference denies by ACL;
    the veto mechanics are identical)."""

    def deny(args, kwargs):
        name = args[0] if args else kwargs.get("name", "")
        if isinstance(name, str) and name.startswith(forbidden_prefix):
            raise PermissionError(f"DDL on {name!r} denied by observer")

    return MasterObserver(
        pre_create_table=deny, pre_delete_table=deny,
        pre_disable_table=deny, pre_truncate_table=deny,
    )


def ddl_audit_observer(log: list) -> MasterObserver:
    """Append one (op, first_arg) record per completed DDL — the
    master audit-log pattern."""

    def note(op):
        def post(args, kwargs):
            log.append((op, args[0] if args else kwargs.get("name")))

        return post

    return MasterObserver(
        **{f"post_{op}": note(op) for op in MASTER_OPS}
    )


# Which permission letter each DDL op requires, following
# AccessController's MasterObserver checks (security/access/
# AccessController.java: preCreateTable requires CREATE, the
# destructive/table-shape ops require ADMIN, snapshot ops ADMIN).
_OP_PERM = {
    "create_table": "C",
    "create_namespace": "C",
    "clone_snapshot": "C",
    **{op: "A" for op in MASTER_OPS
       if op not in ("create_table", "create_namespace", "clone_snapshot")},
}


def access_controller(admin, user: str) -> MasterObserver:
    """The AccessController-as-MasterObserver pattern
    (security/access/AccessController.java implements MasterObserver):
    every DDL call is checked against the Admin's ACL registry for the
    acting ``user`` — CREATE for table/namespace creation and clones,
    ADMIN for everything else; table-scoped grants satisfy checks on
    that table, global grants satisfy all."""

    # where the table name sits in each op's signature: snapshot ops
    # take (snapshot, table); purely-global ops scope to no table
    table_arg = {"snapshot": 1, "clone_snapshot": 1}
    global_ops = {
        "restore_snapshot", "delete_snapshot", "add_peer", "remove_peer",
        "set_space_quota", "set_throttle_quota", "create_namespace",
        "delete_namespace",
        # switches and rsgroups are cluster-wide state, not table-scoped
        # (AccessController requires global ADMIN for them)
        "set_switch", "add_rsgroup", "remove_rsgroup",
        "move_servers_rsgroup", "move_tables_rsgroup",
        "remove_servers_rsgroup", "balance_rsgroup",
    }

    def make_check(op, perm):
        def pre(args, kwargs):
            if op in global_ops:
                table, name = None, args[0] if args else ""
            else:
                i = table_arg.get(op, 0)
                name = args[i] if len(args) > i else kwargs.get("name", "")
                table = name if isinstance(name, str) else None
            granted = admin.user_permission(table).get(user, "")
            if perm not in granted:
                raise PermissionError(
                    f"user {user!r} lacks {perm} for {op} on {name!r}"
                )

        return pre

    return MasterObserver(
        **{f"pre_{op}": make_check(op, perm)
           for op, perm in _OP_PERM.items()}
    )
