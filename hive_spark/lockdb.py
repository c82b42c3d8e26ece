"""Database-backed writer locks — the DbTxnManager/TxnHandler design.

Hive serializes writers through lock ROWS in the metastore RDBMS
(ref: ql/src/java/org/apache/hadoop/hive/ql/lockmgr/DbTxnManager.java:103
acquires via the metastore; ql/.../metastore/txn/TxnHandler.java owns the
HIVE_LOCKS table, heartbeats, and timeout expiry). This module is that
mechanism for this engine:

- one central lock database holding a ``hive_locks`` table
  (HIVE_LOCKS analog: lock id, object, host, pid, acquire time, last
  heartbeat);
- acquisition inserts a row inside a database transaction after
  checking for conflicting live rows — two PROCESSES (or hosts sharing
  the db file over a shared filesystem) serialize on the row, and no
  filesystem trick against the table directory (deleting a ``._lock``
  file, touching timestamps) can steal the lock;
- held locks HEARTBEAT on a daemon thread (DbTxnManager.startHeartbeat
  analog); a lock whose heartbeat goes stale past the timeout is expired
  by the next acquirer (TxnHandler.performTimeOuts), so a SIGKILLed
  writer never blocks the table forever;
- SHOW LOCKS reads the table (ql/.../ddl/process/show/locks/).

Engine note on the backing store: the reference points HIVE_LOCKS at
whatever RDBMS backs the metastore. This environment ships embedded
Derby only (no derbynet.jar), and an embedded Derby database is
single-JVM — a second PROCESS cannot open it, which is the exact
property a lock service needs. SQLite (stdlib) is the one
multi-process-safe database available here, so it plays the metastore-DB
role; the schema and protocol are TxnHandler's, and swapping the
connection factory for a JDBC one is the only change a real deployment
would need.
"""

from __future__ import annotations

import os
import socket
import sqlite3
import threading
import time
from contextlib import contextmanager

# a held lock refreshes its heartbeat every HEARTBEAT_S; a lock silent
# for EXPIRE_S is eligible for expiry by any waiter (Hive's
# hive.txn.timeout analog, scaled for local testing)
HEARTBEAT_S = 2.0
EXPIRE_S = 10.0

_DEFAULT_DB = os.path.join(
    os.path.expanduser("~/.hive_spark_scratch"), "hive_locks.sqlite"
)


def db_path() -> str:
    return os.environ.get("HIVE_SPARK_LOCKDB", _DEFAULT_DB)


def _connect(path: str | None = None) -> sqlite3.Connection:
    p = path or db_path()
    os.makedirs(os.path.dirname(p), exist_ok=True)
    con = sqlite3.connect(p, timeout=30.0, isolation_level=None)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA busy_timeout=30000")
    con.execute(
        """CREATE TABLE IF NOT EXISTS hive_locks (
               hl_id INTEGER PRIMARY KEY AUTOINCREMENT,
               hl_table_path TEXT NOT NULL,
               hl_lock_type TEXT NOT NULL DEFAULT 'EXCLUSIVE',
               hl_host TEXT NOT NULL,
               hl_pid INTEGER NOT NULL,
               hl_acquired_at REAL NOT NULL,
               hl_last_heartbeat REAL NOT NULL
           )"""
    )
    return con


def _pid_alive_local(host: str, pid: int) -> bool | None:
    """True/False when the holder is on THIS host; None when unknowable
    (other host — only the heartbeat can judge it)."""
    if host != socket.gethostname():
        return None
    try:
        os.kill(pid, 0)
        return True
    except PermissionError:
        return True
    except OSError:
        return False


class LockLost(RuntimeError):
    """The held lock's row disappeared — a waiter expired it while this
    process was paused/silent past EXPIRE_S. TxnHandler aborts the
    transaction on heartbeat miss ("No such lock, lock expired"); the
    holder must NOT publish under it — continuing would be split-brain
    (two live writers on one table)."""


class DbLockManager:
    """TxnHandler's lock half over one central database file."""

    def __init__(self, path: str | None = None):
        self.path = path or db_path()
        self._heartbeats: dict[int, threading.Event] = {}
        self._lost: set[int] = set()

    # -- protocol ----------------------------------------------------------
    def _expire_stale(self, con: sqlite3.Connection) -> None:
        """performTimeOuts analog: drop rows whose heartbeat went silent
        past EXPIRE_S, or whose same-host holder pid is dead."""
        now = time.time()
        for hl_id, host, pid, hb in con.execute(
            "SELECT hl_id, hl_host, hl_pid, hl_last_heartbeat"
            " FROM hive_locks"
        ).fetchall():
            alive = _pid_alive_local(host, pid)
            if alive is False or (alive is None and now - hb > EXPIRE_S):
                con.execute("DELETE FROM hive_locks WHERE hl_id=?", (hl_id,))
            elif alive is True and now - hb > EXPIRE_S:
                # pid alive but silent: a stopped (SIGSTOP) writer —
                # Hive expires it; so do we
                con.execute("DELETE FROM hive_locks WHERE hl_id=?", (hl_id,))

    def acquire(
        self, table_path: str, timeout: float = 30.0, poll: float = 0.05
    ) -> int:
        """Block up to `timeout` for the exclusive lock; return lock id."""
        from hive_spark.txn import LockTimeout

        deadline = time.monotonic() + timeout
        con = _connect(self.path)
        try:
            while True:
                con.execute("BEGIN IMMEDIATE")
                try:
                    self._expire_stale(con)
                    row = con.execute(
                        "SELECT hl_id FROM hive_locks WHERE hl_table_path=?",
                        (table_path,),
                    ).fetchone()
                    if row is None:
                        now = time.time()
                        cur = con.execute(
                            "INSERT INTO hive_locks (hl_table_path,"
                            " hl_lock_type, hl_host, hl_pid,"
                            " hl_acquired_at, hl_last_heartbeat)"
                            " VALUES (?, 'EXCLUSIVE', ?, ?, ?, ?)",
                            (
                                table_path,
                                socket.gethostname(),
                                os.getpid(),
                                now,
                                now,
                            ),
                        )
                        lock_id = cur.lastrowid
                        con.execute("COMMIT")
                        self._start_heartbeat(lock_id)
                        return lock_id
                    con.execute("COMMIT")
                except BaseException:
                    try:
                        con.execute("ROLLBACK")
                    except sqlite3.OperationalError:
                        pass
                    raise
                if time.monotonic() >= deadline:
                    raise LockTimeout(
                        f"writer lock on {table_path} held by another"
                        f" process (waited {timeout}s)"
                    )
                time.sleep(poll)
        finally:
            con.close()

    def _start_heartbeat(self, lock_id: int) -> None:
        stop = threading.Event()
        self._heartbeats[lock_id] = stop

        def beat() -> None:
            while not stop.wait(HEARTBEAT_S):
                try:
                    con = _connect(self.path)
                    try:
                        cur = con.execute(
                            "UPDATE hive_locks SET hl_last_heartbeat=?"
                            " WHERE hl_id=?",
                            (time.time(), lock_id),
                        )
                        if cur.rowcount == 0:
                            # our row is GONE: a waiter expired us while
                            # this process was paused (SIGSTOP/GC stall).
                            # Heartbeating into 0 rows and writing on
                            # would be split-brain — flag the loss and
                            # stop; release()/check() raise LockLost
                            # (TxnHandler aborts on heartbeat miss).
                            if not stop.is_set():
                                self._lost.add(lock_id)
                            return
                    finally:
                        con.close()
                except sqlite3.Error:
                    pass  # next beat retries; expiry needs EXPIRE_S silence

        threading.Thread(target=beat, daemon=True).start()

    def lost(self, lock_id: int) -> bool:
        return lock_id in self._lost

    def check(self, lock_id: int) -> None:
        """Raise if this lock was lost — call before publishing results
        produced under it."""
        if lock_id in self._lost:
            raise LockLost(
                f"lock {lock_id} expired while held (holder paused past"
                f" {EXPIRE_S}s and a waiter reclaimed the row); aborting"
                " instead of publishing under a stolen lock"
            )

    def release(self, lock_id: int) -> None:
        stop = self._heartbeats.pop(lock_id, None)
        if stop is not None:
            stop.set()
        con = _connect(self.path)
        try:
            cur = con.execute(
                "DELETE FROM hive_locks WHERE hl_id=?", (lock_id,)
            )
            if cur.rowcount == 0:
                # nothing to delete = the row was expired out from under
                # us; surface it even if no heartbeat ran in the window
                self._lost.add(lock_id)
        finally:
            con.close()
        self.check(lock_id)

    def locks(self) -> list[dict]:
        """All live lock rows (SHOW LOCKS source)."""
        con = _connect(self.path)
        try:
            rows = con.execute(
                "SELECT hl_id, hl_table_path, hl_lock_type, hl_host,"
                " hl_pid, hl_acquired_at, hl_last_heartbeat FROM hive_locks"
                " ORDER BY hl_id"
            ).fetchall()
        finally:
            con.close()
        out = []
        for hl_id, path, typ, host, pid, acq, hb in rows:
            alive = _pid_alive_local(host, pid)
            out.append(
                {
                    "lock_id": hl_id,
                    "path": path,
                    "type": typ,
                    "host": host,
                    "holder_pid": pid,
                    "holder_alive": bool(alive)
                    if alive is not None
                    else (time.time() - hb <= EXPIRE_S),
                    "acquired_at": acq,
                    "last_heartbeat": hb,
                }
            )
        return out


@contextmanager
def lock(table_path: str, timeout: float = 30.0, poll: float = 0.05):
    """Yields the manager so long writes can mgr.check(id) mid-flight;
    a CLEAN exit re-verifies the row and raises LockLost if it was
    expired away (the publish gate). A body exception wins over
    LockLost so the original failure isn't masked."""
    mgr = DbLockManager()
    lock_id = mgr.acquire(table_path, timeout=timeout, poll=poll)
    try:
        yield mgr
    except BaseException:
        try:
            mgr.release(lock_id)
        except LockLost:
            pass  # the body's exception is the one that matters
        raise
    else:
        mgr.release(lock_id)
