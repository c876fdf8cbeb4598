"""Single-writer lease over a state directory — multi-submitter safety.

Reference: the worker claims ownership of its listeners with a keep-alive
timestamp and a steal-after-timeout rule (``/root/reference/qvarnmr/
listeners.py:56-153``): a second worker seeing a fresh timestamp raises
``BusyListenerError``; a stale one (> ``timeout`` seconds old) is taken
over; a clean shutdown clears the owner so a successor needn't wait
(``listeners.py:126-153``); the signature is ``hostname/pid``
(``listeners.py:158-159``).

Spark context: ONE driver already serializes all state commits through the
streaming checkpoint lock, so within a single submitted application no
lease is needed. This guards the cross-application case — two
independently submitted workers pointed at the same state directory —
which the checkpoint cannot see. The lease file lives next to the state
tables, so whoever can write state can hold the lease.

Like the reference (whose lease is read-modify-write over HTTP), the
takeover path has a theoretical read-write race between two stealers; the
timestamp protocol makes the window one file-write wide, and the loser's
next :meth:`WorkerLease.keep_alive` detects the foreign owner and raises.
On a real cluster the same role is played by the job scheduler or a Delta
commit-service; this mirrors the reference's semantics on plain files.
"""

from __future__ import annotations

import json
import os
import socket
import time


class BusyWorkerError(RuntimeError):
    """Another live worker owns this state directory
    (reference ``BusyListenerError``, ``exceptions.py``)."""


class WorkerLease:
    """Create-or-steal lease file with keep-alive, mirroring
    ``check_and_update_listeners_state`` (``listeners.py:56-123``).

    ``interval``  seconds between timestamp refreshes while held.
    ``timeout``   seconds after which a foreign lease counts as dead and
                  may be stolen.
    """

    def __init__(self, state_dir: str, interval: float = 10.0,
                 timeout: float = 30.0, signature: str | None = None):
        os.makedirs(state_dir, exist_ok=True)
        self.path = os.path.join(state_dir, "_WORKER_LEASE")
        self.interval = interval
        self.timeout = timeout
        self.signature = signature or f"{socket.gethostname()}/{os.getpid()}"

    def _read(self) -> dict | None:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def _write(self, owner: str | None) -> None:
        tmp = f"{self.path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump({"owner": owner, "timestamp": time.time()}, f)
        os.replace(tmp, self.path)

    def acquire(self) -> "WorkerLease":
        """Take the lease: free, already-mine, or stale-foreign (steal after
        ``timeout``). A fresh foreign lease raises :class:`BusyWorkerError`
        immediately — the reference's busy check."""
        st = self._read()
        if (st and st.get("owner") and st["owner"] != self.signature
                and time.time() - st["timestamp"] <= self.timeout):
            raise BusyWorkerError(
                f"map/reduce engine is already running on {st['owner']}")
        self._write(self.signature)
        return self

    def keep_alive(self) -> None:
        """Refresh the timestamp (at most every ``interval``); if the lease
        was stolen during a stall, behaves like :meth:`acquire` — raises
        if the thief is still alive."""
        st = self._read()
        if st is None or st.get("owner") != self.signature:
            self.acquire()
        elif time.time() - st["timestamp"] > self.interval:
            self._write(self.signature)

    def release(self) -> None:
        """Clear the owner so a successor starts without waiting for the
        timeout (``clear_listener_owners``, ``listeners.py:126-153``)."""
        st = self._read()
        if st and st.get("owner") == self.signature:
            self._write(None)

    def __enter__(self) -> "WorkerLease":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()
