"""Shared SIGTERM/SIGINT preemption hook for trainers.

TPU pod preemptions deliver SIGTERM with a grace window; the handler only
sets a flag — the training loop checkpoints at the next step boundary and
exits cleanly. (The reference has no equivalent: a killed run loses
everything since the last 5-epoch checkpoint, train_v33_ddp.py:698-713.)
"""

from __future__ import annotations

import logging
import signal
import time

logger = logging.getLogger(__name__)


def install_preemption_handler(trainer) -> None:
    """Wire SIGTERM/SIGINT to set ``trainer._preempted``. Main thread only."""

    def handler(signum, frame):
        logger.warning("signal %d: checkpointing at the next step boundary",
                       signum)
        trainer._preempted = True

    signal.signal(signal.SIGTERM, handler)
    signal.signal(signal.SIGINT, handler)


class HangWatchdog:
    """Detects a wedged accelerator transport during training.

    Observed failure mode (2026-08-17, dev host): the device relay process
    died mid-run and the next device call blocked on a futex FOREVER — no
    exception, no signal, no log line. A SIGTERM hook can't catch this;
    only absence-of-progress can. The training loop calls ``beat()`` every
    time step metrics actually RESOLVE on host (log steps — completed
    compute, not async dispatches); a daemon thread trips when no beat
    arrives within ``timeout_s``.

    The default trip action is ``os._exit(EXIT_CODE)`` — a hung XLA runtime
    cannot be unwound with exceptions (the blocked call never returns), so
    the process exits hard and the restart supervisor
    (scripts/train_with_restart.sh) relaunches with ``--resume``, which
    restores the latest checkpoint bitwise (mid-epoch resume included).

    Size ``timeout_s`` > first-step compile time + checkpoint/eval pauses
    (the loop also beats after those); 0 disables.
    """

    EXIT_CODE = 17

    def __init__(self, timeout_s: float, on_trip=None, name: str = "train"):
        import os
        import threading

        self.timeout_s = float(timeout_s)
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._name = name

        def default_trip() -> None:
            logger.critical(
                "watchdog: no completed step in %.0fs — device transport "
                "presumed wedged; exiting %d for the restart supervisor "
                "(resume restores the latest checkpoint)",
                self.timeout_s, self.EXIT_CODE)
            logging.shutdown()
            os._exit(self.EXIT_CODE)

        self._on_trip = on_trip or default_trip

        def watch() -> None:
            poll = max(min(self.timeout_s / 4.0, 30.0), 0.05)
            while not self._stop.wait(poll):
                if time.monotonic() - self._last > self.timeout_s:
                    self._on_trip()
                    return

        self._thread = threading.Thread(
            target=watch, name=f"hang-watchdog-{name}", daemon=True)
        if self.timeout_s > 0:
            self._thread.start()

    def beat(self) -> None:
        self._last = time.monotonic()

    def beat_due(self) -> bool:
        """True once half the window has elapsed since the last beat.

        Training loops beat where metrics resolve (log steps); with a long
        logging interval those beats could legally arrive further apart
        than the timeout. Loops use this to force one cheap host sync per
        half-window so a HEALTHY run can never out-wait the watchdog,
        regardless of log_every_n_steps.
        """
        return (self.timeout_s > 0
                and time.monotonic() - self._last > self.timeout_s / 2.0)

    def stop(self) -> None:
        self._stop.set()


def heartbeat_if_due(wd, metric) -> None:
    """Force one completed-step proof per half-window: block the host on a
    scalar from the step's metrics (a resolved value proves the device
    finished the step — async dispatch alone proves nothing). Shared by the
    V33 and MLM training loops so beat placement cannot drift between them.
    """
    if wd is not None and wd.beat_due():
        float(metric)
        wd.beat()
