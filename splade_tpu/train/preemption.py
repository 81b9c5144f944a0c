"""Shared SIGTERM/SIGINT preemption hook for trainers.

TPU pod preemptions deliver SIGTERM with a grace window; the handler only
sets a flag — the training loop checkpoints at the next step boundary and
exits cleanly. (The reference has no equivalent: a killed run loses
everything since the last 5-epoch checkpoint, train_v33_ddp.py:698-713.)
"""

from __future__ import annotations

import logging
import signal

logger = logging.getLogger(__name__)


def install_preemption_handler(trainer) -> None:
    """Wire SIGTERM/SIGINT to set ``trainer._preempted``. Main thread only."""

    def handler(signum, frame):
        logger.warning("signal %d: checkpointing at the next step boundary",
                       signum)
        trainer._preempted = True

    signal.signal(signal.SIGTERM, handler)
    signal.signal(signal.SIGINT, handler)
