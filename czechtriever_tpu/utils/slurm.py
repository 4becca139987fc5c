"""SLURM preemption / time-limit handling (reference src/slurm.py:15-40).

``init_signal_handler()`` installs:
  * SIGUSR1 -> the main process requeues the job (``scontrol requeue``)
    and exits — SLURM's preemption warning signal;
  * SIGTERM -> logged and ignored (SLURM sends it right before the kill;
    the requeue already happened).

Safe to call outside SLURM: without SLURM_JOB_ID the USR1 handler only
logs and exits. Combined with crash-resume from ``checkpoint/latest``
(training/trainer.py maybe_resume) this gives the reference's elastic
recovery story on a TPU pod.
"""

from __future__ import annotations

import logging
import os
import signal
import socket
import sys

logger = logging.getLogger(__name__)


def _usr1_handler(signum, frame):
    del frame
    proc_id = int(os.environ.get("SLURM_PROCID", jax_process_index()))
    logger.warning("SIGUSR1 (%s) on host %s, process %d — preemption "
                   "warning", signum, socket.gethostname(), proc_id)
    job_id = os.environ.get("SLURM_JOB_ID")
    if proc_id == 0 and job_id:
        logger.warning("requeueing SLURM job %s", job_id)
        os.system("scontrol requeue " + job_id)
    else:
        logger.warning("non-zero process (or no SLURM job id): exiting "
                       "without requeue")
    sys.exit(-1)


def _term_handler(signum, frame):
    del frame
    logger.warning("SIGTERM (%s) ignored: requeue is driven by SIGUSR1",
                   signum)


def jax_process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def init_signal_handler() -> None:
    """Install SLURM preemption handlers (src/slurm.py:35-40)."""
    signal.signal(signal.SIGUSR1, _usr1_handler)
    signal.signal(signal.SIGTERM, _term_handler)
    logger.info("Signal handler installed.")
