"""Graceful preemption handling (SURVEY.md section 5.3).

The reference stack has no preemption story: a SIGTERM mid-epoch kills
``train.py`` wherever it stands and loses everything since the last
``save_latest_freq`` checkpoint (reference ``train.py:20-132`` installs
no handlers). On Cloud TPU — where preemptible/spot VMs and maintenance
events deliver SIGTERM ~30 s before teardown — that is the common way
long runs die, so the TPU-native trainer treats it as a first-class
event instead:

* :class:`PreemptionGuard` converts SIGTERM (and optionally SIGINT)
  into a cooperative flag that is safe to set from a signal handler;
* the :class:`~.trainer.Trainer` step loop polls the flag between
  steps, finishes the in-flight step, writes the ``latest`` checkpoint
  (full optimizer state, Orbax), and returns cleanly;
* ``--resume latest`` then continues bit-exactly (tested in
  ``tests/test_trainer_e2e.py``), so a preemption costs zero steps of
  progress rather than up to ``save_latest_freq``.

The guard chains any previously-installed Python-level handler so
embedding frameworks keep their own cleanup, but never chains
``SIG_DFL``/``SIG_IGN`` (chaining the default action would defeat the
graceful path).
"""

from __future__ import annotations

import signal
import threading

_CHAINABLE_EXCLUDED = (signal.SIG_DFL, signal.SIG_IGN, None)


class PreemptionGuard:
    """Cooperative SIGTERM-to-flag bridge for the training loop.

    Usage::

        guard = PreemptionGuard()
        with guard:
            for batch in loader:
                step(batch)
                if guard.preempted:
                    save_checkpoint(); break

    Args:
      signals: signal numbers to intercept. SIGTERM is what Cloud TPU
        preemption / maintenance delivers; add ``signal.SIGINT`` to make
        Ctrl-C checkpoint-and-exit instead of raising KeyboardInterrupt.
    """

    def __init__(self, signals: tuple = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._flag = threading.Event()
        self._prev: dict = {}
        self._installed = False

    # -- signal plumbing ------------------------------------------------ #

    def _handler(self, signum, frame):
        self._flag.set()
        prev = self._prev.get(signum)
        if callable(prev) and prev not in _CHAINABLE_EXCLUDED:
            prev(signum, frame)

    def install(self) -> bool:
        """Install handlers. Returns False (and stays a no-op guard) when
        not on the main thread — ``signal.signal`` only works there."""
        if self._installed:
            return True
        try:
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._handler)
        except ValueError:  # not the main thread
            for s, prev in self._prev.items():
                signal.signal(s, prev)  # pragma: no cover (main-thread only)
            self._prev.clear()
            return False
        self._installed = True
        return True

    def uninstall(self) -> None:
        if not self._installed:
            return
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
        self._installed = False

    def __enter__(self) -> "PreemptionGuard":
        self.install()
        return self

    def __exit__(self, *exc) -> None:
        self.uninstall()

    # -- flag ------------------------------------------------------------ #

    @property
    def preempted(self) -> bool:
        return self._flag.is_set()

    def trip(self) -> None:
        """Set the flag directly (tests, or app-level preemption notices
        such as GCE metadata-server maintenance events)."""
        self._flag.set()
