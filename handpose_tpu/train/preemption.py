"""Preemption-safe training: checkpoint-and-exit on SIGTERM.

The reference has no failure-detection or recovery mechanism beyond its
per-epoch checkpoint (SURVEY.md §5); a killed run loses the whole epoch in
flight.  On TPU fleets preemption is routine (spot/defragmentation
evictions deliver SIGTERM with a grace window), so the trainer here can be
armed with a :class:`PreemptionGuard`: the signal only sets a flag, the
epoch loop notices it at the next step boundary, the Worker saves a
resumable ``checkpoint`` (restart at the interrupted epoch) and returns
cleanly.  Nothing asynchronous touches JAX state -- the handler is
async-signal-safe by construction.

Arming is explicit (``Worker.enable_preemption_save()``; the CLI does it
by default) so library users who install their own signal handling are
not surprised.
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable, Optional

DEFAULT_SIGNALS = (signal.SIGTERM,)


class PreemptionGuard:
    """Flag-setting signal trap with handler chaining.

    ``install()`` replaces the handlers for ``signals``; the trap sets
    :attr:`requested` and then invokes any previously-installed Python
    handler (so e.g. a process supervisor's own bookkeeping still runs).
    Use as a context manager to restore handlers on exit.
    """

    def __init__(self, signals: Iterable[int] = DEFAULT_SIGNALS):
        self.signals = tuple(signals)
        self._event = threading.Event()
        self._previous: dict = {}
        self._installed = False

    # -- state ----------------------------------------------------------
    @property
    def requested(self) -> bool:
        return self._event.is_set()

    def request(self) -> None:
        """Programmatic trigger (tests, cooperative shutdown)."""
        self._event.set()

    # -- signal wiring ----------------------------------------------------
    def _trap(self, signum, frame) -> None:
        self._event.set()
        prev = self._previous.get(signum)
        if callable(prev):
            prev(signum, frame)

    def install(self) -> "PreemptionGuard":
        if not self._installed:
            for sig in self.signals:
                self._previous[sig] = signal.getsignal(sig)
                signal.signal(sig, self._trap)
            self._installed = True
        return self

    def uninstall(self) -> None:
        if self._installed:
            for sig in self.signals:
                prev = self._previous.get(sig, signal.SIG_DFL)
                # getsignal() returns None for handlers not installed from
                # Python (C extensions / embedders); signal() rejects None
                signal.signal(sig, signal.SIG_DFL if prev is None else prev)
            self._previous.clear()
            self._installed = False

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc) -> Optional[bool]:
        self.uninstall()
        return None
