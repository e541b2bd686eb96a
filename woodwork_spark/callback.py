"""Progress-callback plumbing (reference utils.py:544-592 CallbackCaller).

Long Spark jobs are exactly where users want progress reporting: describe
and dependence accept ``callback=fn`` where ``fn(update, progress, total,
unit, time_elapsed)`` is invoked as work completes.  The accounting mirrors
the reference's unit scheme ("calculations": 1 for preprocessing, one per
column for per-column work, one per pair for pairwise work) even though the
Spark execution batches many units into single jobs — progress advances at
the same milestones a user of the reference expects.
"""

from __future__ import annotations

from timeit import default_timer as timer


class CallbackCaller:
    """Accumulates progress and forwards increments to the user callback.

    The callback receives (update, progress, total, unit, time_elapsed) —
    identical signature to the reference (utils.py:544-592).  A ``None``
    callback makes every update a no-op.
    """

    def __init__(self, callback, unit, total, start_time=None, start_progress=0):
        self.start_time = start_time if start_time is not None else timer()
        self.callback = callback
        self.unit = unit
        self.current_progress = start_progress
        self.total = total

    def update(self, progress_increment):
        if self.callback is not None:
            elapsed_time = timer() - self.start_time
            new_progress = self.current_progress + progress_increment
            self.callback(
                progress_increment,
                new_progress,
                self.total,
                self.unit,
                elapsed_time,
            )
            self.current_progress = new_progress
