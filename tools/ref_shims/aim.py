"""aim stand-in that records the reference's per-step metric stream.

The reference tracks the raw per-step loss only through aim
(reference train.py:542-543); its log file has only windowed averages.  With
this shim on the path HAVE_AIM is true in the unmodified reference and every
``run.track(value, name=..., step=...)`` appends one JSON line to the file
named by $AIM_SHIM_OUT — the parity harness reads the exact loss sequence
back from there."""

import json
import os
import threading


class Run:
    def __init__(self, experiment=None, **kwargs):
        self.experiment = experiment
        self._path = os.environ.get("AIM_SHIM_OUT")
        self._lock = threading.Lock()
        self._meta = {}

    def __setitem__(self, key, value):
        self._meta[key] = value

    def __getitem__(self, key):
        return self._meta[key]

    def track(self, value, name=None, step=None, **kwargs):
        if not self._path:
            return
        rec = {"name": name, "step": step, "value": float(value)}
        with self._lock, open(self._path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def close(self):
        pass
