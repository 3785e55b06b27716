"""Structured training logs: console + log.json lines (the reference's
mmcv TextLoggerHook/log.json format that ``tools/average_runs.py`` and
``analyze_logs`` consume)."""
from __future__ import annotations

import json
import sys
import time


class JsonlLogger:
    def __init__(self, path, echo=True):
        self.path = path
        self.echo = echo
        self._f = open(path, "a")

    def log(self, entry: dict):
        self._f.write(json.dumps(entry) + "\n")
        self._f.flush()
        if self.echo:
            it = entry.get("iter", "?")
            if entry.get("mode") == "val":
                n = sum(1 for k in entry if k not in ("iter", "mode"))
                print(f"[iter {it}] eval: {n} metrics logged",
                      file=sys.stderr)
            else:
                loss = entry.get("loss", float("nan"))
                t = entry.get("time", 0.0)
                print(f"[iter {it}] loss={loss:.4f} "
                      f"({t:.3f}s/iter)", file=sys.stderr)

    def close(self):
        self._f.close()
