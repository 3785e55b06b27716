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


class TensorBoardSink:
    """Optional tensorboard scalar/image sink (the reference's
    WandbVisHook / TensorboardLoggerHook role, ``split_0.py:877-887``).
    Uses torch.utils.tensorboard (CPU torch ships in this env); no-ops
    if tensorboard is unavailable."""

    def __init__(self, log_dir):
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._w = SummaryWriter(log_dir=log_dir)
        except Exception:  # pragma: no cover - env without tensorboard
            self._w = None

    def log(self, entry: dict):
        if self._w is None:
            return
        step = int(entry.get("iter", 0))
        prefix = entry.get("mode", "train")
        for k, v in entry.items():
            if k in ("iter", "mode"):
                continue
            try:
                self._w.add_scalar(f"{prefix}/{k}", float(v), step)
            except (TypeError, ValueError):
                pass
        self._w.flush()

    def log_image(self, tag, img_hwc_uint8, step):
        if self._w is None:
            return
        self._w.add_image(tag, img_hwc_uint8, step, dataformats="HWC")

    def close(self):
        if self._w is not None:
            self._w.close()


class MultiLogger:
    """Fan-out to several sinks; JsonlLogger-compatible."""

    def __init__(self, *sinks):
        self.sinks = [s for s in sinks if s is not None]

    def log(self, entry: dict):
        for s in self.sinks:
            s.log(entry)

    def log_image(self, tag, img, step):
        for s in self.sinks:
            if hasattr(s, "log_image"):
                s.log_image(tag, img, step)

    def close(self):
        for s in self.sinks:
            s.close()
