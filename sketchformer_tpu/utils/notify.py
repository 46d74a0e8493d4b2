"""Training-progress notifier (reference: core/notifyier.py — posts losses
and reconstruction-image grids to Slack/Telegram webhooks every N steps).

This environment has no network egress, so the transport is pluggable:
``FileNotifier`` (default) appends messages to ``notifications.log`` in the
run dir — same call sites, same payloads; a webhook transport drops in by
registering a callable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional

import numpy as np


class Notifier:
    def notify(self, message: str, scalars: Optional[Dict] = None,
               image: Optional[np.ndarray] = None) -> None:
        raise NotImplementedError


class NullNotifier(Notifier):
    def notify(self, message, scalars=None, image=None) -> None:
        pass


class FileNotifier(Notifier):
    def __init__(self, run_dir: str) -> None:
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "notifications.log")
        self.image_dir = os.path.join(run_dir, "notify_images")

    def notify(self, message, scalars=None, image=None) -> None:
        rec = {"time": time.time(), "message": message}
        if scalars:
            rec["scalars"] = {k: float(v) for k, v in scalars.items()}
        if image is not None:
            os.makedirs(self.image_dir, exist_ok=True)
            img_path = os.path.join(
                self.image_dir, f"notify_{int(time.time() * 1000)}.npy")
            np.save(img_path, image)
            rec["image"] = img_path
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


class CallableNotifier(Notifier):
    """Wraps an arbitrary transport (e.g. a webhook poster)."""

    def __init__(self, fn: Callable[[dict], None]) -> None:
        self.fn = fn

    def notify(self, message, scalars=None, image=None) -> None:
        self.fn({"message": message, "scalars": scalars, "image": image})


def build_notifier(kind: str, run_dir: str) -> Notifier:
    if kind == "none":
        return NullNotifier()
    if kind == "file":
        return FileNotifier(run_dir)
    raise ValueError(f"unknown notifier kind {kind!r}")
