"""Experiment writer: JSONL event log + optional wandb + image dumps.

Equivalent of the reference's ``vis="viewer" | "wandb"`` logging surface
(``neusky_config.py:239``, nerfstudio writer): scalars per step to
``events.jsonl``, image panels to PNG, wandb mirroring when the package and
an offline/active run are available (zero-egress safe: wandb defaults to
offline mode here).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class Writer:
    def __init__(self, output_dir: str, use_wandb: bool = False, project: str = "neusky-tpu"):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._events = open(self.dir / "events.jsonl", "a")
        self._wandb = None
        if use_wandb:
            try:
                import os

                import wandb

                os.environ.setdefault("WANDB_MODE", "offline")
                self._wandb = wandb.init(project=project, dir=str(self.dir))
            except Exception:
                self._wandb = None

    def write_scalars(self, step: int, scalars: Dict[str, float]):
        rec = {"step": step, "time": time.time(), **scalars}
        self._events.write(json.dumps(rec) + "\n")
        self._events.flush()
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def write_image(self, step: int, name: str, image: np.ndarray):
        from neusky_tpu.utils.viz import save_png

        img_dir = self.dir / "images" / f"step-{step:09d}"
        img_dir.mkdir(parents=True, exist_ok=True)
        save_png(str(img_dir / f"{name}.png"), image)
        if self._wandb is not None:
            try:
                import wandb

                self._wandb.log({name: wandb.Image(image)}, step=step)
            except Exception:
                pass

    def close(self):
        self._events.close()
        if self._wandb is not None:
            self._wandb.finish()
