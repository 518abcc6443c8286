"""Tensorboard / W&B writers (reference common/tensorboard_utils.py:32,102)."""

from __future__ import annotations

from typing import Any, Optional


class TensorboardWriter:
    def __init__(self, log_dir: str, flush_secs: int = 30, **kwargs: Any):
        self.writer = None
        if log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(log_dir=log_dir, flush_secs=flush_secs)
            except Exception:  # tensorboard unavailable: no-op writer
                self.writer = None

    def __getattr__(self, item):
        if self.writer:
            return getattr(self.writer, item)
        return lambda *args, **kwargs: None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def close(self):
        if self.writer:
            self.writer.close()

    def add_scalar(self, tag, value, step):
        if self.writer:
            self.writer.add_scalar(tag, value, step)

    def add_video_from_np_images(self, video_name, step_idx, images, fps=10):
        """reference tensorboard_utils.py:64."""
        if not self.writer:
            return
        import numpy as np

        frames = np.stack(images)[None]  # (1, T, H, W, C)
        frames = frames.transpose(0, 1, 4, 2, 3)
        import torch

        self.writer.add_video(video_name, torch.from_numpy(frames), step_idx, fps=fps)


class WeightsAndBiasesWriter:
    """reference tensorboard_utils.py:102 — gated on wandb availability."""

    def __init__(self, config=None, **kwargs):
        try:
            import wandb

            self.run = wandb.init(**kwargs)
            self.wandb = wandb
        except Exception:
            self.run = None
            self.wandb = None

    def add_scalar(self, tag, value, step):
        if self.run:
            self.wandb.log({tag: value}, step=int(step))

    def close(self):
        if self.run:
            self.run.finish()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
