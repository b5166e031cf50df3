"""Training callbacks.

TPU-native analog of the reference Keras callbacks (reference:
python/flexflow/keras/callbacks.py:49-88 — LearningRateScheduler via
optimizer.set_learning_rate, VerifyMetrics/EpochVerifyMetrics accuracy
gates used as the CI regression oracle, tests/accuracy_tests.sh).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional


class Callback:
    def on_train_begin(self, model) -> None: ...

    def on_epoch_begin(self, model, epoch: int) -> None: ...

    def on_epoch_end(self, model, epoch: int, metrics: Dict[str, float]) -> bool:
        """Return True to stop training early."""
        return False

    def on_train_end(self, model, metrics: Dict[str, float]) -> None: ...


class LearningRateScheduler(Callback):
    """reference: callbacks.py:49-63 — schedule(epoch) -> lr applied via
    set_learning_rate (no recompile; lr lives in optimizer state)."""

    def __init__(self, schedule: Callable[[int], float]):
        self.schedule = schedule

    def on_epoch_begin(self, model, epoch: int) -> None:
        model.set_learning_rate(float(self.schedule(epoch)))


class VerifyMetrics(Callback):
    """reference: callbacks.py:64-77 — assert a metric clears a threshold at
    train end (the accuracy regression gate)."""

    def __init__(self, metric: str = "accuracy", threshold: float = 0.9):
        self.metric = metric
        self.threshold = threshold

    def on_train_end(self, model, metrics: Dict[str, float]) -> None:
        value = metrics.get(self.metric)
        assert value is not None and value >= self.threshold, (
            f"VerifyMetrics failed: {self.metric}={value} < {self.threshold}"
        )


class EpochVerifyMetrics(Callback):
    """reference: callbacks.py:78-88 — same check every epoch."""

    def __init__(self, metric: str = "accuracy", threshold: float = 0.9, start_epoch: int = 0):
        self.metric = metric
        self.threshold = threshold
        self.start_epoch = start_epoch

    def on_epoch_end(self, model, epoch: int, metrics: Dict[str, float]) -> bool:
        if epoch >= self.start_epoch:
            value = metrics.get(self.metric)
            assert value is not None and value >= self.threshold, (
                f"EpochVerifyMetrics failed at epoch {epoch}: "
                f"{self.metric}={value} < {self.threshold}"
            )
        return False


class EarlyStopping(Callback):
    def __init__(self, metric: str = "accuracy", patience: int = 3, mode: str = "max"):
        self.metric = metric
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def on_epoch_end(self, model, epoch: int, metrics: Dict[str, float]) -> bool:
        value = metrics.get(self.metric)
        if value is None:
            return False
        improved = (
            self.best is None
            or (self.mode == "max" and value > self.best)
            or (self.mode == "min" and value < self.best)
        )
        if improved:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        return self.bad_epochs >= self.patience


class CheckpointCallback(Callback):
    def __init__(self, path: str, every_epochs: int = 1):
        self.path = path
        self.every = every_epochs

    def on_epoch_end(self, model, epoch: int, metrics: Dict[str, float]) -> bool:
        if (epoch + 1) % self.every == 0:
            from .checkpoint import save_checkpoint

            save_checkpoint(self.path, model, extra={"epoch": epoch, **metrics})
        return False
