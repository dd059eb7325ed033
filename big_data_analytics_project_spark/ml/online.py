"""Online purchase-intent model for the streaming bridge.

Clean-room rebuild of the reference's online learner
(``src/streaming/online_model.py``: sklearn SGDClassifier log-loss +
StandardScaler, mini-batch partial_fit, cold-start heuristic, rolling
accuracy) in pure numpy — sklearn is not in this container, and the model
is small enough that a vectorized implementation is both faster and
dependency-free.

Key behaviors preserved:
- log-loss SGD with a running standard scaler (fit incrementally);
- cold-start heuristic prediction before the first fit
  (``online_model.py:151-159``: threshold rules on cart/view counts);
- mini-batch updates every ``update_every`` samples;
- rolling accuracy over the last ``history`` predictions;
- thread-safety irrelevant here: foreachBatch invocations are serialized
  per query by Structured Streaming.

Unlike the reference's per-row ``predict_proba`` loop over ``toPandas()``
(``stream_processor.py:250-278``), both predict and update are vectorized
over the whole micro-batch.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np

FEATURE_COLUMNS = ["view_count", "total_events", "total_value", "unique_items_approx"]


@dataclass
class RunningScaler:
    """Incremental mean/variance (Welford) standardizer."""

    n: int = 0
    mean: np.ndarray | None = None
    m2: np.ndarray | None = None

    def update(self, x: np.ndarray) -> None:
        if self.mean is None:
            self.mean = np.zeros(x.shape[1])
            self.m2 = np.zeros(x.shape[1])
        for row in x:
            self.n += 1
            delta = row - self.mean
            self.mean += delta / self.n
            self.m2 += delta * (row - self.mean)

    def transform(self, x: np.ndarray) -> np.ndarray:
        if self.n < 2:
            return x
        std = np.sqrt(self.m2 / (self.n - 1))
        std[std == 0] = 1.0
        return (x - self.mean) / std


@dataclass
class OnlineIntentModel:
    lr: float = 0.01
    update_every: int = 100
    history: int = 1000
    n_features: int = len(FEATURE_COLUMNS)
    weights: np.ndarray = field(default=None)  # type: ignore[assignment]
    bias: float = 0.0
    fitted: bool = False
    scaler: RunningScaler = field(default_factory=RunningScaler)
    _buffer_x: list = field(default_factory=list)
    _buffer_y: list = field(default_factory=list)
    _correct: list = field(default_factory=list)
    n_updates: int = 0

    def __post_init__(self):
        if self.weights is None:
            self.weights = np.zeros(self.n_features)

    # -- prediction ---------------------------------------------------------

    def _heuristic(self, x: np.ndarray) -> np.ndarray:
        """Cold-start rules (reference shape: fixed probabilities keyed to
        activity thresholds) — vectorized when/otherwise."""
        views, events = x[:, 0], x[:, 1]
        p = np.full(len(x), 0.05)
        p[views >= 3] = 0.35
        p[events >= 10] = 0.60
        p[(views >= 5) & (events >= 15)] = 0.85
        return p

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        if not self.fitted:
            return self._heuristic(x)
        z = self.scaler.transform(x) @ self.weights + self.bias
        return 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))

    # -- learning -----------------------------------------------------------

    def observe(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Score the batch, record accuracy, buffer samples, and run an SGD
        step once enough samples accumulated.  Returns probabilities."""
        proba = self.predict_proba(x)
        self._correct.extend(((proba >= 0.5).astype(int) == y).tolist())
        self._correct = self._correct[-self.history :]
        self._buffer_x.append(x)
        self._buffer_y.append(y)
        if sum(len(b) for b in self._buffer_y) >= self.update_every:
            self._partial_fit(np.vstack(self._buffer_x), np.concatenate(self._buffer_y))
            self._buffer_x, self._buffer_y = [], []
        return proba

    def _partial_fit(self, x: np.ndarray, y: np.ndarray) -> None:
        self.scaler.update(x)
        xs = self.scaler.transform(x)
        z = xs @ self.weights + self.bias
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        grad_w = xs.T @ (p - y) / len(y)
        grad_b = float(np.mean(p - y))
        self.weights -= self.lr * grad_w
        self.bias -= self.lr * grad_b
        self.fitted = True
        self.n_updates += 1

    # -- metrics / persistence ---------------------------------------------

    @property
    def rolling_accuracy(self) -> float:
        return float(np.mean(self._correct)) if self._correct else 0.0

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "OnlineIntentModel":
        with open(path, "rb") as f:
            return pickle.load(f)
