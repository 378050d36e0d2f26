"""Per-executor model registry: the Spark-native home for the reference's
lazily-initialized GPU models.

The reference instantiates models once per Ray worker and injects them into
ops (``pipeline/video_extract_frame.py:122-142``, ``pipeline/caption.py:
44-56``, ``common/image/face_quality_op.py:39-54``); it even stores model
handles in the item dict (``model_loader_op.py:40-41``) — unserializable by
its own admission. In Spark the equivalent seam is a module-level cache
inside the Python worker process:

- models NEVER travel in columns or closures (only the *name* does);
- first use inside a pandas UDF builds the model, `spark.python.worker.reuse`
  keeps the process (and the model) alive across tasks;
- `Iterator[pd.Series]` UDFs amortize the registry lookup to once per task.

Factories are registered by name at import time on the driver; executors
re-import this module (it ships with the package) and build on demand, so
a 1000-executor cluster initializes exactly one model per python worker.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_FACTORIES: dict[str, Callable[[], Any]] = {}
_INSTANCES: dict[str, Any] = {}


def register_model(name: str, factory: Callable[[], Any]) -> None:
    """Register a model factory by name (idempotent, driver + executors)."""
    _FACTORIES[name] = factory


def get_model(name: str) -> Any:
    """Executor-side lazy singleton: build on first use, then reuse for the
    lifetime of the python worker process."""
    if name not in _INSTANCES:
        if name not in _FACTORIES:
            raise KeyError(f"model {name!r} not registered; have {sorted(_FACTORIES)}")
        _INSTANCES[name] = _FACTORIES[name]()
    return _INSTANCES[name]


def clear_instances() -> None:
    """Testing hook: drop built instances (factories stay registered)."""
    _INSTANCES.clear()
