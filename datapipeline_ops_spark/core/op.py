"""Operator protocol: declarative ``DataFrame -> DataFrame`` transforms.

The reference's unit of composition is ``BaseOps.predict(item: dict) -> dict``
(reference ``common/base_ops.py:3-22``): a row-wise mutable-dict contract,
chained imperatively by a Worker. Here the unit is a *lazy DataFrame
transform*; a Pipeline is function composition, and a single terminal action
executes the whole chain so Catalyst optimizes across operator boundaries
(pushdown, pruning, reorder) — something the reference structurally cannot do
(every op is an opaque Python call).

Error model (mirrors the reference's error-as-data convention, e.g.
``video_probe_op.py:47-49``): operators never raise in executors; failure
surfaces as a nullable ``<op>_error`` string column plus safe defaults.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

Transform = Callable[[DataFrame], DataFrame]


@dataclass
class Op:
    """A named, documented DataFrame transform with an optional column contract.

    ``requires`` lists input columns the op reads; ``produces`` lists columns
    it adds. Contracts are checked eagerly against the *schema* (cheap —
    no job runs), turning the reference's convention-only dynamic keys
    (SURVEY.md §1.1) into declared, testable interfaces.
    """

    name: str
    fn: Transform
    requires: tuple[str, ...] = ()
    produces: tuple[str, ...] = ()
    doc: str = ""

    def __call__(self, df: DataFrame) -> DataFrame:
        missing = [c for c in self.requires if c not in df.columns]
        if missing:
            raise ValueError(f"op {self.name!r}: missing input columns {missing}; have {df.columns}")
        out = self.fn(df)
        absent = [c for c in self.produces if c not in out.columns]
        if absent:
            raise ValueError(f"op {self.name!r}: contract promised columns {absent} but they are absent")
        return out


def op(name: str, requires: tuple[str, ...] = (), produces: tuple[str, ...] = ()) -> Callable[[Transform], Op]:
    """Decorator form: ``@op("probe", requires=("file_path",), produces=("fps",))``."""

    def wrap(fn: Transform) -> Op:
        return Op(name=name, fn=fn, requires=requires, produces=produces, doc=fn.__doc__ or "")

    return wrap


@dataclass
class Pipeline:
    """Ordered composition of Ops; still lazy — call ``run`` to get the final DataFrame.

    Keep cheap relational ops before expensive UDF-backed ones: Catalyst will
    not reorder *through* an opaque Python UDF, so stage order is the one
    optimizer decision that remains manual (SURVEY.md §4.3).
    """

    steps: list[Op] = field(default_factory=list)

    def then(self, step: Op) -> "Pipeline":
        return Pipeline(steps=[*self.steps, step])

    def run(self, df: DataFrame) -> DataFrame:
        for step in self.steps:
            df = step(df)
        return df

    def explain_plan(self, df: DataFrame) -> str:
        return self.run(df)._jdf.queryExecution().explainString("formatted")
