"""Estimator composition — the engine's analogue of the reference's
``sklearn.pipeline.Pipeline`` entry point (reference README.md:98–108:
``Pipeline([("imputer", FCMKIterativeImputer()), ("selector",
FuzzyGranularitySelector())])``).

Stages chain lazily: each stage's ``transform`` returns a DataFrame that the
next stage consumes, so Catalyst optimizes the WHOLE chain as one plan unless
a persist boundary is requested (recommended between an iterative imputer and
a selector — set ``persist_between=True``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class Pipeline:
    """Chain of (name, estimator) stages; estimators expose fit/transform.

    ``fit`` calls ``fit_transform`` on every stage in order (imputers ignore
    the target column, selectors use it when given).
    """

    def __init__(self, stages: list[tuple[str, object]], *, persist_between: bool = False):
        if not stages:
            raise ValueError("Pipeline requires at least one stage")
        names = [n for n, _ in stages]
        if len(set(names)) != len(names):
            raise ValueError(f"stage names must be unique, got {names}")
        self.stages = stages
        self.persist_between = persist_between
        self.fitted_ = False

    def _fit_stage(self, est, df: DataFrame, target_col: str | None) -> DataFrame:
        import inspect

        sig = inspect.signature(est.fit)
        if target_col is not None and "target_col" in sig.parameters:
            est.fit(df, target_col)
        else:
            est.fit(df)
        return est.transform(df)

    def fit(self, df: DataFrame, target_col: str | None = None) -> "Pipeline":
        cur = df
        for i, (_, est) in enumerate(self.stages):
            cur = self._fit_stage(est, cur, target_col)
            if self.persist_between and i < len(self.stages) - 1:
                cur = cur.persist()
        self.fitted_ = True
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.fitted_:
            raise RuntimeError("Pipeline is not fitted yet")
        cur = df
        for _, est in self.stages:
            cur = est.transform(cur)
        return cur

    def fit_transform(self, df: DataFrame, target_col: str | None = None) -> DataFrame:
        self.fit(df, target_col)
        return self.transform(df)

    def __getitem__(self, name: str):
        for n, est in self.stages:
            if n == name:
                return est
        raise KeyError(name)
