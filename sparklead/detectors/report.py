"""Results storage + pivot report (reference anomaly_detection.py:533-680).

The reference accumulates (model, item_list_col, numeric_cols) -> metrics
rows and prints mean/median pivot tables with su-/us- prefixes for
supervised/unsupervised models. Report-side, not data-plane: plain pandas
on the driver, fed by the relational ``evaluate`` dicts.

GATE-ORACLED since round 7 (SURVEY §2 #75): the q:auc_threshold entry
feeds a 4-config detector sweep through ``store()``, materializes the
store rows (raw confusion counts included), computes the mean/median f1
pivots with ``pivot()`` itself, and DuckDB recomputes the metric formulas
(ad.confusion_metrics shape) and the pivot aggregation from scratch.
"""

from __future__ import annotations

import pandas as pd

_UNSUPERVISED = {"KMEANS", "IF", "LOF", "OCSVM"}


class ResultsAggregator:
    def __init__(self) -> None:
        self.rows: list[dict] = []

    def store(self, model: str, input_cols: str, metrics: dict) -> None:
        prefix = "us-" if model in _UNSUPERVISED else "su-"
        self.rows.append({"model": prefix + model, "input": input_cols, **metrics})

    def frame(self) -> pd.DataFrame:
        return pd.DataFrame(self.rows)

    def pivot(self, value: str = "f1", agg: str = "mean") -> pd.DataFrame:
        """model x input pivot of a metric (reference's report table)."""
        df = self.frame()
        if df.empty:
            return df
        return df.pivot_table(index="model", columns="input", values=value, aggfunc=agg)
