"""Append-only performance record -> CSV (reference common.py:66-97)."""
from __future__ import annotations

import csv


class PerformanceData:
    COLUMNS = ("time", "spp", "cumm_spp", "iteration", "variance", "mse")

    def __init__(self):
        self.rows = []

    def append(self, time=0.0, spp=0, cumm_spp=0, iteration=0, variance=None, mse=None):
        self.rows.append(
            {
                "time": time,
                "spp": spp,
                "cumm_spp": cumm_spp,
                "iteration": iteration,
                # unfilled metric fields serialize as the default 0, exactly
                # like the reference's PerformanceData (common.py:77-95) —
                # pandas-based reference tooling reads 0, not NaN
                "variance": variance if variance is not None else 0,
                "mse": mse if mse is not None else 0,
            }
        )

    def saveToFile(self, path):
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self.COLUMNS)
            w.writeheader()
            w.writerows(self.rows)
