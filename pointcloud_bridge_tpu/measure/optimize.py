"""Hyperparameter grid search for the WL pipeline
(Partsize-identical/tool_utils/optimize_parameter.py:286-360 capability:
ParameterGrid sweep, multiprocess pool, chunked evaluation, best-by-mean-error).
"""

from __future__ import annotations

import itertools
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

from .wl_iden import run_wl_identification


def parameter_grid(grid: Dict[str, Sequence]) -> List[Dict]:
    """Expand {name: [values...]} into the cross-product list of dicts
    (sklearn ParameterGrid equivalent)."""
    keys = sorted(grid)
    return [
        dict(zip(keys, combo))
        for combo in itertools.product(*(grid[k] for k in keys))
    ]


def _eval_one(args):
    cases, hp = args
    rows = run_wl_identification(cases, out_csv=None, hyperparams=hp)
    mean_err = float(np.mean([r["relative_error"] for r in rows]))
    return {"params": hp, "mean_error": mean_err, "rows": rows}


def grid_search(
    cases: Sequence[Tuple[str, np.ndarray, np.ndarray]],
    grid: Dict[str, Sequence],
    processes: int = 0,
) -> List[Dict]:
    """Evaluate every hyperparameter combination; returns results sorted by
    mean relative error (best first)."""
    combos = parameter_grid(grid)
    tasks = [(list(cases), hp) for hp in combos]
    if processes and processes > 1:
        import multiprocessing as mp

        with mp.Pool(processes) as pool:
            results = pool.map(_eval_one, tasks)
    else:
        results = [_eval_one(t) for t in tasks]
    return sorted(results, key=lambda r: r["mean_error"])
