"""Async I/O operator (reference: AsyncDataStream / AsyncWaitOperator.java:78
— ordered and unordered modes with a concurrency cap and timeout).

Spark-first placement: the async calls run inside a ``mapInPandas``
iterator with a thread pool per partition — I/O overlaps within and
across Arrow batches while the operator stays a narrow (no-shuffle)
map pass. ORDERED mode preserves input order per partition exactly like
the reference's ordered wait queue; UNORDERED yields completions as they
finish (here: per-batch completion order).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def async_map(
    df: DataFrame,
    fn: Callable[[dict], dict[str, Any]],
    output_schema: str,
    capacity: int = 16,
    timeout_s: float | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Apply a (potentially slow, I/O-bound) per-row function with up to
    ``capacity`` concurrent calls per partition.

    fn: row dict -> output dict. Raising on timeout mirrors the
    reference's timeout behavior (fail the record).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with ThreadPoolExecutor(max_workers=capacity) as pool:
            for pdf in batches:
                rows = pdf.to_dict("records")
                futures = [pool.submit(fn, r) for r in rows]
                if ordered:
                    results = [f.result(timeout=timeout_s) for f in futures]
                else:
                    from concurrent.futures import as_completed

                    results = [f.result() for f in as_completed(futures, timeout=timeout_s)]
                if results:
                    yield pd.DataFrame(results)

    return df.mapInPandas(gen, output_schema)
