"""Driver-side result collection.

``Dataset.take_all()`` materializes per-ROW Python dicts and executes the
pipeline through the row-iterator path — measured up to 8× slower than
``to_pandas`` on groupby outputs (9-11 s vs 1.2 s for a 100k-row
sessionize/rank pipeline at 32 CPUs). Every small-result query collects
through here instead.
"""

from __future__ import annotations

import pyarrow as pa


def collect_table(ds) -> pa.Table:
    """Execute a Dataset and return ONE pyarrow Table (small results only —
    the query surface returns driver-side tables by contract)."""
    df = ds.to_pandas()
    return pa.Table.from_pandas(df, preserve_index=False)
