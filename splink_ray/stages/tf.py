"""Term frequencies (T1/T2).

Reference: ``splink/internals/term_frequencies.py::term_frequencies_sql``
(``SELECT c, count(*)/total AS tf_c GROUP BY c``) and the join-back into
``__splink__df_concat_with_tf`` (/root/reference empty — SURVEY.md §0 /
§2.7).

Ray mapping: per-batch partial counts → small ``groupby.sum`` → tf = n/total.
The resulting tables are tiny relative to the data (value cardinality), so
the join-back is a **broadcast dict** (``ray.put`` once, fetched per scorer
actor) rather than a shuffle join — SURVEY.md T2.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def term_frequency_counts(records_ds, column: str):
    """Dataset of (column, n) — pre-aggregated, one small shuffle."""

    def _partial(t: pa.Table) -> pa.Table:
        t = t.select([column]).filter(pc.is_valid(t[column]))
        if len(t) == 0:
            return pa.table({column: pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        g = t.group_by(column, use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns([column, "n"])

    from ray.data.aggregate import Sum

    return (
        records_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(column)
        .aggregate(Sum("n", alias_name="n"))
    )


def term_frequency_table(records_ds, column: str, total: int | None = None):
    """pandas DataFrame (value, tf_<column>) — splink's per-column tf table."""
    counts = term_frequency_counts(records_ds, column).to_pandas()
    if total is None:
        total = int(counts["n"].sum())
    counts[f"tf_{column}"] = counts["n"] / max(total, 1)
    return counts.drop(columns=["n"]).sort_values(column).reset_index(drop=True)


def compute_tf_maps(records_ds, columns: list[str], total: int | None = None) -> dict[str, dict]:
    """{column: {value: tf}} for every tf-adjusted column; driver-side small."""
    if total is None:
        total = records_ds.count()
    out = {}
    for c in columns:
        df = term_frequency_table(records_ds, c, total)
        out[c] = dict(zip(df[c], df[f"tf_{c}"]))
    return out
