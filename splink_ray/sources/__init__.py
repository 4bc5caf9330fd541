"""Input registration / export helpers (SURVEY.md §2.1 S1/S3).

Reference: ``splink/internals/database_api.py::DatabaseAPI.register_table``
and ``splink/internals/splink_dataframe.py::SplinkDataFrame`` export methods
(/root/reference empty — §0). The Ray mapping is thin by design: a Dataset
*is* the registered table; exports are Dataset sinks.
"""

from __future__ import annotations

import os
from typing import Any


def read_table(path_or_obj: Any, columns: list[str] | None = None, **kwargs):
    """Register an input: parquet/csv/json path (by extension), pandas
    DataFrame, Arrow table, or an existing Dataset — one Dataset out."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    x = path_or_obj
    if isinstance(x, pa.Table):
        return rd.from_arrow(x)
    if isinstance(x, pd.DataFrame):
        return rd.from_pandas(x)
    if isinstance(x, str):
        ext = os.path.splitext(x.rstrip("/"))[1].lower()
        if ext in ("", ".parquet"):
            return rd.read_parquet(x, columns=columns, **kwargs)
        if ext == ".csv":
            return rd.read_csv(x, **kwargs)
        if ext in (".json", ".jsonl", ".ndjson"):
            return rd.read_json(x, **kwargs)
        raise ValueError(f"unsupported input extension {ext!r}")
    return x  # assume Dataset


def write_table(ds, path: str, fmt: str = "parquet", partition_cols=None, **kwargs):
    """Export sink: partitioned parquet preferred (resumable layout)."""
    if fmt == "parquet":
        if partition_cols:
            kwargs["partition_cols"] = partition_cols
        ds.write_parquet(path, **kwargs)
    elif fmt == "csv":
        ds.write_csv(path, **kwargs)
    elif fmt == "json":
        ds.write_json(path, **kwargs)
    else:
        raise ValueError(f"unsupported output format {fmt!r}")
    return path


def as_record_dicts(ds, limit: int | None = None) -> list[dict]:
    """SplinkDataFrame.as_record_dict equivalent (small results only)."""
    return ds.take(limit) if limit else ds.take_all()
