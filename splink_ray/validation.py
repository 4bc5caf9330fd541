"""Build-time settings validation (SURVEY.md §1.1).

Reference: ``splink/internals/settings_validation/valid_types.py`` and
``…/log_invalid_columns.py`` — the reference validates that every column a
comparison or blocking rule references exists in the input before running
SQL. Without this, a typo'd column surfaces as a KeyError deep inside a Ray
task; here it raises :class:`SettingsColumnError` on the driver, naming the
offending comparison/rule and the missing column, before any pair
generation starts.
"""

from __future__ import annotations


class SettingsColumnError(ValueError):
    """A comparison / blocking rule references a column the input lacks."""


def validate_settings_columns(settings, schema_names) -> None:
    """Raise :class:`SettingsColumnError` if any column the settings need is
    absent from ``schema_names``."""
    names = set(schema_names)
    missing: list[tuple[str, str]] = []
    uid = settings.unique_id_column_name
    if uid not in names:
        missing.append(("unique_id_column_name", uid))
    for comp in settings.comparisons:
        for c in sorted(comp.columns_used()):
            if c not in names:
                missing.append((f"comparison '{comp.output_column_name}'", c))
    for i, rule in enumerate(settings.blocking_rules_to_generate_predictions):
        for c in sorted(rule.columns_used()):
            if c not in names:
                desc = getattr(rule, "description", f"#{i}")
                missing.append((f"blocking rule {i} ({desc})", c))
    for c in settings.additional_columns_to_retain:
        if c not in names:
            missing.append(("additional_columns_to_retain", c))
    if missing:
        lines = "\n".join(f"  - {src}: column '{c}' not found" for src, c in missing)
        raise SettingsColumnError(
            "settings reference columns missing from the input schema:\n"
            f"{lines}\n  available columns: {sorted(names)}"
        )


def validate_settings_against_dataset(settings, records_ds) -> None:
    """Schema-fetch wrapper: skips silently when the Dataset cannot report a
    schema (fully-empty datasets lose theirs on this Ray version)."""
    try:
        schema = records_ds.schema()
        names = list(schema.names)
    except Exception:
        return
    if not names:
        return
    validate_settings_columns(settings, names)
