"""Ray Data pipeline stages (SURVEY.md §2 operator implementations)."""
