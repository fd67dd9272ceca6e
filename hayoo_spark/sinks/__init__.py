"""Output connectors (SURVEY.md §2 S9/S10)."""
