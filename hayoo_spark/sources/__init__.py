"""External source connectors (SURVEY.md §2 S-rows)."""
