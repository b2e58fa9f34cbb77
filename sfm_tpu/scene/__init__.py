"""Scene state and storage (SURVEY.md L3)."""
