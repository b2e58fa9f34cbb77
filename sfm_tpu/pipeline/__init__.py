"""Pipeline driver layer (SURVEY.md L4): host orchestration, device stages."""
