"""Sources (SURVEY.md §2.1): access-log directory (batch + streaming),
JSONL collector input, dimension loader with periodic refresh."""
