"""Extension-surface queries (dedup/similarity/text/events) — populated in extension stage."""
